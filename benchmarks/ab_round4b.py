"""Round-4b device A/B harness (one process, pipelined floors, drift
controls — PERF.md measurement discipline).

Jobs (VERDICT round-3 directives #3, #4, #5, #8, #9):
  210  fused2 (Arai-bit-exact fused phase 1) Mosaic COMPILE-PROBE at a
       small geometry (544 rows) before anything expensive, with a plane
       control at the same height
  211  4K floors: plane ctl / fused2 / fused1 / plane re-ctl
  212  8K floor: fused2 (plane 553 / fused1 586 Mpix/s measured idle in
       ab_round4 job 201)
  213  height sweep refresh on an idle host: plane at 272 / 1088 rows
       (projection-model inputs; 544 from job 210, 2160/4320 from
       211/ab_round4)
  215  host-tail split: pipelined FULL encode (start + prefetch + finish
       + container assembly) from a device-resident input — isolates
       (program + fetch + host tail) from the upload, which job 202
       measured at ~57-96 MB/s
  216  e2e: encode_array single control + encode_batch(8) after the
       round-4 fixes (upload depth 3, slab rows cap routing 4K batches
       to the per-image pipeline)

  --tile-rows N  runs ONLY a 4K plane floor with DMMT_TILE_ROWS=N
       (import-time constant, hence one subprocess per value — item #9's
       pack-kernel mapping re-probe).

Usage: python benchmarks/ab_round4b.py [--rounds N] [--tile-rows N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--bdev", type=int, default=8)
    ap.add_argument("--tile-rows", type=int, default=0)
    args = ap.parse_args()

    if args.tile_rows:
        os.environ["DMMT_TILE_ROWS"] = str(args.tile_rows)

    import jax

    from dmmt_jpeg_encoder_tpu import ChromaSubsamplingPreset, EncoderConfig
    from dmmt_jpeg_encoder_tpu.config import QuantizationTablePreset
    from dmmt_jpeg_encoder_tpu.onedispatch import start_one_dispatch
    from dmmt_jpeg_encoder_tpu.tables import quantization_table_pair

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    config = EncoderConfig(chroma_subsampling=ChromaSubsamplingPreset("P420"))
    luma_q, chroma_q = quantization_table_pair(
        QuantizationTablePreset.SPECIFICATION
    )

    w = 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:4320, 0:w]
    base = (
        96
        + 80 * np.sin(xx / 97.0)
        + 60 * np.cos(yy / 71.0)
        + rng.normal(0, 6, (4320, w))
    )
    pixels8k = np.clip(
        np.stack([base, base * 0.9 + 10, base * 1.1 - 8], axis=-1), 0, 255
    ).astype(np.uint8)
    pixels = np.ascontiguousarray(pixels8k[:2160])

    dev_cache: dict[int, object] = {}

    def dev_px(height: int):
        if height not in dev_cache:
            src = pixels8k if height > 2160 else pixels
            d = jax.device_put(src[:height])
            jax.block_until_ready(d)
            dev_cache[height] = d
        return dev_cache[height]

    KNOBS = ("DMMT_P1", "DMMT_HIST", "DMMT_FUSED1_TILEW", "DMMT_P1_PREC")

    def set_modes(**modes):
        for k in KNOBS:
            os.environ.pop(k, None)
        for k, v in modes.items():
            os.environ[k] = v

    def floor_single(height: int) -> float:
        d = dev_px(height)
        t0 = time.perf_counter()
        jax.device_get(
            start_one_dispatch(d, 255, config, luma_q, chroma_q).total_bits
        )
        compile_s = time.perf_counter() - t0
        if compile_s > 5:
            print(f"  (warm/compile {compile_s:.1f}s)", file=sys.stderr,
                  flush=True)
        best = float("inf")
        inflight = max(2, args.bdev if height <= 2160 else args.bdev // 2)
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            states = [
                start_one_dispatch(d, 255, config, luma_q, chroma_q)
                for _ in range(inflight)
            ]
            jax.device_get(states[-1].total_bits)
            best = min(best, (time.perf_counter() - t0) / inflight)
        return best * 1e3

    results = []

    def run(job, tag, fn, height=2160, **modes):
        set_modes(**modes)
        try:
            ms = fn()
            mpix = height * w / 1e6
            rec = {
                "job": job,
                "tag": tag,
                "ms_per_image": round(ms, 3),
                "mpix_per_s": round(mpix * 1e3 / ms, 1),
                "height": height,
                "modes": dict(modes),
            }
            if args.tile_rows:
                rec["tile_rows"] = args.tile_rows
        except Exception:
            print(f"job {job} {tag} FAILED:", file=sys.stderr)
            traceback.print_exc()
            rec = {"job": job, "tag": tag, "error": True, "modes": dict(modes)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    F = floor_single

    if args.tile_rows:
        run(214, f"4K plane TILE_ROWS={args.tile_rows}", lambda: F(2160),
            DMMT_P1="plane")
        print("=== SUMMARY ===", flush=True)
        for r in results:
            print(json.dumps(r), flush=True)
        return 0

    # -- job 210: fused2 compile-probe at small geometry ------------------
    run(210, "544 plane ctl", lambda: F(544), height=544, DMMT_P1="plane")
    run(210, "544 fused2 PROBE", lambda: F(544), height=544,
        DMMT_P1="fused2")

    # -- job 211: 4K floors ------------------------------------------------
    run("ctl", "single plane #1", lambda: F(2160), DMMT_P1="plane")
    run(211, "4K fused2", lambda: F(2160), DMMT_P1="fused2")
    run(211, "4K fused1 ctl", lambda: F(2160), DMMT_P1="fused1")
    run("ctl", "single plane #2", lambda: F(2160), DMMT_P1="plane")

    # -- job 212: 8K fused2 --------------------------------------------------
    run(212, "8K fused2", lambda: F(4320), height=4320, DMMT_P1="fused2")

    # -- job 213: height sweep refresh (idle host, parity mode) ----------
    run(213, "272 plane", lambda: F(272), height=272, DMMT_P1="plane")
    run(213, "1088 plane", lambda: F(1088), height=1088, DMMT_P1="plane")

    # -- job 215: host-tail split (device-resident full encode) -----------
    def tail_bench():
        from dmmt_jpeg_encoder_tpu.container import assemble_jpeg
        from dmmt_jpeg_encoder_tpu.onedispatch import (
            finish_one_dispatch,
            prefetch_one_dispatch,
        )

        set_modes()
        d = dev_px(2160)

        def full(dev):
            st = start_one_dispatch(dev, 255, config, luma_q, chroma_q)
            prefetch_one_dispatch(st, config)
            return st

        def tail(st):
            scan, tables = finish_one_dispatch(st, config)
            return assemble_jpeg(
                width=w, height=2160,
                bits_per_channel=config.bits_per_channel,
                preset=config.chroma_subsampling,
                luma_quant=luma_q, chroma_quant=chroma_q,
                luma_dc=tables.luma_dc, luma_ac=tables.luma_ac,
                chroma_dc=tables.chroma_dc, chroma_ac=tables.chroma_ac,
                scan_bytes=scan,
            )

        tail(full(d))  # warm
        n = 8
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            prev = full(d)
            for _ in range(n - 1):
                nxt = full(d)
                tail(prev)
                prev = nxt
            tail(prev)
            best = min(best, (time.perf_counter() - t0) / n)
        ms = best * 1e3
        rec = {
            "job": 215,
            "dev_resident_full_ms": round(ms, 2),
            "mpix_per_s": round(2160 * w / 1e6 * 1e3 / ms, 1),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    try:
        tail_bench()
    except Exception:
        traceback.print_exc()

    # -- job 216: e2e after the upload-depth + slab-rows-cap fixes --------
    def e2e_bench():
        from dmmt_jpeg_encoder_tpu.encoder import encode_array, encode_batch

        set_modes()
        src = np.ascontiguousarray(pixels)
        encode_array(src, 255, config)  # warm
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            encode_array(src, 255, config)
            times.append(time.perf_counter() - t0)
        ms1 = min(times) * 1e3
        imgs = [np.roll(pixels, 17 * i, axis=0) for i in range(8)]
        encode_batch(imgs, 255, config)  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            encode_batch(imgs, 255, config)
            best = min(best, (time.perf_counter() - t0) / 8)
        ms8 = best * 1e3
        rec = {
            "job": 216,
            "e2e_single_ms": round(ms1, 1),
            "e2e_batch8_ms_per_image": round(ms8, 1),
            "e2e_batch8_mpix_per_s": round(2160 * w / 1e6 * 1e3 / ms8, 1),
            "upload_depth": os.environ.get("DMMT_UPLOAD_DEPTH", "3"),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    try:
        e2e_bench()
    except Exception:
        traceback.print_exc()

    print("=== SUMMARY ===", flush=True)
    for r in results:
        print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

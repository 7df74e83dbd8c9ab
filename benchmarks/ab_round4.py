"""Round-4 device A/B harness (one process, pipelined floors, drift
controls — PERF.md measurement discipline).

Jobs (VERDICT round-3 directives #2, #3, #8):
  200  SLAB program floors: B in {2, 3, 4} x {plane, fused1} vs single
       controls at 4K — does one batched table build amortize the
       ~3.2 ms/program fixed slice the way the T(h) fit predicts?
  201  8K floors on an idle host (plane vs fused1), single-image
  202  upload microbench: device_put bandwidth, fresh vs reused host
       buffers (the PERF.md "~40 MB/s" vs CLAUDE.md "1.5 GB/s" dispute)
  203  e2e audit: encode_array wall time at 4K from host pixels, with a
       reused source buffer, vs the device-resident program floor

Usage: python benchmarks/ab_round4.py [--rounds N] [--skip8k]
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
    ap.add_argument("--skip8k", action="store_true")
    args = ap.parse_args()

    import jax

    from dmmt_jpeg_encoder_tpu import ChromaSubsamplingPreset, EncoderConfig
    from dmmt_jpeg_encoder_tpu.config import QuantizationTablePreset
    from dmmt_jpeg_encoder_tpu.onedispatch import (
        start_one_dispatch,
        start_one_dispatch_slab,
    )
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

    stack_cache: dict[int, object] = {}

    def dev_stack(b: int):
        if b not in stack_cache:
            d = jax.device_put(
                np.stack([np.roll(pixels, 17 * i, axis=0) for i in range(b)])
            )
            jax.block_until_ready(d)
            stack_cache[b] = d
        return stack_cache[b]

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

    def floor_slab(b: int) -> float:
        d = dev_stack(b)
        t0 = time.perf_counter()
        jax.device_get(
            start_one_dispatch_slab(d, 255, config, luma_q, chroma_q)[-1]
            .total_bits
        )
        compile_s = time.perf_counter() - t0
        if compile_s > 5:
            print(f"  (warm/compile {compile_s:.1f}s)", file=sys.stderr,
                  flush=True)
        calls = max(2, args.bdev // b)
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            last = None
            for _ in range(calls):
                last = start_one_dispatch_slab(
                    d, 255, config, luma_q, chroma_q
                )
            jax.device_get(last[-1].total_bits)
            best = min(best, (time.perf_counter() - t0) / (calls * b))
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
                "modes": modes,
            }
        except Exception:
            print(f"job {job} {tag} FAILED:", file=sys.stderr)
            traceback.print_exc()
            rec = {"job": job, "tag": tag, "error": True, "modes": modes}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    F = floor_single

    # -- job 200: slab floors vs single controls at 4K -------------------
    # (B=4 = 777K blocks/program is the compile-OOM risk zone, so those
    # runs go LAST — everything safer is banked first.)
    run("ctl", "single plane #1", lambda: F(2160), DMMT_P1="plane")
    run(200, "slab B=2 plane", lambda: floor_slab(2), DMMT_P1="plane")
    run("ctl", "single fused1 #1", lambda: F(2160), DMMT_P1="fused1")
    run(200, "slab B=2 fused1", lambda: floor_slab(2), DMMT_P1="fused1")
    run(200, "slab B=3 fused1", lambda: floor_slab(3), DMMT_P1="fused1")
    run("ctl", "single plane #2", lambda: F(2160), DMMT_P1="plane")

    # -- job 201: 8K floors on an idle host ------------------------------
    if not args.skip8k:
        run(201, "8K plane", lambda: F(4320), height=4320, DMMT_P1="plane")
        run(201, "8K fused1", lambda: F(4320), height=4320, DMMT_P1="fused1")

    # -- job 202: upload microbench ---------------------------------------
    def upload_bench():
        sizes = {}
        src_fresh = None
        # fresh allocation each time (page-fault cost included)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            src_fresh = np.ones((2160, 3840, 3), np.uint8)
            d = jax.device_put(src_fresh)
            jax.block_until_ready(d)
            times.append(time.perf_counter() - t0)
        mb = src_fresh.nbytes / 1e6
        sizes["fresh_alloc_MBps"] = round(mb / min(times), 1)
        # reused host buffer
        src = np.ones((2160, 3840, 3), np.uint8)
        jax.block_until_ready(jax.device_put(src))
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            d = jax.device_put(src)
            jax.block_until_ready(d)
            times.append(time.perf_counter() - t0)
        sizes["reused_buf_MBps"] = round(mb / min(times), 1)
        sizes["reused_buf_ms"] = round(min(times) * 1e3, 1)
        # pipelined uploads (4 in flight)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            ds = [jax.device_put(src) for _ in range(4)]
            jax.block_until_ready(ds[-1])
            times.append((time.perf_counter() - t0) / 4)
        sizes["pipelined_MBps"] = round(mb / min(times), 1)
        print(json.dumps({"job": 202, **sizes}), flush=True)
        results.append({"job": 202, **sizes})
        return sizes

    try:
        upload_bench()
    except Exception:
        traceback.print_exc()

    # -- job 203: e2e audit ------------------------------------------------
    def e2e_bench():
        from dmmt_jpeg_encoder_tpu.encoder import encode_array, encode_batch

        set_modes()
        src = np.ascontiguousarray(pixels)  # reused host source
        encode_array(src, 255, config)  # warm
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            encode_array(src, 255, config)
            times.append(time.perf_counter() - t0)
        ms1 = min(times) * 1e3
        # batch of 8 (pipelined, slab groups)
        imgs = [np.roll(pixels, 17 * i, axis=0) for i in range(8)]
        encode_batch(imgs, 255, config)  # warm
        t0 = time.perf_counter()
        encode_batch(imgs, 255, config)
        ms8 = (time.perf_counter() - t0) / 8 * 1e3
        rec = {
            "job": 203,
            "e2e_single_ms": round(ms1, 1),
            "e2e_batch8_ms_per_image": round(ms8, 1),
            "e2e_batch8_mpix_per_s": round(2160 * 3840 / 1e6 * 1e3 / ms8, 1),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    # -- drift control, then the compile-risk slab B=4 runs ---------------
    run("ctl", "single plane #3", lambda: F(2160), DMMT_P1="plane")
    run(200, "slab B=4 fused1", lambda: floor_slab(4), DMMT_P1="fused1")
    run(200, "slab B=4 plane", lambda: floor_slab(4), DMMT_P1="plane")

    # e2e last: its encode_batch compiles the default slab group too
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

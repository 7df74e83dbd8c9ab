"""Round-5 jobs 305/306: tiebreakers from the 302/303 results.

305  2tier tiebreak: job 302 recorded a -2.28 ms 2tier win at 4320x3840
     against a plane control that ran 2 ms ABOVE round-4's idle floor,
     and NO win at true 8K — one of those is wrong. Re-measure the
     4320 control (x2, interleaved), 2tier at heads 8/16/32, and the k4
     clamp ablation (the round-4 attribution's 1.56 ms bound) in ONE
     process.
306  Slab overhead decomposition + deeper stacking: the measured
     per-extra-image slab cost (~1.5-3.7 ms) minus its hist+table slice
     (DMMT_TABLE_ABLATE on the slab program), plus B=16x272 / B=8x544
     (stacking past the single-image 2176-row cap — the superlinear
     T(rows) rise came from per-image pack-sweep k growth, which does
     not apply to stacked independent images).

Usage: python benchmarks/ab_round5e.py [--rounds N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

import numpy as np

KNOBS = (
    "DMMT_P1", "DMMT_HIST", "DMMT_FUSED1_TILEW", "DMMT_P1_PREC",
    "DMMT_SWEEP", "DMMT_SWEEP_HEAD", "DMMT_SLAB_ONEPACK",
    "DMMT_TABLE_ABLATE", "DMMT_PACK_ABLATE",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--bdev", type=int, default=8)
    args = ap.parse_args()

    import jax

    from dmmt_jpeg_encoder_tpu import ChromaSubsamplingPreset, EncoderConfig
    from dmmt_jpeg_encoder_tpu.config import QuantizationTablePreset
    from dmmt_jpeg_encoder_tpu.onedispatch import (
        start_one_dispatch,
        start_one_dispatch_slab,
    )
    from dmmt_jpeg_encoder_tpu.tables import quantization_table_pair

    t0 = time.perf_counter()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    print(f"init {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    config = EncoderConfig(chroma_subsampling=ChromaSubsamplingPreset("P420"))
    luma_q, chroma_q = quantization_table_pair(
        QuantizationTablePreset.SPECIFICATION
    )

    w = 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:4352, 0:w]
    base = (
        96
        + 80 * np.sin(xx / 97.0)
        + 60 * np.cos(yy / 71.0)
        + rng.normal(0, 6, (4352, w))
    )
    tall = np.clip(
        np.stack([base, base * 0.9 + 10, base * 1.1 - 8], axis=-1), 0, 255
    ).astype(np.uint8)

    dev_cache: dict[tuple, object] = {}

    def dev_px(rows: int):
        key = ("single", rows)
        if key not in dev_cache:
            d = jax.device_put(np.ascontiguousarray(tall[:rows]))
            jax.block_until_ready(d)
            dev_cache[key] = d
        return dev_cache[key]

    def dev_stack(b: int, rows: int):
        key = ("stack", b, rows)
        if key not in dev_cache:
            d = jax.device_put(
                np.stack(
                    [
                        np.ascontiguousarray(tall[i * 16 : i * 16 + rows])
                        for i in range(b)
                    ]
                )
            )
            jax.block_until_ready(d)
            dev_cache[key] = d
        return dev_cache[key]

    def set_modes(**modes):
        for k in KNOBS:
            os.environ.pop(k, None)
        for k, v in modes.items():
            os.environ[k] = v

    def floor_single(rows: int) -> float:
        d = dev_px(rows)
        t0 = time.perf_counter()
        jax.device_get(
            start_one_dispatch(d, 255, config, luma_q, chroma_q).total_bits
        )
        c = time.perf_counter() - t0
        if c > 5:
            print(f"  (warm/compile {c:.1f}s)", file=sys.stderr, flush=True)
        inflight = max(2, args.bdev if rows <= 2176 else args.bdev // 2)
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            states = [
                start_one_dispatch(d, 255, config, luma_q, chroma_q)
                for _ in range(inflight)
            ]
            jax.device_get(states[-1].total_bits)
            best = min(best, (time.perf_counter() - t0) / inflight)
        return best * 1e3

    def floor_slab(b: int, rows: int) -> float:
        d = dev_stack(b, rows)
        t0 = time.perf_counter()
        jax.device_get(
            start_one_dispatch_slab(d, 255, config, luma_q, chroma_q)[-1]
            .total_bits
        )
        c = time.perf_counter() - t0
        if c > 5:
            print(f"  (warm/compile {c:.1f}s)", file=sys.stderr, flush=True)
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

    def run(job, tag, fn, rows, b=1, **modes):
        set_modes(**modes)
        try:
            ms = fn()
            rec = {
                "job": job, "tag": tag, "b": b, "rows": rows,
                "ms_per_image": round(ms, 3),
                "ms_per_program": round(ms * b, 3),
                "modes": modes,
            }
        except Exception:
            print(f"{tag} FAILED:", file=sys.stderr)
            traceback.print_exc()
            rec = {"job": job, "tag": tag, "error": True, "modes": modes}
        print(json.dumps(rec), flush=True)

    F = floor_single
    S = floor_slab

    # -- 305: the 2tier tiebreak at 4320x3840 -----------------------------
    run(305, "4320 plane ctl A", lambda: F(4320), 4320)
    run(305, "4320 2tier h32", lambda: F(4320), 4320, DMMT_SWEEP="2tier")
    run(305, "4320 plane ctl B", lambda: F(4320), 4320)
    run(305, "4320 2tier h16", lambda: F(4320), 4320,
        DMMT_SWEEP="2tier", DMMT_SWEEP_HEAD="16")
    run(305, "4320 2tier h8", lambda: F(4320), 4320,
        DMMT_SWEEP="2tier", DMMT_SWEEP_HEAD="8")
    run(305, "4320 k4-ablate (bytes wrong)", lambda: F(4320), 4320,
        DMMT_PACK_ABLATE="k4")
    run(305, "4320 plane ctl C", lambda: F(4320), 4320)

    # -- 306: slab overhead decomposition + deeper stacking ---------------
    run(306, "slab B=8x272 ctl", lambda: S(8, 272), 272, 8)
    run(306, "slab B=8x272 TABLE-ABLATE", lambda: S(8, 272), 272, 8,
        DMMT_TABLE_ABLATE="1")
    run(306, "slab B=16x272", lambda: S(16, 272), 272, 16)
    run(306, "slab B=8x544", lambda: S(8, 544), 544, 8)
    run(306, "single 2176 (anchor)", lambda: F(2176), 2176)
    return 0


if __name__ == "__main__":
    sys.exit(main())

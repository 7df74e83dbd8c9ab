"""Round-5 job 307: how deep can slab stacking go?

Job 306 showed the 2176-total-rows slab cap (derived from SINGLE-image
T(rows) superlinearity) does not bind stacked small images: B=16x272
(4352 rows) hit 2.39 ms/image and B=8x544 4.62 — both beat their
in-cap B=n configs by ~25%. This job walks toward the ~800K-block
compile cap: B=4x1088 (392K blocks), then the 783K-block trio
B=32x272 / B=16x544 / B=8x1088 (compile-OOM risk: run LAST, safest
first), with single anchors. Feeds the projection grid + the new gate
policy (per-image rows bound instead of total rows).

Usage: python benchmarks/ab_round5f.py [--rounds N]
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
    yy, xx = np.mgrid[0:2176, 0:w]
    base = (
        96
        + 80 * np.sin(xx / 97.0)
        + 60 * np.cos(yy / 71.0)
        + rng.normal(0, 6, (2176, w))
    )
    pixels = np.clip(
        np.stack([base, base * 0.9 + 10, base * 1.1 - 8], axis=-1), 0, 255
    ).astype(np.uint8)

    dev_cache: dict[tuple, object] = {}

    def dev_px(rows: int):
        key = ("single", rows)
        if key not in dev_cache:
            d = jax.device_put(np.ascontiguousarray(pixels[:rows]))
            jax.block_until_ready(d)
            dev_cache[key] = d
        return dev_cache[key]

    def dev_stack(b: int, rows: int):
        key = ("stack", b, rows)
        if key not in dev_cache:
            d = jax.device_put(
                np.stack(
                    [
                        np.ascontiguousarray(
                            pixels[(i * 16) % 512 : (i * 16) % 512 + rows]
                        )
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
        jax.device_get(
            start_one_dispatch(d, 255, config, luma_q, chroma_q).total_bits
        )
        inflight = max(2, args.bdev)
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
        calls = 2
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
            rec = {"job": job, "tag": tag, "b": b, "rows": rows,
                   "error": True, "modes": modes}
        print(json.dumps(rec), flush=True)

    os.environ["DMMT_SLAB_MAX_BLOCKS"] = "800000"
    run(307, "single 2176 anchor", lambda: floor_single(2176), 2176)
    run(307, "slab B=4x1088", lambda: floor_slab(4, 1088), 1088, 4)
    run(307, "slab B=12x272", lambda: floor_slab(12, 272), 272, 12)
    # 783K-block programs (compile-OOM risk zone) — safest first, each
    # banked before the next
    run(307, "slab B=32x272", lambda: floor_slab(32, 272), 272, 32)
    run(307, "slab B=16x544", lambda: floor_slab(16, 544), 544, 16)
    run(307, "slab B=8x1088", lambda: floor_slab(8, 1088), 1088, 8)
    run(307, "single 2176 anchor #2", lambda: floor_single(2176), 2176)
    return 0


if __name__ == "__main__":
    sys.exit(main())

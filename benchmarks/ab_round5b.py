"""Round-5 job 301: the B-image SLAB FLOOR GRID (VERDICT r4 #1a) and the
one-pack-per-slab A/B (#1b).

Round 4's multi-chip projection modeled a B-image slab shard program as
T(B * rows) — a single image's floor — but measured B=2 slabs costing
MORE than the single image of the same total rows (per-image table
builds + pack invocations). This job measures the REAL slab floors at
the shard geometries the projection uses (272/544/1088-row images
stacked to <= 2176 total rows), in both pack modes:

  - singles: T(272), T(544), T(1088), T(2176)           [controls]
  - onepack slabs: (B, rows) in {(2,272),(4,272),(8,272),
                    (2,544),(4,544),(2,1088)}
  - legacy per-image-pack slabs: (8,272), (4,544), (2,1088)
  - drift control: T(2176) again at the end

Output: one JSON line per config -> feed parallel/projection.py's
measured 2-D grid. Mode: plane + fused hist (the parity defaults).

Usage: python benchmarks/ab_round5b.py [--rounds N]
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
    "DMMT_TABLE_ABLATE",
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
                            pixels[i * 16 : i * 16 + rows]
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
        t0 = time.perf_counter()
        jax.device_get(
            start_one_dispatch(d, 255, config, luma_q, chroma_q).total_bits
        )
        c = time.perf_counter() - t0
        if c > 5:
            print(f"  (warm/compile {c:.1f}s)", file=sys.stderr, flush=True)
        inflight = max(4, args.bdev)
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

    def run(tag, fn, rows, b=1, **modes):
        set_modes(**modes)
        try:
            ms = fn()
            rec = {
                "job": 301, "tag": tag, "b": b, "rows": rows,
                "ms_per_image": round(ms, 3),
                "ms_per_program": round(ms * b, 3),
                "modes": modes,
            }
        except Exception:
            print(f"{tag} FAILED:", file=sys.stderr)
            traceback.print_exc()
            rec = {"job": 301, "tag": tag, "b": b, "rows": rows,
                   "error": True, "modes": modes}
        print(json.dumps(rec), flush=True)

    # singles first (the projection's 1-D curve, idle refresh)
    for rows in (272, 544, 1088, 2176):
        run(f"single {rows}", lambda r=rows: floor_single(r), rows)

    # onepack slabs (default mode)
    for b, rows in ((2, 272), (4, 272), (8, 272), (2, 544), (4, 544),
                    (2, 1088)):
        run(
            f"slab onepack B={b}x{rows}",
            lambda b=b, r=rows: floor_slab(b, r), rows, b,
        )

    # legacy per-image-pack slabs (the r4 overhead arm)
    for b, rows in ((8, 272), (4, 544), (2, 1088)):
        run(
            f"slab legacy B={b}x{rows}",
            lambda b=b, r=rows: floor_slab(b, r), rows, b,
            DMMT_SLAB_ONEPACK="0",
        )

    # drift control
    run("single 2176 (drift ctl)", lambda: floor_single(2176), 2176)
    return 0


if __name__ == "__main__":
    sys.exit(main())

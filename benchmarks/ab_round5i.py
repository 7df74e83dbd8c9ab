"""Round-5 job 310: past-the-cap stack depth + grid purity.

(a) Do B=48/64 x 272-row stacks (1.18M / 1.57M blocks — past the 800K
default compile cap) still improve on B=32's 2.16 ms/image? Compile-OOM
risk zone: the ~400K-block OOM note predates the 783K success of job
307, so the real limit is unknown — run these LAST, each result banked
before the next. (b) Re-measure the three grid points recorded from the
one-pack arm ((2,272)/(4,272)/(2,544)) on the DEFAULT per-image-pack
arm, and refresh the round-4 T(4320) single point, so every projection
input is same-arm same-discipline.

Usage: python benchmarks/ab_round5i.py [--rounds N]
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
    pixels = np.clip(
        np.stack([base, base * 0.9 + 10, base * 1.1 - 8], axis=-1), 0, 255
    ).astype(np.uint8)

    def floor_single(rows: int) -> float:
        d = jax.device_put(np.ascontiguousarray(pixels[:rows]))
        jax.block_until_ready(d)
        jax.device_get(
            start_one_dispatch(d, 255, config, luma_q, chroma_q).total_bits
        )
        inflight = 8
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            states = [
                start_one_dispatch(d, 255, config, luma_q, chroma_q)
                for _ in range(inflight)
            ]
            jax.device_get(states[-1].total_bits)
            best = min(best, (time.perf_counter() - t0) / inflight)
        del d
        return best * 1e3

    def floor_slab(b: int, rows: int) -> float:
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
        del d
        return best * 1e3

    def run(tag, fn, rows, b=1):
        try:
            ms = fn()
            rec = {
                "job": 310, "tag": tag, "b": b, "rows": rows,
                "ms_per_image": round(ms, 3),
                "ms_per_program": round(ms * b, 3),
            }
        except Exception:
            print(f"{tag} FAILED:", file=sys.stderr)
            traceback.print_exc()
            rec = {"job": 310, "tag": tag, "b": b, "rows": rows,
                   "error": True}
        print(json.dumps(rec), flush=True)

    os.environ["DMMT_SLAB_MAX_BLOCKS"] = "1700000"
    run("single 2176 anchor", lambda: floor_single(2176), 2176)
    # grid purity: default-arm re-measures of one-pack-arm points
    run("slab B=2x272 (default arm)", lambda: floor_slab(2, 272), 272, 2)
    run("slab B=4x272 (default arm)", lambda: floor_slab(4, 272), 272, 4)
    run("slab B=2x544 (default arm)", lambda: floor_slab(2, 544), 544, 2)
    run("single 4320 refresh", lambda: floor_single(4320), 4320)
    # past-the-cap depth, OOM risk ascending
    run("slab B=48x272", lambda: floor_slab(48, 272), 272, 48)
    run("slab B=64x272", lambda: floor_slab(64, 272), 272, 64)
    run("single 2176 anchor #2", lambda: floor_single(2176), 2176)
    return 0


if __name__ == "__main__":
    sys.exit(main())

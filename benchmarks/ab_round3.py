"""Round-3 device A/B harness: runs the queued PERF.md jobs in ONE process.

Jobs (PERF.md round-3 section):
  100  DMMT_P1=mxu vs plane           (MXU block-diagonal DCT)
  101  DMMT_HIST=fused vs matmul      (fused structure+histogram kernel)
  102  multi-image one-dispatch (group 2/4) vs single
  103  slab-height scaling floors     (projected multi-chip model inputs)
  104  DMMT_P1=fused1 vs plane        (whole-phase-1 Pallas kernel)
  105  DMMT_FUSED1_TILEW sweep
 plus  DMMT_P1_PREC high vs highest for the matmul DCT modes

Measurement discipline (PERF.md): pipelined floors (8 dispatches in
flight, block on the last program's scalar, divide), periodic re-runs of
an unchanged control config to catch warm-session drift, all A/Bs in the
same process. Emits one JSON line per measurement to stdout.

Usage: python benchmarks/ab_round3.py [--rounds N]
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
    args = ap.parse_args()

    import jax

    from dmmt_jpeg_encoder_tpu import ChromaSubsamplingPreset, EncoderConfig
    from dmmt_jpeg_encoder_tpu.config import QuantizationTablePreset
    from dmmt_jpeg_encoder_tpu.onedispatch import (
        start_one_dispatch,
        start_one_dispatch_multi,
    )
    from dmmt_jpeg_encoder_tpu.tables import quantization_table_pair

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    config = EncoderConfig(chroma_subsampling=ChromaSubsamplingPreset("P420"))
    luma_q, chroma_q = quantization_table_pair(
        QuantizationTablePreset.SPECIFICATION
    )

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        96
        + 80 * np.sin(xx / 97.0)
        + 60 * np.cos(yy / 71.0)
        + rng.normal(0, 6, (h, w))
    )
    pixels = np.clip(
        np.stack([base, base * 0.9 + 10, base * 1.1 - 8], axis=-1), 0, 255
    ).astype(np.uint8)

    dev_cache: dict[int, object] = {}

    def dev_px(height: int):
        if height not in dev_cache:
            d = jax.device_put(pixels[:height])
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
        """Pipelined program floor in ms/image at the current env modes."""
        d = dev_px(height)
        t0 = time.perf_counter()
        jax.device_get(
            start_one_dispatch(d, 255, config, luma_q, chroma_q).total_bits
        )
        compile_s = time.perf_counter() - t0
        if compile_s > 5:
            print(f"  (warm/compile {compile_s:.1f}s)", file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            states = [
                start_one_dispatch(d, 255, config, luma_q, chroma_q)
                for _ in range(args.bdev)
            ]
            jax.device_get(states[-1].total_bits)
            best = min(best, (time.perf_counter() - t0) / args.bdev)
        return best * 1e3

    stack_cache: dict[int, object] = {}

    def floor_multi(group: int) -> float:
        if group not in stack_cache:
            d = jax.device_put(
                np.stack(
                    [np.roll(pixels, 17 * i, axis=0) for i in range(group)]
                )
            )
            jax.block_until_ready(d)
            stack_cache[group] = d
        d = stack_cache[group]
        jax.device_get(
            start_one_dispatch_multi(d, 255, config, luma_q, chroma_q)[-1]
            .total_bits
        )
        calls = max(1, args.bdev // group)
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            last = None
            for _ in range(calls):
                last = start_one_dispatch_multi(d, 255, config, luma_q, chroma_q)
            jax.device_get(last[-1].total_bits)
            best = min(best, (time.perf_counter() - t0) / (calls * group))
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

    F = floor_single  # default thunk builder below

    # -- controls + job 100/104: P1 mode ladder -------------------------
    run("ctl", "plane/matmul #1", lambda: F(2160), DMMT_P1="plane")
    run(100, "mxu/matmul", lambda: F(2160), DMMT_P1="mxu")
    run(100, "mxu prec=high", lambda: F(2160), DMMT_P1="mxu", DMMT_P1_PREC="high")
    run(104, "fused1 tilew=256", lambda: F(2160), DMMT_P1="fused1")
    # -- job 105: tile width sweep --------------------------------------
    run(105, "fused1 tilew=512", lambda: F(2160), DMMT_P1="fused1",
        DMMT_FUSED1_TILEW="512")
    run(105, "fused1 tilew=768", lambda: F(2160), DMMT_P1="fused1",
        DMMT_FUSED1_TILEW="768")
    run(105, "fused1 tilew=1024", lambda: F(2160), DMMT_P1="fused1",
        DMMT_FUSED1_TILEW="1024")
    run(105, "fused1 prec=high", lambda: F(2160), DMMT_P1="fused1",
        DMMT_P1_PREC="high")
    run("ctl", "plane/matmul #2", lambda: F(2160), DMMT_P1="plane")

    # Pick the best P1 mode so far for the hist/multi/slab stages.
    ok = [r for r in results if "error" not in r and r["height"] == 2160]
    best = min(ok, key=lambda r: r["ms_per_image"])
    best_modes = dict(best["modes"])
    print(f"best so far: {best['tag']} {best['ms_per_image']} ms "
          f"{best_modes}", file=sys.stderr, flush=True)

    # -- job 101: fused histogram on top of best and on plane -----------
    run(101, "best+hist=fused", lambda: F(2160),
        **{**best_modes, "DMMT_HIST": "fused"})
    run(101, "plane+hist=fused", lambda: F(2160), DMMT_P1="plane",
        DMMT_HIST="fused")

    ok = [r for r in results if "error" not in r and r["height"] == 2160]
    best = min(ok, key=lambda r: r["ms_per_image"])
    best_modes = dict(best["modes"])
    print(f"best overall: {best['tag']} {best['ms_per_image']} ms "
          f"{best_modes}", file=sys.stderr, flush=True)

    # -- job 102: multi-image grouping in the best configuration --------
    run(102, "multi group=2", lambda: floor_multi(2), **best_modes)
    run(102, "multi group=4", lambda: floor_multi(4), **best_modes)

    # -- job 103: slab-height scaling (projected multi-chip model) ------
    for n, sh in ((1, 2160), (2, 1088), (4, 544), (8, 272)):
        run(103, f"slab n={n} h={sh} best", lambda sh=sh: F(sh), height=sh,
            **best_modes)
    for n, sh in ((2, 1088), (4, 544), (8, 272)):
        run(103, f"slab n={n} h={sh} plane", lambda sh=sh: F(sh), height=sh,
            DMMT_P1="plane")

    # -- drift control --------------------------------------------------
    run("ctl", "plane/matmul #3", lambda: F(2160), DMMT_P1="plane")
    run("ctl", f"best rerun ({best['tag']})", lambda: F(2160), **best_modes)

    print("=== SUMMARY ===", flush=True)
    for r in results:
        print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

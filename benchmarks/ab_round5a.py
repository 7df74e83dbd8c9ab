"""Round-5 job 300: HARDWARE COMPILE PROBE for the new kernels/modes.

Interpret-mode tests prove semantics, not Mosaic lowerability (round-3
lesson: uint8->f32 casts and HIGH dots failed only on hardware). Probe,
on tiny images, BEFORE scheduling the long A/Bs:
  - fused_pack_words_slab (2-D grid, per-image SMEM table windows) via a
    B=2 slab encode, bytes vs per-image one-dispatch encodes
  - DMMT_SWEEP=2tier (hot-first tables + data-dependent tail loop) via a
    single encode, bytes vs default sweep
  - both at once (slab + 2tier)

Usage: python benchmarks/ab_round5a.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np


def main() -> int:
    import jax

    from dmmt_jpeg_encoder_tpu import ChromaSubsamplingPreset, EncoderConfig
    from dmmt_jpeg_encoder_tpu.onedispatch import (
        finish_one_dispatch,
        start_one_dispatch,
        start_one_dispatch_slab,
    )
    from dmmt_jpeg_encoder_tpu.tables import quantization_table_pair
    from dmmt_jpeg_encoder_tpu.config import QuantizationTablePreset

    t0 = time.perf_counter()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    print(f"init {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    config = EncoderConfig(chroma_subsampling=ChromaSubsamplingPreset("P420"))
    luma_q, chroma_q = quantization_table_pair(
        QuantizationTablePreset.SPECIFICATION
    )
    rng = np.random.default_rng(42)
    h, w = 64, 96
    base = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    imgs = [base, np.roll(base, 7, axis=0)]

    results = []

    def rec(tag, ok, note=""):
        r = {"job": 300, "tag": tag, "ok": ok, "note": note}
        results.append(r)
        print(json.dumps(r), flush=True)

    # reference bytes: per-image one-dispatch (default modes)
    for k in ("DMMT_SWEEP", "DMMT_SLAB_ONEPACK", "DMMT_SWEEP_HEAD"):
        os.environ.pop(k, None)
    try:
        want = []
        for px in imgs:
            st = start_one_dispatch(px, 255, config, luma_q, chroma_q)
            want.append(finish_one_dispatch(st, config))
        rec("per-image control", True)
    except Exception:
        traceback.print_exc()
        rec("per-image control", False)
        return 1

    # probe 1: slab onepack
    try:
        states = start_one_dispatch_slab(
            np.stack(imgs), 255, config, luma_q, chroma_q
        )
        got = [finish_one_dispatch(st, config) for st in states]
        ok = all(g[0] == wnt[0] for g, wnt in zip(got, want))
        rec("slab onepack B=2", ok, "" if ok else "BYTES DIFFER")
    except Exception:
        traceback.print_exc()
        rec("slab onepack B=2", False, "compile/exec FAILED")

    # probe 2: 2tier sweep (tiny head to force the tail loop on-chip too)
    for head in ("32", "4"):
        try:
            os.environ["DMMT_SWEEP"] = "2tier"
            os.environ["DMMT_SWEEP_HEAD"] = head
            st = start_one_dispatch(imgs[0], 255, config, luma_q, chroma_q)
            got0 = finish_one_dispatch(st, config)
            ok = got0[0] == want[0][0]
            rec(f"2tier head={head}", ok, "" if ok else "BYTES DIFFER")
        except Exception:
            traceback.print_exc()
            rec(f"2tier head={head}", False, "compile/exec FAILED")
        finally:
            os.environ.pop("DMMT_SWEEP", None)
            os.environ.pop("DMMT_SWEEP_HEAD", None)

    # probe 3: slab onepack x 2tier together
    try:
        os.environ["DMMT_SWEEP"] = "2tier"
        states = start_one_dispatch_slab(
            np.stack(imgs), 255, config, luma_q, chroma_q
        )
        got = [finish_one_dispatch(st, config) for st in states]
        ok = all(g[0] == wnt[0] for g, wnt in zip(got, want))
        rec("slab onepack + 2tier", ok, "" if ok else "BYTES DIFFER")
    except Exception:
        traceback.print_exc()
        rec("slab onepack + 2tier", False, "compile/exec FAILED")
    finally:
        os.environ.pop("DMMT_SWEEP", None)

    n_ok = sum(1 for r in results if r["ok"])
    print(f"PROBE: {n_ok}/{len(results)} ok", flush=True)
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())

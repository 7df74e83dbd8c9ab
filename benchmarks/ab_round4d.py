"""Round-4d: attribute the T(rows) slope increase past 2160 rows.

Measured (PERF.md round 4): marginal program cost rises from ~5.3 us/row
(1088 -> 2160) to ~7.2 us/row (2160 -> 4320) in EVERY phase-1 mode
(plane and the VMEM-resident fused1 both double 2160 -> 4320), so the
growth lives in the shared tail: pack kernel, histograms, device table
build, or the scan epilogue. This harness runs the pack-kernel timing
ablations (DMMT_PACK_ABLATE, import-time -> one subprocess per value;
bytes are WRONG under ablation, timing only) at BOTH heights and prints
the per-ablation T(4320)/T(2160) ratio. The component whose removal
pulls the ratio toward the linear 2.0 is the superlinear one.

Usage:
  python benchmarks/ab_round4d.py              # orchestrates subprocesses
  python benchmarks/ab_round4d.py --ablate X   # one measurement (child)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

ABLATIONS = ("", "noac", "k4", "noroll", "nomerge")


def child(ablate: str, rounds: int) -> int:
    if ablate:
        os.environ["DMMT_PACK_ABLATE"] = ablate

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

    out = {}
    for height in (2160, 4320):
        d = jax.device_put(np.ascontiguousarray(pixels8k[:height]))
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        jax.device_get(
            start_one_dispatch(d, 255, config, luma_q, chroma_q).total_bits
        )
        if (c := time.perf_counter() - t0) > 5:
            print(f"  (warm/compile {c:.1f}s)", file=sys.stderr, flush=True)
        inflight = 8 if height <= 2160 else 4
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            states = [
                start_one_dispatch(d, 255, config, luma_q, chroma_q)
                for _ in range(inflight)
            ]
            jax.device_get(states[-1].total_bits)
            best = min(best, (time.perf_counter() - t0) / inflight)
        out[height] = best * 1e3
    rec = {
        "ablate": ablate or "none",
        "t2160_ms": round(out[2160], 3),
        "t4320_ms": round(out[4320], 3),
        "ratio": round(out[4320] / out[2160], 3),
    }
    print(json.dumps(rec), flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--ablate", default=None)
    args = ap.parse_args()

    if args.ablate is not None:
        return child(args.ablate, args.rounds)

    for ab in ABLATIONS:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--ablate", ab, "--rounds", str(args.rounds)]
        print(f"--- ablate={ab or 'none'} ---", flush=True)
        subprocess.run(cmd)
    return 0


if __name__ == "__main__":
    sys.exit(main())

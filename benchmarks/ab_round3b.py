"""Round-3 A/B pass 2: re-run the modes that failed to compile in pass 1
(fused1 after the uint8->int32->f32 cast fix; prec=high after the manual
bf16x3 dot_p1 decomposition) plus controls, one process, pipelined floors.

Usage: python benchmarks/ab_round3b.py
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
    from dmmt_jpeg_encoder_tpu.config import QuantizationTablePreset
    from dmmt_jpeg_encoder_tpu.onedispatch import start_one_dispatch
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
    mpix = h * w / 1e6

    d = jax.device_put(pixels)
    jax.block_until_ready(d)

    KNOBS = ("DMMT_P1", "DMMT_HIST", "DMMT_FUSED1_TILEW", "DMMT_P1_PREC")

    def floor() -> float:
        t0 = time.perf_counter()
        jax.device_get(
            start_one_dispatch(d, 255, config, luma_q, chroma_q).total_bits
        )
        c = time.perf_counter() - t0
        if c > 5:
            print(f"  (warm {c:.1f}s)", file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            states = [
                start_one_dispatch(d, 255, config, luma_q, chroma_q)
                for _ in range(8)
            ]
            jax.device_get(states[-1].total_bits)
            best = min(best, (time.perf_counter() - t0) / 8)
        return best * 1e3

    def run(tag, **modes):
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(modes)
        try:
            ms = floor()
            rec = {"tag": tag, "ms": round(ms, 3),
                   "mpix_per_s": round(mpix * 1e3 / ms, 1), "modes": modes}
        except Exception:
            print(f"{tag} FAILED:", file=sys.stderr)
            traceback.print_exc()
            rec = {"tag": tag, "error": True, "modes": modes}
        print(json.dumps(rec), flush=True)

    run("ctl plane+fused-hist (new default)", DMMT_P1="plane")
    run("fused1 tw=256", DMMT_P1="fused1")
    run("fused1 tw=512", DMMT_P1="fused1", DMMT_FUSED1_TILEW="512")
    run("fused1 tw=1024", DMMT_P1="fused1", DMMT_FUSED1_TILEW="1024")
    run("fused1 tw=256 prec=high", DMMT_P1="fused1", DMMT_P1_PREC="high")
    run("fused1 tw=512 prec=high", DMMT_P1="fused1",
        DMMT_FUSED1_TILEW="512", DMMT_P1_PREC="high")
    run("mxu prec=high", DMMT_P1="mxu", DMMT_P1_PREC="high")
    run("ctl rerun", DMMT_P1="plane")
    return 0


if __name__ == "__main__":
    sys.exit(main())

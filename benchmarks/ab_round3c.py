"""Round-3 A/B pass 3: 8K floors in the round-3 winning modes (the
README 8K figure predates fused hist/fused1), with a 4K anchor for
cross-process comparability. One process, pipelined floors.
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

    def make(h, w):
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:h, 0:w]
        base = (
            96
            + 80 * np.sin(xx / 97.0)
            + 60 * np.cos(yy / 71.0)
            + rng.normal(0, 6, (h, w))
        )
        px = np.clip(
            np.stack([base, base * 0.9 + 10, base * 1.1 - 8], axis=-1),
            0, 255,
        ).astype(np.uint8)
        d = jax.device_put(px)
        jax.block_until_ready(d)
        return d

    KNOBS = ("DMMT_P1", "DMMT_HIST", "DMMT_FUSED1_TILEW", "DMMT_P1_PREC")

    def floor(d, rounds=4, bdev=6) -> float:
        jax.device_get(
            start_one_dispatch(d, 255, config, luma_q, chroma_q).total_bits
        )
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            states = [
                start_one_dispatch(d, 255, config, luma_q, chroma_q)
                for _ in range(bdev)
            ]
            jax.device_get(states[-1].total_bits)
            best = min(best, (time.perf_counter() - t0) / bdev)
        return best * 1e3

    def run(tag, d, mpix, **modes):
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(modes)
        try:
            ms = floor(d)
            rec = {"tag": tag, "ms": round(ms, 3),
                   "mpix_per_s": round(mpix * 1e3 / ms, 1), "modes": modes}
        except Exception:
            print(f"{tag} FAILED:", file=sys.stderr)
            traceback.print_exc()
            rec = {"tag": tag, "error": True, "modes": modes}
        print(json.dumps(rec), flush=True)

    d4 = make(2160, 3840)
    run("4k anchor plane+fused", d4, 8.2944, DMMT_P1="plane")
    run("4k anchor fused1", d4, 8.2944, DMMT_P1="fused1")
    del d4
    d8 = make(4320, 7680)
    run("8k plane+fused", d8, 33.1776, DMMT_P1="plane")
    run("8k fused1", d8, 33.1776, DMMT_P1="fused1")
    return 0


if __name__ == "__main__":
    sys.exit(main())

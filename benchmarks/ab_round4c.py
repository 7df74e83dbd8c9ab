"""Round-4c probes: e2e upload-depth sweep (one process; DMMT_UPLOAD_DEPTH
is read per encode_batch call) — finds the best default for the pipelined
per-image batch path on the serialized tunnel link, where deep upload
look-ahead can head-of-line-block the per-image result fetches.

Usage: python benchmarks/ab_round4c.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    import jax

    from dmmt_jpeg_encoder_tpu import ChromaSubsamplingPreset, EncoderConfig
    from dmmt_jpeg_encoder_tpu.encoder import encode_batch

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    config = EncoderConfig(chroma_subsampling=ChromaSubsamplingPreset("P420"))

    w = 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:2160, 0:w]
    base = (
        96
        + 80 * np.sin(xx / 97.0)
        + 60 * np.cos(yy / 71.0)
        + rng.normal(0, 6, (2160, w))
    )
    pixels = np.clip(
        np.stack([base, base * 0.9 + 10, base * 1.1 - 8], axis=-1), 0, 255
    ).astype(np.uint8)
    imgs = [np.roll(pixels, 17 * i, axis=0) for i in range(8)]

    t0 = time.perf_counter()
    encode_batch(imgs, 255, config)  # warm (compile + fetch-size caches)
    print(f"warm {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    results = []
    # Interleave depths across rounds so session drift hits all equally.
    depths = [1, 2, 3, 4]
    best = {d: float("inf") for d in depths}
    for rnd in range(3):
        for d in depths:
            os.environ["DMMT_UPLOAD_DEPTH"] = str(d)
            t0 = time.perf_counter()
            encode_batch(imgs, 255, config)
            ms = (time.perf_counter() - t0) / 8 * 1e3
            best[d] = min(best[d], ms)
            print(json.dumps({"round": rnd, "depth": d,
                              "ms_per_image": round(ms, 1)}), flush=True)
    print("=== SUMMARY ===", flush=True)
    for d in depths:
        rec = {
            "depth": d,
            "best_ms_per_image": round(best[d], 1),
            "mpix_per_s": round(2160 * w / 1e6 * 1e3 / best[d], 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

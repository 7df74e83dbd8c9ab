"""Round-5 job 309: does chunking unlock deeper upload look-ahead?

ab_round4c measured DMMT_UPLOAD_DEPTH>2 losing on batch e2e because
queued whole-image uploads head-of-line-blocked the per-image result
fetches. Job 304 fixed exactly that failure mode with ~4 MB upload
slices issued around the fetch. If blocking was the only reason depth
lost, deeper look-ahead should now recover the concurrent-transfer gain
job 202 measured in isolation (96 MB/s with 4 puts in flight vs ~60
single-stream). Arms interleave within each round to fight the link's
~2x swings; fresh image content per arm per round (repeat-uploads of
identical buffers hit a tunnel cache, PERF.md round 5).

Usage: python benchmarks/ab_round5h.py [--rounds N] [--batch B]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    import dmmt_jpeg_encoder_tpu as dj
    from dmmt_jpeg_encoder_tpu.encoder import encode_batch

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    h, w = 2160, 3840
    mpix = h * w / 1e6
    cfg = dj.EncoderConfig(scan_backend="device")
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 80 * np.sin(xx / 97.0) + 60 * np.cos(yy / 71.0)

    def fresh_images(salt: int) -> list[np.ndarray]:
        # new noise per arm per round: defeats the tunnel's repeat-upload
        # cache so every arm pays real transfer cost
        r = np.random.default_rng(salt)
        return [
            np.clip(
                np.stack([base, base * 0.9 + 10, base * 1.1 - 8], axis=-1)
                + r.normal(0, 6, (h, w, 3)),
                0,
                255,
            ).astype(np.uint8)
            for _ in range(args.batch)
        ]

    arms = [
        ("depth2 chunk4", {"DMMT_UPLOAD_DEPTH": "2", "DMMT_UPLOAD_CHUNK_MB": "4"}),
        ("depth4 chunk4", {"DMMT_UPLOAD_DEPTH": "4", "DMMT_UPLOAD_CHUNK_MB": "4"}),
        ("depth6 chunk4", {"DMMT_UPLOAD_DEPTH": "6", "DMMT_UPLOAD_CHUNK_MB": "4"}),
        ("depth4 chunk2", {"DMMT_UPLOAD_DEPTH": "4", "DMMT_UPLOAD_CHUNK_MB": "2"}),
        ("depth2 chunk0 (r4 shipped)", {"DMMT_UPLOAD_DEPTH": "2", "DMMT_UPLOAD_CHUNK_MB": "0"}),
    ]

    # warm: compile the 4K program once so no arm pays it
    warm = fresh_images(999)[:2]
    encode_batch(warm, 255, cfg)

    sums = {tag: [] for tag, _ in arms}
    salt = 0
    for rnd in range(args.rounds):
        for tag, env in arms:
            for k, v in env.items():
                os.environ[k] = v
            salt += 1
            imgs = fresh_images(salt)
            t0 = time.perf_counter()
            out = encode_batch(imgs, 255, cfg)
            dt = time.perf_counter() - t0
            assert len(out) == args.batch and all(len(o) > 1000 for o in out)
            per = dt / args.batch
            sums[tag].append(per)
            print(
                json.dumps(
                    {
                        "job": 309,
                        "round": rnd,
                        "tag": tag,
                        "ms_per_image": round(per * 1e3, 1),
                        "mpix_per_s": round(mpix / per, 2),
                    }
                ),
                flush=True,
            )
    for tag, vals in sums.items():
        mean = sum(vals) / len(vals)
        print(
            json.dumps(
                {
                    "job": 309,
                    "tag": f"MEAN {tag}",
                    "ms_per_image": round(mean * 1e3, 1),
                    "mpix_per_s": round(mpix / mean, 2),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

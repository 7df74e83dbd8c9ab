"""Round-5 job 308: on-chip SMOKE of the production deep-slab gate.

Job 307 proved B=16/32 slab PROGRAMS compile and run on hardware via
start_one_dispatch_slab directly; this drives the same depth through the
public encode_batch entry (gate auto-pick, host stacking, pipelined
stack uploads) and byte-checks two images against single encodes plus a
PIL decode. Correctness smoke only — run while the CPU suite may be
loading the host, so throughput prints are indicative, not floors.

Usage: python benchmarks/ab_round5g.py
"""

from __future__ import annotations

import io
import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    from PIL import Image

    import dmmt_jpeg_encoder_tpu as dj
    from dmmt_jpeg_encoder_tpu.encoder import encode_array, encode_batch
    import dmmt_jpeg_encoder_tpu.onedispatch as od

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    seen: list[int] = []
    real = od.start_one_dispatch_slab

    def counting(stack, *a, **k):
        seen.append(int(stack.shape[0]))
        return real(stack, *a, **k)

    od.start_one_dispatch_slab = counting

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:544, 0:3840]
    base = 96 + 80 * np.sin(xx / 97.0) + 60 * np.cos(yy / 71.0)
    imgs = [
        np.clip(
            np.stack(
                [base, base * 0.9 + 10, base * 1.1 - 8], axis=-1
            )
            + rng.normal(0, 6, (544, 3840, 3)),
            0,
            255,
        ).astype(np.uint8)
        for _ in range(16)
    ]
    cfg = dj.EncoderConfig(scan_backend="device")

    t0 = time.perf_counter()
    batch = encode_batch(imgs, 255, cfg)
    t_batch = time.perf_counter() - t0
    assert seen == [16], f"gate picked groups {seen}, expected one B=16"

    ok_decode = 0
    for b in batch:
        d = np.asarray(Image.open(io.BytesIO(bytes(b))).convert("RGB"))
        assert d.shape == (544, 3840, 3)
        ok_decode += 1

    od.start_one_dispatch_slab = real
    mism = 0
    for i in (0, 15):
        single = encode_array(imgs[i], 255, cfg)
        if bytes(single) != bytes(batch[i]):
            mism += 1

    print(
        json.dumps(
            {
                "job": 308,
                "tag": "encode_batch deep-slab smoke B=16x544 on-chip",
                "groups": seen,
                "pil_decoded": ok_decode,
                "byte_mismatches_vs_single": mism,
                "batch_s_total_indicative": round(t_batch, 2),
            }
        ),
        flush=True,
    )
    return 1 if mism else 0


if __name__ == "__main__":
    sys.exit(main())

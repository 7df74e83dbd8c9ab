"""Round-5 job 304: chunked-upload e2e scheduling (VERDICT r4 #3).

Round 4 measured 96 MB/s aggregate with 4 uploads in flight (job 202)
=> a ~32 Mpix/s link ceiling, but batch e2e recorded 15.3 Mpix/s: deep
upload look-ahead lost to head-of-line blocking (a queued 25 MB upload
delays the 0.45 MB result fetch on the serialized link). The obvious
counter never tried: split each image upload into ~4 MB device_put
slices and interleave the result fetches BETWEEN slices.

Stages:
  a) reused-buffer upload bandwidth: whole 24.9 MB vs 6 x 4.15 MB
     slices (does slicing itself cost bandwidth?)
  b) fetch-latency-under-upload: queue a whole-image upload then
     immediately fetch a small device array, vs queueing one slice at a
     time with the fetch after the first slice
  c) prototype chunked-pipeline batch e2e (8 x 4K images, hand-rolled
     two-deep pipeline with slice-interleaved uploads) vs the shipped
     encode_batch
Usage: python benchmarks/ab_round5d.py [--n N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--slices", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dmmt_jpeg_encoder_tpu import ChromaSubsamplingPreset, EncoderConfig
    from dmmt_jpeg_encoder_tpu.config import QuantizationTablePreset
    from dmmt_jpeg_encoder_tpu.encoder import encode_batch
    from dmmt_jpeg_encoder_tpu.onedispatch import (
        finish_one_dispatch,
        prefetch_one_dispatch,
        start_one_dispatch,
    )
    from dmmt_jpeg_encoder_tpu.tables import quantization_table_pair

    t0 = time.perf_counter()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    print(f"init {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    config = EncoderConfig(chroma_subsampling=ChromaSubsamplingPreset("P420"))
    luma_q, chroma_q = quantization_table_pair(
        QuantizationTablePreset.SPECIFICATION
    )
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        96 + 80 * np.sin(xx / 97.0) + 60 * np.cos(yy / 71.0)
        + rng.normal(0, 6, (h, w))
    )
    one = np.clip(
        np.stack([base, base * 0.9 + 10, base * 1.1 - 8], axis=-1), 0, 255
    ).astype(np.uint8)
    images = [np.roll(one, 13 * i, axis=0) for i in range(args.n)]
    mpix = h * w / 1e6
    mb = one.nbytes / 1e6

    def rec(tag, **kw):
        r = {"job": 304, "tag": tag, **kw}
        print(json.dumps(r), flush=True)

    # -- (a) upload bandwidth: whole vs sliced ----------------------------
    def put_whole(src):
        d = jax.device_put(src)
        jax.block_until_ready(d)
        return d

    def put_sliced(src, k):
        step = -(-src.shape[0] // k)
        parts = [
            jax.device_put(src[i * step : (i + 1) * step]) for i in range(k)
        ]
        d = jnp.concatenate(parts, axis=0)
        jax.block_until_ready(d)
        return d

    try:
        put_whole(images[0])  # warm
        for name, fn in (
            ("whole", lambda s: put_whole(s)),
            (f"sliced x{args.slices}",
             lambda s: put_sliced(s, args.slices)),
        ):
            ts = []
            for i in range(4):
                src = images[i % 2]
                t0 = time.perf_counter()
                fn(src)
                ts.append(time.perf_counter() - t0)
            rec(f"upload {name}", MBps=round(mb / min(ts), 1),
                ms=[round(t * 1e3, 1) for t in ts])
    except Exception:
        traceback.print_exc()
        rec("upload bandwidth", error=True)

    # -- (b) fetch latency under queued upload ----------------------------
    try:
        st0 = start_one_dispatch(
            put_whole(images[0]), 255, config, luma_q, chroma_q
        )
        jax.device_get(st0.total_bits)  # warm program
        small = start_one_dispatch(
            put_whole(images[1]), 255, config, luma_q, chroma_q
        )
        jax.block_until_ready(small.words)  # program done; fetch is pure IO

        # whole-image upload queued ahead of the fetch
        t0 = time.perf_counter()
        d_up = jax.device_put(images[2])
        t_fetch0 = time.perf_counter()
        _ = jax.device_get(small.words[:120_000])  # ~0.45 MB
        t_fetch = time.perf_counter() - t_fetch0
        jax.block_until_ready(d_up)
        t_total = time.perf_counter() - t0
        rec("fetch under WHOLE upload", fetch_ms=round(t_fetch * 1e3, 1),
            total_ms=round(t_total * 1e3, 1))

        # sliced upload: fetch issued after slice 1
        jax.block_until_ready(small.words)
        step = -(-h // args.slices)
        t0 = time.perf_counter()
        parts = [jax.device_put(images[3][:step])]
        t_fetch0 = time.perf_counter()
        _ = jax.device_get(small.words[:120_000])
        t_fetch = time.perf_counter() - t_fetch0
        for i in range(1, args.slices):
            parts.append(
                jax.device_put(images[3][i * step : (i + 1) * step])
            )
        jax.block_until_ready(jnp.concatenate(parts, axis=0))
        t_total = time.perf_counter() - t0
        rec("fetch under SLICED upload", fetch_ms=round(t_fetch * 1e3, 1),
            total_ms=round(t_total * 1e3, 1))
    except Exception:
        traceback.print_exc()
        rec("fetch latency", error=True)

    # -- (c) batch e2e: shipped pipeline vs chunked prototype -------------
    def bench_shipped():
        t0 = time.perf_counter()
        out = encode_batch(images, 255, config)
        dt = time.perf_counter() - t0
        assert len(out) == len(images)
        return dt / len(images)

    def bench_chunked(depth=2, k=args.slices):
        """Two-deep pipeline; image i+depth's upload runs as k slices,
        issued half before and half after image i-1's finish fetch."""
        step = -(-h // k)

        def put_some(src, parts, lo, hi):
            for j in range(lo, hi):
                parts.append(jax.device_put(src[j * step : (j + 1) * step]))

        def seal(parts):
            return jnp.concatenate(parts, axis=0)

        t0 = time.perf_counter()
        n = len(images)
        parts_buf: list = [None] * n
        dev: list = [None] * n
        states: list = [None] * n
        out: list = [None] * n
        for j in range(min(depth, n)):
            parts_buf[j] = []
            put_some(images[j], parts_buf[j], 0, k)
            dev[j] = seal(parts_buf[j])
        for i in range(n):
            nxt = i + depth
            if nxt < n:
                parts_buf[nxt] = []
                put_some(images[nxt], parts_buf[nxt], 0, k // 2)
            states[i] = start_one_dispatch(
                dev[i], 255, config, luma_q, chroma_q
            )
            prefetch_one_dispatch(states[i], config)
            dev[i] = None
            if i > 0:
                scan, tables = finish_one_dispatch(states[i - 1], config)
                out[i - 1] = len(scan)
                states[i - 1] = None
            if nxt < n:
                put_some(images[nxt], parts_buf[nxt], k // 2, k)
                dev[nxt] = seal(parts_buf[nxt])
                parts_buf[nxt] = None
        scan, tables = finish_one_dispatch(states[n - 1], config)
        out[n - 1] = len(scan)
        dt = time.perf_counter() - t0
        assert all(o for o in out)
        return dt / n

    try:
        for rnd in range(3):
            s = bench_shipped()
            rec(f"batch e2e shipped r{rnd}",
                ms_per_image=round(s * 1e3, 1),
                mpix_per_s=round(mpix / s, 2))
            c = bench_chunked()
            rec(f"batch e2e chunked r{rnd}",
                ms_per_image=round(c * 1e3, 1),
                mpix_per_s=round(mpix / c, 2))
    except Exception:
        traceback.print_exc()
        rec("batch e2e", error=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Entropy-stage analysis on device.

The reference's per-block state machines become data-parallel tensor ops:

- DC DPCM (reference: src/...transformer/categorize.rs:153-168): the
  per-channel `last_dc` chain is a shifted subtract over the block axis —
  blocks must already be in MCU-entangled order for luma
  (transformer.rs:188-221 entangles BEFORE categorizing).
- Magnitude category (categorize.rs:21-43): bit length of |v|, computed
  exactly with 15 integer threshold compares (no float log).
- AC run lengths (categorize.rs:132-151): for each nonzero at zigzag
  position p, the count of zeros since the previous nonzero is
  p - prev_nonzero(p) - 1, where prev_nonzero is an exclusive running max
  over p*[v!=0] — a `lax.associative_scan`. Runs > 15 split into
  floor(run/16) ZRL symbols plus (run mod 16); trailing zeros contribute a
  single EOB (no ZRL), exactly the reference's while-loop semantics.
- Histograms: scatter-adds into 16-bin (DC) and 256-bin (AC) counters
  (symbol_counting.rs:8-44), jnp.psum-able across shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def magnitude_category(v: jnp.ndarray) -> jnp.ndarray:
    """JPEG magnitude category = bit length of |v| (0 for v == 0).
    Exact for |v| <= 32767 (category <= 15; the reference panics above —
    categorize.rs:28-33 — which cannot occur for int16 coefficients).

    Computed from the f32 exponent: int->f32 conversion is exact below
    2^24, so the biased exponent of f32(|v|) is exactly
    127 + floor(log2|v|) and the bit length is (bits >> 23) - 126 —
    a handful of elementwise ops instead of a [..., 15] threshold
    broadcast + reduce."""
    a = jnp.abs(v.astype(jnp.int32))
    bits = jax.lax.bitcast_convert_type(a.astype(jnp.float32), jnp.int32)
    return jnp.where(a > 0, (bits >> 23) - 126, 0)


def dc_dpcm(dc: jnp.ndarray, first_predictor: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-channel DC delta chain along axis 0; predictor starts at 0
    (categorize.rs:156-161). `first_predictor` overrides the predecessor of
    block 0 — the cross-shard DC hand-off hook used by parallel/sharding."""
    prev = jnp.concatenate([jnp.zeros((1,), dc.dtype), dc[:-1]])
    if first_predictor is not None:
        prev = prev.at[0].set(first_predictor.astype(dc.dtype))
    return dc - prev


def ac_symbols_and_structure(
    coeffs_zz: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """AC run/size structure for int16/int32 [N, 64] zigzag blocks.

    Returns (symbols, nonzero_mask, zrl_counts, eob_mask):
      symbols  int32 [N, 63]: (run % 16) << 4 | category, valid where nonzero
      nonzero  bool  [N, 63]
      zrl      int32 [N, 63]: floor(run/16) ZRL emissions before each nonzero
      eob      bool  [N]: block emits an EOB (trailing zeros exist)
    """
    ac = coeffs_zz[:, 1:].astype(jnp.int32)
    n = ac.shape[0]
    pos = jnp.arange(1, 64, dtype=jnp.int32)[None, :]
    nz = ac != 0
    nzpos = jnp.where(nz, pos, 0)
    shifted = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), nzpos[:, :-1]], axis=1
    )
    prev_nz = jax.lax.associative_scan(jnp.maximum, shifted, axis=1)
    run = pos - prev_nz - 1
    zrl = jnp.where(nz, run >> 4, 0)
    cat = magnitude_category(ac)
    symbols = ((run & 15) << 4) | cat
    last_nz = jnp.max(nzpos, axis=1)
    eob = last_nz < 63
    return symbols, nz, zrl, eob


def symbol_histograms(
    coeffs_zz: jnp.ndarray,
    block_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(dc_hist[16], ac_hist[256]) int32 for [N, 64] zigzag blocks whose DC
    entries are already DPCM deltas (symbol_counting.rs:55-74 semantics).

    `block_mask` (bool [N]) excludes blocks from the counts — the sharded
    pipeline uses it to ignore alignment-padding blocks that exist only to
    make the MCU-row count divisible by the shard count."""
    import os

    from ..ops.pallas_histogram import matmul_histogram, pallas_histogram

    # DMMT_HIST default is "fused" (round-3 on-chip A/B: 14.24 vs
    # 15.06 ms/4K program floor, bit-exact to the matmul path — PERF.md);
    # "matmul" selects the MXU nibble-matmul path, "pallas" the
    # masked-reduce sweep kernel. Non-Pallas backends fall back to
    # matmul below regardless.
    mode = os.environ.get("DMMT_HIST", "fused")
    if mode == "fused" and block_mask is None:
        # One fused structure+count kernel, zero HBM intermediates
        # (ops/pallas_block_hist.py). Masked (sharded) calls keep the
        # XLA path: a concat of two prefix masks is not a prefix.
        from ..utils.capability import pallas_capable

        if pallas_capable():
            from ..ops.pallas_block_hist import fused_block_histograms

            return fused_block_histograms(coeffs_zz)
    hist = pallas_histogram if mode == "pallas" else matmul_histogram

    weight = (
        jnp.ones((coeffs_zz.shape[0],), jnp.int32)
        if block_mask is None
        else block_mask.astype(jnp.int32)
    )
    dc_cat = magnitude_category(coeffs_zz[:, 0])
    dc_hist = hist(dc_cat, weight.astype(jnp.float32), 16)

    symbols, nz, zrl, eob = ac_symbols_and_structure(coeffs_zz)
    ac_hist = hist(
        symbols,
        (nz & (weight[:, None] > 0)).astype(jnp.float32),
        256,
    )
    ac_hist = ac_hist.at[0xF0].add(jnp.sum(zrl * weight[:, None], dtype=jnp.int32))
    ac_hist = ac_hist.at[0x00].add(
        jnp.sum(eob.astype(jnp.int32) * weight, dtype=jnp.int32)
    )
    return dc_hist, ac_hist


def batched_symbol_histograms(
    coeffs_zz: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image histograms for [B, N, 64] blocks -> ([B,16], [B,256]).

    Same semantics as symbol_histograms per image, computed with grouped
    Pallas kernels (one grid, no vmap-over-pallas)."""
    from ..ops.pallas_histogram import pallas_histogram_grouped

    b, n, _ = coeffs_zz.shape
    flat = coeffs_zz.reshape(b * n, 64)
    dc_cat = magnitude_category(flat[:, 0]).reshape(b, n)
    dc_hist = pallas_histogram_grouped(
        dc_cat, jnp.ones((b, n), jnp.float32), 16
    )

    symbols, nz, zrl, eob = ac_symbols_and_structure(flat)
    ac_hist = pallas_histogram_grouped(
        symbols.reshape(b, n * 63),
        nz.reshape(b, n * 63).astype(jnp.float32),
        256,
    )
    ac_hist = ac_hist.at[:, 0xF0].add(
        jnp.sum(zrl.reshape(b, -1), axis=1, dtype=jnp.int32)
    )
    ac_hist = ac_hist.at[:, 0x00].add(
        jnp.sum(eob.reshape(b, n).astype(jnp.int32), axis=1)
    )
    return dc_hist, ac_hist

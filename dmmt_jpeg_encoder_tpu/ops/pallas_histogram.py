"""Pallas histogram kernel: symbol counts without XLA scatter.

symbol_histograms' scatter-adds ([N*63] indices into 256 bins) lower to a
slow serialized scatter on TPU. This kernel instead reduces each tile once
per bin with a compare+select+sum on the VPU (no scatter, and no cross-lane
reshape, which Mosaic rejects), accumulating across the sequential grid
into the output block. Per-tile counts are f32 (exact: a tile holds 32K
symbols << 2^24) but the cross-tile accumulator is int32, so totals stay
exact for arbitrarily large images (a single 8K frame can push one AC bin
past 2^24, where f32 would silently round — and exact_scan_bits derives
the trusted stream length from these counts).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.capability import pallas_capable

# 256 x 128 = 32K symbols per grid step (tile 128 KB in VMEM); the per-bin
# loop reduces each tile once per bin, all on the VPU.
TILE_ROWS = 256
LANES = 128


def _accumulate_bins(sym, w, n_bins):
    """[1, n_bins] counts via a fori loop of masked reduces — Mosaic has no
    vector scatter and rejects cross-lane reshapes, but per-bin
    compare+select+reduce is pure VPU work."""
    import jax.lax as lax

    bins = lax.broadcasted_iota(jnp.int32, (1, n_bins), 1)

    def body(b, acc):
        cnt = jnp.sum(jnp.where(sym == b, w, 0.0))
        return acc + jnp.where(bins == b, cnt, 0.0)

    return lax.fori_loop(0, n_bins, body, jnp.zeros((1, n_bins), jnp.float32))


def _hist_kernel(sym_ref, weight_ref, out_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + _accumulate_bins(
        sym_ref[:], weight_ref[:], out_ref.shape[-1]
    ).astype(jnp.int32)


def matmul_histogram(
    symbols: jnp.ndarray, weights: jnp.ndarray, n_bins: int
) -> jnp.ndarray:
    """Histogram as an MXU contraction of nibble one-hots.

    counts[hi, lo] = sum_i w_i * (sym_i>>4 == hi) * (sym_i&15 == lo)
                   = (W*Hhi)^T @ Hlo

    Building the two one-hot factors costs 16+16 compares per element
    (vs n_bins compares for a masked-reduce sweep) and the contraction
    runs on the MXU. Exact: products are 0/1 * weight, per-bin sums stay
    far below 2^24, and 0/1/weight-integers are exact in bf16, so even
    DEFAULT-precision passes cannot round. ~6x less VPU work than the
    256-bin sweep kernel for AC histograms.
    """
    flat_s = symbols.reshape(-1).astype(jnp.int32)
    flat_w = weights.reshape(-1).astype(jnp.float32)
    if n_bins <= 16:
        oh = (
            flat_s[:, None] == jnp.arange(n_bins, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)
        counts = jnp.einsum(
            "i,ib->b", flat_w, oh, preferred_element_type=jnp.float32
        )
        return counts.astype(jnp.int32)
    assert n_bins == 256
    hi = flat_s >> 4
    lo = flat_s & 15
    bins16 = jnp.arange(16, dtype=jnp.int32)[None, :]
    h_hi = (hi[:, None] == bins16).astype(jnp.float32) * flat_w[:, None]
    h_lo = (lo[:, None] == bins16).astype(jnp.float32)
    counts = jnp.einsum(
        "ih,il->hl", h_hi, h_lo, preferred_element_type=jnp.float32
    )
    return counts.reshape(256).astype(jnp.int32)


def pallas_histogram(
    symbols: jnp.ndarray, weights: jnp.ndarray, n_bins: int
) -> jnp.ndarray:
    """Weighted histogram of int32 symbols (flat, any shape) -> int32 [n_bins].

    Weights are f32 (use 0.0 to drop padding entries). Falls back to XLA
    scatter-add off-TPU.
    """
    import os

    flat_s = symbols.reshape(-1).astype(jnp.int32)
    flat_w = weights.reshape(-1).astype(jnp.float32)
    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    if not interpret and not pallas_capable():
        return jnp.zeros((n_bins,), jnp.int32).at[flat_s].add(
            flat_w.astype(jnp.int32), mode="drop"
        )

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    per_tile = TILE_ROWS * LANES
    n = flat_s.shape[0]
    n_pad = -(-n // per_tile) * per_tile
    if n_pad != n:
        flat_s = jnp.pad(flat_s, (0, n_pad - n))
        flat_w = jnp.pad(flat_w, (0, n_pad - n))  # zero weight => no count
    sym2 = flat_s.reshape(-1, LANES)
    w2 = flat_w.reshape(-1, LANES)
    grid = n_pad // per_tile

    out = pl.pallas_call(
        _hist_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, n_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_bins), jnp.int32),
        interpret=interpret,
    )(sym2, w2)
    return out[0]


def _hist_kernel_grouped(sym_ref, weight_ref, out_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + _accumulate_bins(
        sym_ref[0], weight_ref[0], out_ref.shape[-1]
    ).astype(jnp.int32)[None]


def pallas_histogram_grouped(
    symbols: jnp.ndarray, weights: jnp.ndarray, n_bins: int
) -> jnp.ndarray:
    """Per-group weighted histograms: [G, M] symbols -> int32 [G, n_bins].

    The grid walks (group, tile); each group accumulates into its own
    output row (batched multi-image packing uses one group per image)."""
    import os

    g, m = symbols.shape
    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    if not interpret and not pallas_capable():
        flat_s = symbols.astype(jnp.int32) + (
            jnp.arange(g, dtype=jnp.int32)[:, None] * n_bins
        )
        hist = jnp.zeros((g * n_bins,), jnp.int32).at[flat_s.reshape(-1)].add(
            weights.reshape(-1).astype(jnp.int32), mode="drop"
        )
        return hist.reshape(g, n_bins)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    per_tile = TILE_ROWS * LANES
    m_pad = -(-m // per_tile) * per_tile
    s = symbols.astype(jnp.int32)
    w = weights.astype(jnp.float32)
    if m_pad != m:
        s = jnp.pad(s, ((0, 0), (0, m_pad - m)))
        w = jnp.pad(w, ((0, 0), (0, m_pad - m)))
    s3 = s.reshape(g, -1, LANES)
    w3 = w.reshape(g, -1, LANES)
    tiles = m_pad // per_tile

    out = pl.pallas_call(
        _hist_kernel_grouped,
        grid=(g, tiles),
        in_specs=[
            pl.BlockSpec(
                (1, TILE_ROWS, LANES),
                lambda gi, ti: (gi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TILE_ROWS, LANES),
                lambda gi, ti: (gi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n_bins), lambda gi, ti: (gi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, 1, n_bins), jnp.int32),
        interpret=interpret,
    )(s3, w3)
    return out[:, 0]

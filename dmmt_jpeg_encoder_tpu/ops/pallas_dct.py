"""Pallas plane DCT: Arai butterflies + quantize + round on whole planes.

The XLA plane-layout Arai chain costs ~15 ms/4K: its [..., 8]-minor
intermediates and slice/stack boundaries dominate. This kernel runs the
same BIT-EXACT dataflow (reference: src/cosine_transform/arai.rs:29-104,
quantizer.rs:53-63) on [TILE_H, W] tiles with every operand full-width:

- The eight x-phases (and y-phases) are materialized as DENSE lane
  (sublane) rolls of the tile: a_j = roll(x, -j) holds x[.., 8k+j] at
  lane 8k, so the butterflies run on full [TILE_H, W] arrays; outputs are
  valid at lanes (rows) == 0 mod 8 and recombined with iota masks.
- Division by the quantization table uses a precomputed [8, W] pattern
  (q[v, u] broadcast to the plane layout), then round-half-away and an
  int16 cast — all in VMEM, zero HBM intermediates.

Output: int16 [H, W] in the SAME plane layout (v = row%8, u = lane%8);
the caller's existing transpose/zigzag/entangle tail converts to scan
blocks. Bit-identical to the jnp path (asserted in tests; f32 elementwise
ops do not depend on vectorization layout).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

TILE_H = 32  # rows per grid step (4 block rows)


def _dense_phases(x, axis):
    """a_j[pos] = x[pos + j] for j in 0..7 (circular; only pos == 0 mod 8
    entries are consumed)."""
    from jax.experimental.pallas import tpu as pltpu

    size = x.shape[axis]
    return tuple(
        x if j == 0 else pltpu.roll(x, size - j, axis=axis) for j in range(8)
    )


def _recombine(ys, idx_mod8, axis):
    """out[8k + u] = ys[u][8k]: roll each dense output right by u and mask
    to its phase lanes/rows."""
    from jax.experimental.pallas import tpu as pltpu

    out = jnp.where(idx_mod8 == 0, ys[0], 0.0)
    for u in range(1, 8):
        rolled = pltpu.roll(ys[u], u, axis=axis)
        out = out + jnp.where(idx_mod8 == u, rolled, 0.0)
    return out


def _plane_dct_kernel(x_ref, qpat_ref, o_ref):
    import jax.lax as lax

    from .dct import _arai_butterfly
    from .quantize import round_half_away_from_zero

    x = x_ref[:]
    th, w = x.shape
    lane = lax.broadcasted_iota(jnp.int32, (th, w), 1) & 7
    sub = lax.broadcasted_iota(jnp.int32, (th, w), 0) & 7

    # row pass (along x)
    r = _recombine(_arai_butterfly(_dense_phases(x, 1)), lane, 1)
    # column pass (along y) — tile rows are whole 8-row groups
    c = _recombine(_arai_butterfly(_dense_phases(r, 0)), sub, 0)

    scaled = c / qpat_ref[:]
    o_ref[:] = round_half_away_from_zero(scaled).astype(jnp.int16)


def plane_dct_quant(plane: jnp.ndarray, qtable: jnp.ndarray) -> jnp.ndarray:
    """[H, W] f32 plane (H, W multiples of 8) -> int16 [H, W] quantized
    DCT coefficients in plane layout (v = row%8, u = lane%8)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    hh, ww = plane.shape
    h_pad = -(-hh // TILE_H) * TILE_H
    x = plane
    if h_pad != hh:
        x = jnp.pad(x, ((0, h_pad - hh), (0, 0)))

    q8 = qtable.astype(jnp.float32).reshape(8, 8)
    qpat = jnp.tile(q8, (TILE_H // 8, ww // 8))  # [TILE_H, W]

    out = pl.pallas_call(
        _plane_dct_kernel,
        grid=(h_pad // TILE_H,),
        in_specs=[
            pl.BlockSpec((TILE_H, ww), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, ww), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_H, ww), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_pad, ww), jnp.int16),
        interpret=interpret,
    )(x, qpat)
    return out[:hh]

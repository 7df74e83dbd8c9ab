"""Pallas small-table lookup: gather-free codeword table indexing.

XLA lowers `table[sym]` for millions of indices into a serialized TPU
gather (~8 ns/element — ~100 ms for a 4K image's AC coefficients). This
kernel instead sweeps the T table entries once per tile:

    out[i] = sum_s (sym[i] == s) * table[s]

each iteration a scalar SMEM read broadcast into a full-tile
compare+select on the VPU — no gather, no scatter, no cross-lane
reshapes (which Mosaic rejects). f32 accumulation is exact because
combined (code << 8 | len) entries are < 2^24.

For batched multi-image packing the tables have a leading per-image axis
and the grid walks (image, tile); the BlockSpec index_map streams each
image's own table slice into SMEM.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..utils.capability import pallas_capable

TILE_ROWS = 64  # x 128 lanes = 8192 lookups per grid step
LANES = 128


def _select_lookup(sym, tab_ref, t):
    """Gather-free lookup: fori over the T table entries, each a scalar SMEM
    read broadcast into a compare+select over the tile (pure VPU)."""
    import jax.lax as lax

    def body(s, acc):
        entry = tab_ref[0, s]  # scalar read at dynamic index (SMEM)
        return acc + jnp.where(sym == s, entry, 0.0)

    return lax.fori_loop(0, t, body, jnp.zeros(sym.shape, jnp.float32))


def _lookup_kernel(sym_ref, tab_ref, out_ref):
    out_ref[:] = _select_lookup(sym_ref[:], tab_ref, tab_ref.shape[-1])


def pallas_table_lookup(symbols: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """uint32-valued table lookup for int32 symbols of any shape.

    table: uint32 [T] with entries < 2^24 (combined code<<8|len words).
    Returns uint32, same shape as symbols. Falls back to XLA gather
    off-TPU (unless DMMT_PALLAS_INTERPRET forces the kernel in interpret
    mode for testing).
    """
    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    if not interpret and not pallas_capable():
        return table[symbols]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = symbols.shape
    flat = symbols.reshape(-1).astype(jnp.int32)
    t = table.shape[0]
    per_tile = TILE_ROWS * LANES
    n = flat.shape[0]
    n_pad = -(-n // per_tile) * per_tile
    if n_pad != n:
        flat = jnp.pad(flat, (0, n_pad - n))
    sym2 = flat.reshape(-1, LANES)
    tab_f = table.astype(jnp.float32).reshape(1, t)

    out = pl.pallas_call(
        _lookup_kernel,
        grid=(n_pad // per_tile,),
        in_specs=[
            pl.BlockSpec(
                (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, t), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(sym2.shape, jnp.float32),
        interpret=interpret,
    )(sym2, tab_f)
    return out.reshape(-1)[:n].astype(jnp.uint32).reshape(shape)


def _lookup_kernel_grouped(sym_ref, tab_ref, out_ref):
    """tab_ref holds ALL groups' tables [G, T] (SMEM, unblocked — a (1, T)
    block would violate Mosaic's sublane-divisibility rule); the group row
    is selected by grid position."""
    import jax.lax as lax
    from jax.experimental import pallas as pl

    g = pl.program_id(0)
    sym = sym_ref[0]
    t = tab_ref.shape[-1]

    def body(s, acc):
        entry = tab_ref[g, s]
        return acc + jnp.where(sym == s, entry, 0.0)

    out_ref[:] = lax.fori_loop(0, t, body, jnp.zeros(sym.shape, jnp.float32))[None]


def pallas_table_lookup_grouped(
    symbols: jnp.ndarray, tables: jnp.ndarray
) -> jnp.ndarray:
    """Per-group lookup: symbols [G, M] against tables [G, T] -> uint32 [G, M].

    The grid walks (group, tile); the BlockSpec index_map streams each
    group's own T-entry table into VMEM, so the one-hot width stays T even
    for large G (batched multi-image packing)."""
    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    g, m = symbols.shape
    t = tables.shape[1]
    if not interpret and not pallas_capable():
        flat_idx = symbols.astype(jnp.int32) + (
            jnp.arange(g, dtype=jnp.int32)[:, None] * t
        )
        return tables.reshape(-1)[flat_idx]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    per_tile = TILE_ROWS * LANES
    m_pad = -(-m // per_tile) * per_tile
    s = symbols.astype(jnp.int32)
    if m_pad != m:
        s = jnp.pad(s, ((0, 0), (0, m_pad - m)))
    s3 = s.reshape(g, -1, LANES)
    tab_f = tables.astype(jnp.float32)
    tiles = m_pad // per_tile

    out = pl.pallas_call(
        _lookup_kernel_grouped,
        grid=(g, tiles),
        in_specs=[
            pl.BlockSpec(
                (1, TILE_ROWS, LANES),
                lambda gi, ti: (gi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((g, t), lambda gi, ti: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_ROWS, LANES),
            lambda gi, ti: (gi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(s3.shape, jnp.float32),
        interpret=interpret,
    )(s3, tab_f)
    return out.reshape(g, -1)[:, :m].astype(jnp.uint32)

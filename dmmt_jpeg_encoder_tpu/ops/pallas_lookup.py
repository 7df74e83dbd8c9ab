"""Pallas small-table lookup: gather-free codeword table indexing.

XLA lowers `table[sym]` for millions of indices into a serialized TPU
gather (~8 ns/element — ~100 ms for a 4K image's AC coefficients). This
kernel instead computes the lookup as a one-hot matmul per tile:

    out[i] = sum_s (sym[i] == s) * table[s]      -- MXU dot, one pass

with the one-hot living only in VMEM. f32 accumulation is exact because
combined (code << 8 | len) entries are < 2^24.

For batched multi-image packing the table has a leading per-image axis and
the grid walks (image, tile); the BlockSpec index_map streams each image's
own table slice into VMEM.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

TILE_ROWS = 16  # x 128 lanes = 2048 lookups per grid step
LANES = 128


def _lookup_kernel(sym_ref, tab_ref, out_ref):
    import jax.lax as lax

    sym = sym_ref[:]  # [TILE_ROWS, LANES] int32
    tab = tab_ref[:]  # [1, T] f32
    t = tab.shape[-1]
    flat = sym.reshape(-1, 1)  # [R, 1]
    ids = lax.broadcasted_iota(jnp.int32, (1, t), 1)
    onehot = (flat == ids).astype(jnp.float32)  # [R, T] VMEM only
    vals = jnp.dot(onehot, tab.reshape(t, 1), preferred_element_type=jnp.float32)
    out_ref[:] = vals.reshape(sym.shape)


def pallas_table_lookup(symbols: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """uint32-valued table lookup for int32 symbols of any shape.

    table: uint32 [T] with entries < 2^24 (combined code<<8|len words).
    Returns uint32, same shape as symbols. Falls back to XLA gather
    off-TPU (unless DMMT_PALLAS_INTERPRET forces the kernel in interpret
    mode for testing).
    """
    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    if jax.default_backend() != "tpu" and not interpret:
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
            pl.BlockSpec((1, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(sym2.shape, jnp.float32),
        interpret=interpret,
    )(sym2, tab_f)
    return out.reshape(-1)[:n].astype(jnp.uint32).reshape(shape)


def _lookup_kernel_grouped(sym_ref, tab_ref, out_ref):
    import jax.lax as lax

    sym = sym_ref[0]  # [TILE_ROWS, LANES]
    tab = tab_ref[:]  # [1, T]
    t = tab.shape[-1]
    flat = sym.reshape(-1, 1)
    ids = lax.broadcasted_iota(jnp.int32, (1, t), 1)
    onehot = (flat == ids).astype(jnp.float32)
    vals = jnp.dot(onehot, tab.reshape(t, 1), preferred_element_type=jnp.float32)
    out_ref[:] = vals.reshape((1,) + sym.shape)


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
    if jax.default_backend() != "tpu" and not interpret:
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
            pl.BlockSpec((1, t), lambda gi, ti: (gi, 0), memory_space=pltpu.VMEM),
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

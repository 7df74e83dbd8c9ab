"""Pallas-fused DCT + quantize + zigzag (the DCTVariant.FUSED path).

The reference runs Arai butterflies per 8x8 block on a thread pool, then a
separate quantize pass, then a zigzag reorder (reference:
src/cosine_transform/arai.rs, src/...transformer/quantizer.rs,
frequency_block.rs). On TPU all three collapse into ONE constant matrix:

    vec(C X C^T) = (C (x) C) vec(X)        -- Kronecker identity

so for flattened blocks X [N, 64],

    out_zz[n, j] = round( X[n, :] @ M[:, j] ),
    M[i, j] = (C (x) C)[i, ZZ[j]] / q[ZZ[j]]

i.e. the 2-D DCT *is* a 64x64 matmul whose columns are pre-permuted into
zigzag order and pre-scaled by the quantization table. One MXU-shaped
matmul per tile of blocks, with the half-away-from-zero rounding and int
cast fused in VMEM — zero intermediate HBM traffic between DCT, quantizer,
and reorder.

The Pallas kernel tiles N into TILE-block chunks with the 64x64 matrix
resident in VMEM. On non-TPU backends the same math runs as a plain XLA
einsum (`fused_reference`), which is also the correctness oracle in tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..tables import ZIGZAG
from .dct import dct_matrix
from .quantize import round_half_away_from_zero as _round_half_away

TILE = 512


def _kron_dct64() -> np.ndarray:
    """K[i, r]: contribution of flat input sample i to flat DCT coeff r."""
    c = dct_matrix().astype(np.float64)  # [k, n]
    k = np.zeros((64, 64))
    for u in range(8):
        for v in range(8):
            r = u * 8 + v
            for aa in range(8):
                for bb in range(8):
                    k[aa * 8 + bb, r] = c[u, aa] * c[v, bb]
    return k


_K64 = _kron_dct64()


def fused_matrix(qtable_raster: jnp.ndarray) -> jnp.ndarray:
    """M [64, 64] f32: DCT x zigzag x (1/q) folded into one matrix."""
    k = jnp.asarray(_K64[:, ZIGZAG].astype(np.float32))  # [64 in, 64 zz]
    q = qtable_raster.astype(jnp.float32)[ZIGZAG]
    return k / q[None, :]


def fused_reference(blocks: jnp.ndarray, qtable_raster: jnp.ndarray) -> jnp.ndarray:
    """XLA fallback / oracle: same matmul without the explicit kernel."""
    n = blocks.shape[0]
    m = fused_matrix(qtable_raster)
    y = jnp.dot(
        blocks.reshape(n, 64), m, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return _round_half_away(y).astype(jnp.int16)


def _tile_kernel(x_ref, m_ref, o_ref):
    y = jnp.dot(x_ref[:], m_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = _round_half_away(y).astype(jnp.int32)


def fused_dct_quantize_zigzag(
    blocks: jnp.ndarray, qtable_raster: jnp.ndarray
) -> jnp.ndarray:
    """[N, 8, 8] f32 blocks + uint8[64] raster table -> int16 [N, 64] zigzag.

    Drop-in replacement for dct2d(...) + quantize_zigzag(...)."""
    import os

    from ..utils.capability import pallas_capable

    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    if not interpret and not pallas_capable():
        return fused_reference(blocks, qtable_raster)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = blocks.shape[0]
    x = blocks.reshape(n, 64)
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    m = fused_matrix(qtable_raster)

    out = pl.pallas_call(
        _tile_kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, 64), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 64), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * 64 * 64,
            bytes_accessed=n_pad * 64 * 4 * 2 + 64 * 64 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, m)
    return out[:n].astype(jnp.int16)

"""Fused AC-structure + histogram Pallas kernel.

The XLA histogram path costs ~2.6 ms/4K: the zero-run structure
(associative-scan max over 8M lanes, several elementwise passes) and the
nibble one-hot einsum each stream multi-hundred-MB intermediates through
HBM. This kernel computes the run/category STRUCTURE (reference
semantics: src/...transformer/categorize.rs:132-151) and the joint
symbol counts in one pass over the int16 blocks with zero HBM
intermediates.

The formulation PERF.md round 2 said was missing: Mosaic cannot reshape
a [T, 128] tile into the [M, 16] one-hot operand a bin matmul needs.
Instead, for every 8-row group of the tile build

    P[H*8 + j, c] = w[j, c] * (hi[j, c] == H)     (16 stacked copies)
    Q[L*8 + j, c] =            (lo[j, c] == L)

— pure full-lane VPU compares — and take ONE 128x128 MXU product
R_g = P @ Q^T. Then R_g[H*8+j, L*8+j'] sums w over elements with
(hi=H in row j, lo=L in row j'), and the joint count is the j-DIAGONAL
sum. Extraction is LINEAR, so the kernel just accumulates R = sum_g R_g
(int32, exact) and the [16,16] diagonal reduction happens once on 128x128
numbers in XLA afterwards. Per 8x128 elements: ~6 VPU compare/select
passes + one MXU matmul, instead of XLA's materialized [N,16] one-hots.

Counts are bf16-exact: P entries are 0/weight (0/1), Q entries 0/1, and
the MXU accumulates in f32; per-tile sums stay far below 2^24 and
cross-tile accumulation is int32.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

_I32 = jnp.int32

TILE_ROWS = 256  # 512 blocks per grid step


def _kernel(x_ref, nvalid_ref, r_ref, aux_ref):
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        r_ref[:] = jnp.zeros_like(r_ref)
        aux_ref[:] = jnp.zeros_like(aux_ref)

    rows = x_ref.shape[0]
    v = x_ref[:].astype(_I32)
    lane = lax.broadcasted_iota(_I32, (rows, 128), 1)
    sub = lax.broadcasted_iota(_I32, (rows, 128), 0)
    half_pos = lane & 63

    # Block validity: block index = 2*global_row + (lane >= 64).
    blk = (t * TILE_ROWS + sub) * 2 + (lane >> 6)
    wvalid = (blk < nvalid_ref[0]).astype(_I32)

    # Zero-run structure within each 64-lane half (categorize.rs:132-151).
    nz = jnp.where((v != 0) & (half_pos > 0), 1, 0) * wvalid
    nzpos = jnp.where(nz > 0, half_pos, 0)
    shifted = jnp.where(half_pos >= 1, pltpu.roll(nzpos, 1, axis=1), 0)
    s = 1
    while s < 64:  # inclusive running max within the half
        rolled = pltpu.roll(shifted, s, axis=1)
        shifted = jnp.where(half_pos >= s, jnp.maximum(shifted, rolled), shifted)
        s <<= 1
    run = half_pos - shifted - 1
    a = jnp.abs(v)
    fbits = lax.bitcast_convert_type(a.astype(jnp.float32), _I32)
    cat = jnp.where(a > 0, (fbits >> 23) - 126, 0)
    hi = jnp.where(nz > 0, run & 15, 0)
    lo = jnp.where(nz > 0, cat, 0)
    w_ac = nz  # DC lanes and invalid blocks excluded

    # Joint (hi, lo) counts: one MXU product per 8-row group, deferred
    # j-diagonal (see module docstring).
    h_idx = lax.broadcasted_iota(_I32, (128, 128), 0) >> 3
    r_acc = jnp.zeros((128, 128), jnp.float32)
    for g in range(rows // 8):
        sl = slice(g * 8, (g + 1) * 8)
        hi8 = jnp.concatenate([hi[sl]] * 16, axis=0)
        lo8 = jnp.concatenate([lo[sl]] * 16, axis=0)
        w8 = jnp.concatenate([w_ac[sl]] * 16, axis=0)
        p = jnp.where(hi8 == h_idx, w8, 0).astype(jnp.bfloat16)
        q = jnp.where(lo8 == h_idx, 1, 0).astype(jnp.bfloat16)
        r_acc = r_acc + jax.lax.dot_general(
            p, q,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    r_ref[:] = r_ref[:] + r_acc.astype(_I32)

    # DC categories (2 lanes/row): 16-bin masked sweep.
    w_dc = jnp.where(half_pos == 0, wvalid, 0)
    dc_bins = lax.broadcasted_iota(_I32, (1, 128), 1)
    dc_acc = jnp.zeros((1, 128), jnp.float32)
    for b in range(16):
        cnt = jnp.sum(jnp.where((cat == b) & (w_dc > 0), 1.0, 0.0))
        dc_acc = dc_acc + jnp.where(dc_bins == b, cnt, 0.0)
    # ZRL emissions and EOBs (categorize.rs:132-151: runs > 15 split into
    # floor(run/16) ZRLs; trailing zeros emit one EOB).
    zrl_total = jnp.sum(jnp.where(nz > 0, run >> 4, 0).astype(jnp.float32))
    # EOB per half: the block's last nonzero position < 63.
    left = jnp.where(lane < 64, nzpos, 0)
    right = jnp.where(lane >= 64, nzpos, 0)
    last0 = jnp.max(left, axis=1, keepdims=True)
    last1 = jnp.max(right, axis=1, keepdims=True)
    bval0 = ((t * TILE_ROWS + sub[:, :1]) * 2 < nvalid_ref[0]).astype(
        jnp.float32
    )
    bval1 = ((t * TILE_ROWS + sub[:, :1]) * 2 + 1 < nvalid_ref[0]).astype(
        jnp.float32
    )
    eob_total = jnp.sum(
        jnp.where(last0 < 63, bval0, 0.0)
    ) + jnp.sum(jnp.where(last1 < 63, bval1, 0.0))
    aux = dc_acc + jnp.where(dc_bins == 16, zrl_total, 0.0) + jnp.where(
        dc_bins == 17, eob_total, 0.0
    )
    aux_ref[:] = aux_ref[:] + aux.astype(_I32)


@lru_cache(maxsize=16)
def _compiled(n2_rows: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = n2_rows // TILE_ROWS
    return pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (TILE_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((128, 128), _I32),
            jax.ShapeDtypeStruct((1, 128), _I32),
        ),
        interpret=interpret,
    )


def fused_block_histograms(
    coeffs_zz: jnp.ndarray, n_valid=None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(dc_hist[16], ac_hist[256]) for int16/int32 [N, 64] zigzag blocks
    (DC already DPCM'd). n_valid: optional scalar count of valid PREFIX
    blocks (sharded alignment masking); defaults to all N.

    Drop-in replacement for entropy.categorize.symbol_histograms when the
    valid blocks form a prefix (always true in this encoder: alignment
    padding is a suffix in entangled order)."""
    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    n = int(coeffs_zz.shape[0])
    if n_valid is None:
        n_valid = jnp.int32(n)
    x = coeffs_zz.astype(jnp.int16).reshape(-1)
    n2 = -(-n // 2)
    n2_pad = -(-n2 // TILE_ROWS) * TILE_ROWS
    if n2_pad * 128 != x.shape[0]:
        x = jnp.pad(x, (0, n2_pad * 128 - x.shape[0]))
    x2 = x.reshape(n2_pad, 128)
    r, aux = _compiled(n2_pad, interpret)(
        x2, jnp.asarray(n_valid, _I32).reshape(1)
    )
    # j-diagonal extraction: ac[H, L] = sum_j R[H*8+j, L*8+j].
    t = r.reshape(16, 8, 16, 8)
    ac = jnp.einsum("hjlj->hl", t).reshape(256)
    ac = ac.at[0xF0].add(aux[0, 16])
    ac = ac.at[0x00].add(aux[0, 17])
    dc = aux[0, :16]
    return dc.astype(jnp.int32), ac.astype(jnp.int32)

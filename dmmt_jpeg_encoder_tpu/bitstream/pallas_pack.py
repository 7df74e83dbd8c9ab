"""Pallas bitstream assembly: the entropy scan packed entirely on-chip.

Replaces the XLA scatter in pack_to_words (which serializes to ~10 ns per
emission — hundreds of ms per 4K image) with two kernels that exploit the
stream's structure:

STAGE 1 — fragment build (`_fragment_kernel`): every block's <=68 emissions
are placed into a private 72-word fragment, PRE-SHIFTED by the block's
global bit phase (boff & 31). Placement is a lane-iota compare: emission e
contributes to fragment words o_e and o_e+1, so

    frag[:, r] += (o_e == r) * c0_e + (o_e + 1 == r) * c1_e

is two vectorized selects per emission — no scatter, all VPU.

STAGE 2 — monotone merge (`_merge_kernel`): fragments land in the output
stream at NONDECREASING word offsets (the bit-offset prefix scan is
monotone), so a sequential walk with a VMEM staging window suffices:
each block's 256-lane row is rotated to its lane phase (`pltpu.roll` with
a dynamic shift), split at the wrap point, and accumulated into two
dynamically-indexed staging rows. The staging block itself is the pallas
OUTPUT, placed at a per-tile row offset via a scalar-prefetch index_map;
an 8-row carry scratch hands the unfinished boundary rows to the next
tile. Bit-disjointness makes every add an OR.

Everything here is uint32 exact — no f32 anywhere.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

# Blocks per stage-1 grid step (small: the placement loop unrolls 68x and
# Mosaic charges its temporaries against scoped VMEM).
TILE_FRAG = 256
# Blocks per stage-2 grid step.
TILE_MERGE = 1024
# Words per staging row (2 x 128 lanes).
ROW_WORDS = 256
# Staging rows: worst case a block emits 2048 bits = 64 words -> a tile
# advances at most TILE_MERGE*64/ROW_WORDS rows; +32 covers the 8-row base
# alignment slop, the 16-row carry window, and the aligned-write overhang.
R_LOC = TILE_MERGE * 64 // ROW_WORDS + 32
FRAG_WORDS = 72  # 64 words max block + 1 boundary + padding to a clean size
N_SLOTS = 68


def _fragment_kernel(values_ref, lens_ref, offs_ref, shift_ref, out_ref):
    # Word contributions for ALL emissions first (one pass of full-tile
    # vector ops), then the placement loop only slices them — keeps the
    # unrolled loop's live set tiny so Mosaic's scoped-VMEM stack stays small.
    val = values_ref[:]  # [T, 128] (emissions in lanes 0..67)
    ln = lens_ref[:]
    off = offs_ref[:] + shift_ref[:]  # global bit phase folded in
    b0 = off & 31
    end = b0 + ln
    o_all = off >> 5
    spill = jnp.maximum(end - 32, 0)
    keep = jnp.maximum(32 - end, 0)
    c0_all = jnp.where(ln > 0, (val >> spill) << keep, 0).astype(jnp.uint32)
    c1_all = jnp.where(spill > 0, val << (32 - spill), 0).astype(jnp.uint32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, FRAG_WORDS), 1)
    frag = jnp.zeros((val.shape[0], FRAG_WORDS), jnp.uint32)
    for e in range(N_SLOTS):
        o = o_all[:, e : e + 1]
        frag = frag + jnp.where(lane == o, c0_all[:, e : e + 1], 0).astype(jnp.uint32)
        frag = frag + jnp.where(lane == o + 1, c1_all[:, e : e + 1], 0).astype(jnp.uint32)
    out_ref[:] = frag


def _merge_kernel(r0_ref, q_ref, sf_ref, out_ref, staging, carry, sem):
    """Sequential monotone merge. All dynamic sublane offsets are kept
    8-aligned (Mosaic requirement); rows are selected/placed within aligned
    windows by sublane-iota masks. The staging window is DMA'd to the HBM
    output at the tile's (8-aligned) base row; a 16-row carry hands the
    unfinished boundary to the next tile."""
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    base_row = pl.multiple_of(r0_ref[t], 8)  # tile bases are 8-aligned
    staging[:] = jnp.zeros_like(staging)

    @pl.when(t > 0)
    def _():
        staging[0:16, :] = carry[:]

    lane = lax.broadcasted_iota(jnp.int32, (1, ROW_WORDS), 1)
    sub8 = lax.broadcasted_iota(jnp.int32, (8, ROW_WORDS), 0)
    sub16 = lax.broadcasted_iota(jnp.int32, (16, ROW_WORDS), 0)

    def body(i, _):
        q = q_ref[i]  # global word offset of block i's fragment
        i8 = pl.multiple_of((i // 8) * 8, 8)
        v8 = sf_ref[pl.ds(i8, 8), :]  # aligned 8-row window
        # row-select via masked sum; int32 view (unsigned reductions are
        # unimplemented in Mosaic; exactly one row is nonzero so the sum is
        # a bit-exact select)
        v8i = lax.bitcast_convert_type(v8, jnp.int32)
        vi = jnp.sum(jnp.where(sub8 == i - i8, v8i, 0), axis=0, keepdims=True)
        v = lax.bitcast_convert_type(vi, jnp.uint32)  # [1, ROW_WORDS]

        l0 = q & (ROW_WORDS - 1)
        rolled = pltpu.roll(v, l0, axis=1)
        part_a = jnp.where(lane >= l0, rolled, 0).astype(jnp.uint32)
        part_b = rolled - part_a  # wrapped lanes -> next row

        r = (q >> 8) - base_row
        r8 = pl.multiple_of((r // 8) * 8, 8)
        rr = r - r8
        contrib = (
            jnp.where(sub16 == rr, part_a, 0)
            + jnp.where(sub16 == rr + 1, part_b, 0)
        ).astype(jnp.uint32)
        staging[pl.ds(r8, 16), :] += contrib
        return 0

    lax.fori_loop(0, sf_ref.shape[0], body, 0)

    dma = pltpu.make_async_copy(
        staging, out_ref.at[pl.ds(base_row, R_LOC), :], sem
    )
    dma.start()
    dma.wait()
    d_r = pl.multiple_of(r0_ref[t + 1] - base_row, 8)
    carry[:] = staging[pl.ds(d_r, 16), :]


def pallas_pack_words(
    values: jnp.ndarray,
    lens: jnp.ndarray,
    offs: jnp.ndarray,
    block_bits: jnp.ndarray,
    n_words: int,
    boff: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """uint32 word stream from per-block emissions, all on-chip.

    Same contract as device_pack.pack_to_words. `boff` overrides the
    exclusive bit-offset scan (must be nondecreasing) — the batched packer
    passes offsets with word-aligned per-image bases. Requires a TPU
    backend (or DMMT_PALLAS_INTERPRET); callers keep the scatter path as
    fallback.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    n = values.shape[0]
    if boff is None:
        boff = jnp.cumsum(block_bits) - block_bits  # exclusive, monotone
    total_bits = boff[-1] + block_bits[-1]

    # ---- stage 1: per-block pre-shifted fragments -----------------------
    n1 = -(-n // TILE_FRAG) * TILE_FRAG
    pad1 = n1 - n

    def pad_rows(x, rows, value=0):
        return jnp.pad(x, ((0, rows), (0, 0)), constant_values=value) if rows else x

    # emissions lanes padded to 128 for clean tiling
    val_p = pad_rows(jnp.pad(values.astype(jnp.uint32), ((0, 0), (0, 128 - N_SLOTS))), pad1)
    len_p = pad_rows(jnp.pad(lens.astype(jnp.int32), ((0, 0), (0, 128 - N_SLOTS))), pad1)
    off_p = pad_rows(jnp.pad(offs.astype(jnp.int32), ((0, 0), (0, 128 - N_SLOTS))), pad1)
    shift = (boff & 31).astype(jnp.int32)[:, None]
    shift_p = pad_rows(shift, pad1)

    frags = pl.pallas_call(
        _fragment_kernel,
        grid=(n1 // TILE_FRAG,),
        in_specs=[
            pl.BlockSpec((TILE_FRAG, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_FRAG, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_FRAG, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_FRAG, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_FRAG, FRAG_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n1, FRAG_WORDS), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(val_p, len_p, off_p, shift_p)

    # ---- stage 2: monotone merge ---------------------------------------
    n2 = -(-n // TILE_MERGE) * TILE_MERGE
    pad2 = n2 - n
    q = (boff >> 5).astype(jnp.int32)
    if pad2:
        # keep offsets monotone: padding blocks sit at the final offset
        q = jnp.concatenate([q, jnp.broadcast_to(q[-1], (pad2,))])
    sf = jnp.pad(frags[:n], ((0, pad2), (0, ROW_WORDS - FRAG_WORDS)))

    n_tiles = n2 // TILE_MERGE
    starts = jnp.arange(n_tiles, dtype=jnp.int32) * TILE_MERGE
    r0 = ((q[starts] >> 8) & ~7).astype(jnp.int32)  # 8-aligned tile base rows
    r0 = jnp.concatenate([r0, r0[-1:]])  # r0[t+1] read on the last tile

    r_out = n_words // ROW_WORDS
    words2d = pl.pallas_call(
        _merge_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (n_tiles + 1,), lambda t: (0,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((TILE_MERGE,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (TILE_MERGE, ROW_WORDS), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((r_out, ROW_WORDS), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((R_LOC, ROW_WORDS), jnp.uint32),
            pltpu.VMEM((16, ROW_WORDS), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(r0, q, sf)
    return words2d.reshape(-1), total_bits


def pack_words_capacity(needed_words: int) -> int:
    """Bucketed output capacity: room for the merge's staging overhang, in
    ROW_WORDS units, rounded to a power of two for executable reuse."""
    base = needed_words + (R_LOC + 2) * ROW_WORDS
    return 1 << max(16, base.bit_length())

"""One-kernel entropy-scan packing: coefficients -> bitstream words on-chip.

Replaces the three-stage device packer (block_emissions in XLA ->
fragment kernel -> serial merge kernel, see device_pack.py/pallas_pack.py)
with ONE Pallas kernel that walks scan-order blocks tile by tile and
performs, entirely in VMEM:

1. EMIT — magnitude categories, AC zero-run structure (cumulative-max
   prefix scans via lane-roll doubling), Huffman code lookups (a sweep
   over only the symbols PRESENT in this image's tables, read from SMEM),
   per-block bit lengths, and the running global bit offset (carried
   across the sequential grid in SMEM — TPU grids execute in order).
2. FRAGMENT — each block half's AC emissions are first COMPACTED to
   nonzero-rank lanes (collision-free binary-doubling rolls: with
   distinct, monotone destinations every intermediate position stays
   ordered inside [rank, pos]), then each kernel row's TWO scan-adjacent
   blocks' emissions are placed contiguously into one private 128-word
   row fragment pre-shifted by the row's global bit phase (lane-iota
   compares, no scatter). Cross-lane reductions (ZRL slot owners, block
   bit totals) ride the MXU via a [128, 2] half-selector matmul.
3. MERGE — fragments lane-rolled to their word phase with VECTORIZED
   binary-digit shifts (static pltpu.roll + one per-row select per bit),
   then accumulated into output rows with byte-plane MXU matmuls: the
   block->row assignment matrix M[r, i] = (row(i) == r) turns the monotone
   scatter into M @ fragments. Bit-disjointness of the stream makes every
   add an OR, and per-byte sums stay < 256, so single-pass bf16 matmuls
   are bit-exact. The staging window byteswaps to stream order in VMEM
   and is DMA'd to HBM per tile with a 16-row carry to the next tile
   (same contract as pallas_pack's merge).

Both FRAGMENT and MERGE are TIERED on per-tile content guards: AC rank
slots beyond 12, ZRL slots (per slot index), and the full-height
selector matmul only run when some block in the tile needs them —
typical photographic tiles (p99 = 7 nonzeros per block) use the cheap
paths throughout.

This removes the [N,68] value/len/offset HBM intermediates (~160 MB of
traffic per 4K image) and the serial per-block merge walk (~10 ms/4K).

Semantics match the reference encoder's serial BitWriter scan
(reference: src/image/writer/jpeg/encoder.rs:264-404, binary_stream.rs,
categorize.rs) and are asserted byte-identical to the host packer and to
the legacy device path in tests.

Blocks are processed TWO per kernel row ([N/2, 128] layout) so every
vector op fills all 128 lanes; per-half masks keep the prefix scans from
leaking across the mid-row boundary.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

_U32 = jnp.uint32
_I32 = jnp.int32

# Kernel rows per grid step (= 2x blocks). 256 measured best at round-2
# mid-state (512/128 were 44.0/41.4 vs 40.6); env knob for re-A/Bs as the
# per-tile op mix changes.
TILE_ROWS = int(os.environ.get("DMMT_TILE_ROWS", "256"))
# Output row width (words). Narrower rows shrink the variable-roll span
# (roll amount < ROW_WORDS => 7 digit-roll iterations on [T, 256] instead
# of 8 on [T, 384]) at the cost of more selector-matmul rows; 128
# measured ~0.3 ms/4K faster than 256.
ROW_WORDS = int(os.environ.get("DMMT_ROW_WORDS", "128"))
# Timing-only ablations (bytes become WRONG; bit lengths stay live so the
# sequential state carry is untouched): "noac" skips AC placement, "k4"
# clamps the AC sweep, "noroll" skips the variable roll, "nomerge" skips
# the merge matmuls. Never set outside perf attribution jobs.
_ABLATE = os.environ.get("DMMT_PACK_ABLATE", "")
# Per-ROW fragment: BOTH blocks of a kernel row are adjacent in the scan
# stream, so they share one contiguous fragment (phase <=31 bits + two
# worst-case ~1681-bit blocks = ~3393 bits = 107 words; odd-block bit
# adjustments must keep the pair under this capacity). One fragment per
# row means ONE variable roll + ONE merge matmul per tile instead of two.
FRAG_WORDS = 128
# Fragment after lane roll: 128 + (ROW_WORDS - 1) rounded up to lanes.
FRAG_WIDE = FRAG_WORDS + ROW_WORDS
# Staging rows per tile: worst case 512 blocks x 64 words = 32768 words,
# + 8 alignment slop + fold/spill rows; + 16 carry window.
R_MM = (TILE_ROWS * 128) // ROW_WORDS + 16
R_LOC = R_MM + 16


# --------------------------------------------------------------------------
# Host-side sweep-table construction
# --------------------------------------------------------------------------


def build_sweep_tables(
    ldc: tuple, lac: tuple, cdc: tuple | None, cac: tuple | None
) -> tuple[np.ndarray, ...]:
    """Present-symbol sweep tables from flat (codes, lens) arrays.

    The in-kernel lookup sweeps table entries one SMEM scalar at a time;
    sweeping only the symbols with a codeword (the tables are built from
    this image's own histograms, so every symbol the data emits is
    present) cuts the sweep from 256 iterations to typically 30-120.
    Returns (dc_syms, dc_l, dc_c, ac_syms, ac_l, ac_c, misc) int32 arrays;
    sym lists are padded to a power-of-two bucket with -1 (matches no
    category/symbol). misc = [zrl_l, zrl_c, eob_l, eob_c] combined entries.
    entry = code << 8 | len (< 2^24).
    """

    def comb(flat, n):
        codes = np.asarray(flat[0], np.int64)[:n]
        lens = np.asarray(flat[1], np.int64)[:n]
        return ((codes << 8) | lens).astype(np.int32), lens > 0

    ldc_e, ldc_p = comb(ldc, 16)
    lac_e, lac_p = comb(lac, 256)
    if cdc is not None:
        cdc_e, cdc_p = comb(cdc, 16)
        cac_e, cac_p = comb(cac, 256)
    else:
        cdc_e, cdc_p = np.zeros(16, np.int32), np.zeros(16, bool)
        cac_e, cac_p = np.zeros(256, np.int32), np.zeros(256, bool)

    def union(n, pa, pb, ea, eb):
        syms = np.flatnonzero(pa | pb).astype(np.int32)
        k = max(8, 1 << int(max(0, len(syms) - 1)).bit_length())
        out_s = np.full(k, -1, np.int32)
        out_a = np.zeros(k, np.int32)
        out_b = np.zeros(k, np.int32)
        out_s[: len(syms)] = syms
        out_a[: len(syms)] = ea[syms]
        out_b[: len(syms)] = eb[syms]
        return out_s, out_a, out_b

    dc_syms, dc_l, dc_c = union(16, ldc_p, cdc_p, ldc_e, cdc_e)
    ac_syms, ac_l, ac_c = union(256, lac_p, cac_p, lac_e, cac_e)
    misc = np.array(
        [lac_e[0xF0], cac_e[0xF0], lac_e[0x00], cac_e[0x00]], np.int32
    )
    return dc_syms, dc_l, dc_c, ac_syms, ac_l, ac_c, misc


# --------------------------------------------------------------------------
# In-kernel helpers (pure jnp on refs' values; shared with interpret mode)
# --------------------------------------------------------------------------


def _lane_iota(rows, lanes):
    import jax.lax as lax

    return lax.broadcasted_iota(_I32, (rows, lanes), 1)


def _masked_cummax(x, lane, width=64):
    """Inclusive running max along lanes within each width-lane half."""
    from jax.experimental.pallas import tpu as pltpu

    half_pos = lane & (width - 1)
    s = 1
    while s < width:
        rolled = pltpu.roll(x, s, axis=1)
        x = jnp.where(half_pos >= s, jnp.maximum(x, rolled), x)
        s <<= 1
    return x


def _masked_cumsum(x, lane, width=64):
    """Inclusive running sum along lanes within each width-lane half."""
    from jax.experimental.pallas import tpu as pltpu

    half_pos = lane & (width - 1)
    s = 1
    while s < width:
        rolled = pltpu.roll(x, s, axis=1)
        x = x + jnp.where(half_pos >= s, rolled, 0)
        s <<= 1
    return x


def _row_cumsum_excl(x, rows):
    """Exclusive running sum over the sublane (row) axis of [rows, 1]."""
    import jax.lax as lax
    from jax.experimental.pallas import tpu as pltpu

    sub = lax.broadcasted_iota(_I32, (rows, 1), 0)
    inc = x
    s = 1
    while s < rows:
        rolled = pltpu.roll(inc, s, axis=0)
        inc = inc + jnp.where(sub >= s, rolled, 0)
        s <<= 1
    return inc - x


def _sweep_lookup(sym, ischroma, syms_ref, la_ref, ca_ref, k, row=0):
    """entry[sym] via a K-iteration sweep of SMEM scalars (no gather).
    ischroma: int32 0/1 (Mosaic can't produce bool vectors from selects).
    row: SMEM table row (slab mode passes the image index — Mosaic
    rejects sub-row SMEM block windows, so slab tables arrive whole).

    Round-2 note (kernel then ~35 ms): a two-tier variant measured no
    faster. Round 4's ablation attribution changed that calculus — the
    sweep is now the kernel's superlinear term at slab/8K scale (k grows
    with image area while tiles double; k4-clamp recovered 1.56 ms at
    4320 rows) — so the two-tier form returned as the opt-in
    _sweep_lookup_2tier below (DMMT_SWEEP=2tier)."""
    import jax.lax as lax

    def body(i, acc):
        s = syms_ref[row, i]
        e = jnp.where(ischroma > 0, ca_ref[row, i], la_ref[row, i])
        return acc | jnp.where(sym == s, e, 0)

    return lax.fori_loop(0, k, body, jnp.zeros(sym.shape, _I32))


def _sweep_lookup_2tier(sym, ischroma, syms_ref, la_ref, ca_ref, k, k_head,
                        row=0):
    """Two-tier sweep: tables arrive HOT-FIRST (ascending code length —
    huffman/device_tables.device_sweep_tables_freq), so the first k_head
    entries resolve nearly every live lane of a typical photographic
    tile. The tail's fori_loop bound is data-dependent: it collapses to
    zero iterations unless some live lane is still unresolved after the
    head (sym >= 0 with no entry ORed in — present-table entries are
    nonzero since len >= 1). Result is bit-identical to the full sweep
    for any table order (each lane matches at most one entry)."""
    import jax.lax as lax

    def body(i, acc):
        s = syms_ref[row, i]
        e = jnp.where(ischroma > 0, ca_ref[row, i], la_ref[row, i])
        return acc | jnp.where(sym == s, e, 0)

    head_k = jnp.minimum(jnp.asarray(k), k_head)
    acc = lax.fori_loop(0, head_k, body, jnp.zeros(sym.shape, _I32))
    unresolved = ((sym >= 0) & (acc == 0)).astype(_I32)
    need_tail = jnp.max(unresolved) > 0
    tail_k = jnp.where(need_tail, jnp.asarray(k), head_k)
    return lax.fori_loop(head_k, tail_k, body, acc)


def _pattern(v, cat):
    """JPEG magnitude bits (categorize.rs:45-74)."""
    return jnp.where(v >= 0, v, v + (1 << cat) - 1)


def _magnitude_category(v):
    """JPEG magnitude category = bit length of |v| = floor(log2|v|) + 1
    (0 for v == 0), read off the f32 exponent: int->f32 conversion is
    exact below 2^24, far above the int16 coefficient range, so the
    biased exponent of f32(|v|) is exactly 127 + floor(log2|v|). ~5
    vector ops instead of a 15-iteration compare-accumulate loop
    (measured: same speed on TPU — kept for the simpler program)."""
    import jax.lax as lax

    a = jnp.abs(v)
    bits = lax.bitcast_convert_type(a.astype(jnp.float32), _I32)
    return jnp.where(a > 0, (bits >> 23) - 126, 0)


def _var_roll_lanes(x, amount, width, max_amount):
    """Per-row variable lane roll via binary digit decomposition: static
    pltpu.roll + per-row selects only (Mosaic's roll shift must be scalar,
    so the per-row amount is applied bit by bit, vectorized across rows —
    one roll + one select per bit). amount: [rows, 1] int32 in
    [0, max_amount]."""
    from jax.experimental.pallas import tpu as pltpu

    scale = 1
    while scale <= max_amount:
        rolled = pltpu.roll(x, scale, axis=1)
        x = jnp.where((amount & scale) > 0, rolled, x)
        scale <<= 1
    return x


def _emit_both(v, cat, lane, ischroma, acsym_ref, acl_ref, acc_ref, k_ac,
               dc_ents, zrl_ents, eob_ents, k_head_2t=0, row=0):
    """Emission values/lens/offsets for BOTH 64-lane halves of the packed
    row in one pass.

    Everything lane-local — the zero-run structure, the AC present-symbol
    sweep (the kernel's single dominant cost), magnitude bits, and the
    in-block offset scans — is computed ONCE on the full [T, 128] arrays:
    the masked scans never cross the 64-lane boundary, and the per-half
    DC/ZRL table entries enter only as per-lane broadcasts. Only the
    cheap [T, 1] reductions (block totals, EOB, ZRL slots) run per half.

    v, cat, lane, ischroma: [T, 128] packed arrays; dc_ents/zrl_ents/
    eob_ents: ([T,1] half-0 entry, [T,1] half-1 entry).
    Returns [emis_half0, emis_half1], each ([T,1] dc pair, [T,63] ac
    arrays, zrl slots, eob info, block_bits [T,1]).
    """
    from jax.experimental.pallas import tpu as pltpu

    pos = (lane & 63)
    half_id = lane // 64

    # --- AC structure (categorize.rs:132-151 as scans), shared ----------
    nz = (v != 0) & (pos > 0)
    nzpos = jnp.where(nz, pos, 0)
    # previous nonzero position (exclusive): shift right one lane in-half
    shifted = jnp.where(pos >= 1, pltpu.roll(nzpos, 1, axis=1), 0)
    prev_nz = _masked_cummax(shifted, lane)
    run = pos - prev_nz - 1
    zrl = jnp.where(nz, run >> 4, 0)
    sym = ((run & 15) << 4) | cat
    if k_head_2t > 0:
        ac_ent = _sweep_lookup_2tier(
            jnp.where(nz, sym, -2), ischroma, acsym_ref, acl_ref, acc_ref,
            k_ac, k_head_2t, row=row,
        )
    else:
        ac_ent = _sweep_lookup(
            jnp.where(nz, sym, -2), ischroma, acsym_ref, acl_ref, acc_ref,
            k_ac, row=row,
        )
    accode = ac_ent >> 8
    aclen = ac_ent & 0xFF
    e_ac_val = jnp.where(nz, (accode << cat) | _pattern(v, cat), 0)
    e_ac_len = jnp.where(nz, aclen + cat, 0)

    # --- per-half DC entries (lane 0 / lane 64) -------------------------
    dc_vals, dc_lens = [], []
    for half in (0, 1):
        lo = 64 * half
        dccat = cat[:, lo : lo + 1]
        dcv = v[:, lo : lo + 1]
        dc_vals.append(((dc_ents[half] >> 8) << dccat) | _pattern(dcv, dccat))
        dc_lens.append((dc_ents[half] & 0xFF) + dccat)
    dc_len_lane = jnp.where(half_id == 0, dc_lens[0], dc_lens[1])
    zrl_len_lane = jnp.where(
        half_id == 0, zrl_ents[0] & 0xFF, zrl_ents[1] & 0xFF
    )

    # --- offsets within the block: ONE packed masked scan ---------------
    # Three running sums ride one cumsum with disjoint bit fields (no
    # carries cross: seg <= 74 sums to < 2^12 in [16,28); zrl <= 3 sums to
    # < 2^8 in [8,16); nz sums to < 2^7 in [0,8)). The nonzero-rank cumsum
    # (cumnz) feeds the rank compaction below.
    pre = zrl * zrl_len_lane
    seg = pre + e_ac_len
    nz01 = jnp.where(nz, 1, 0)
    packed3 = (seg << 16) | (zrl << 8) | nz01
    packed3 = _masked_cumsum(packed3, lane)
    seg_incl = packed3 >> 16
    cz = (packed3 >> 8) & 0xFF
    cumnz = packed3 & 0xFF
    cz_excl = cz - zrl
    start = dc_len_lane + (seg_incl - seg)
    e_ac_off = start + pre

    # --- cross-lane reductions ride the MXU ------------------------------
    # One [128, 2] half-selector matmul yields BOTH halves' lane sums at
    # once; every summed value is < 2^24 so f32 accumulation is exact.
    # This replaces ~14 log-tree lane reduces (each as expensive as a
    # full-width vector op) with a handful of selects + MXU issues.
    import jax.lax as lax

    si = lax.broadcasted_iota(_I32, (128, 2), 0)
    ci = lax.broadcasted_iota(_I32, (128, 2), 1)
    half_sel = jnp.where((si // 64) == ci, 1.0, 0.0).astype(jnp.float32)

    def half_sums(x_f32):
        return lax.dot_general(
            x_f32, half_sel, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(_I32)  # [T, 2]

    seg_f = seg.astype(jnp.float32)
    zrl_f = zrl.astype(jnp.float32)
    start_f = start.astype(jnp.float32)
    excl_f = cz_excl.astype(jnp.float32)
    ac_tot2 = half_sums(seg_f)
    totz2 = half_sums(zrl_f)
    slot_start2, slot_excl2 = [], []
    for i in range(3):
        hit = (cz > i) & (cz_excl <= i)  # i-th ZRL's owner lane (unique)
        slot_start2.append(half_sums(jnp.where(hit, start_f, 0.0)))
        slot_excl2.append(half_sums(jnp.where(hit, excl_f, 0.0)))

    # --- compact the AC emissions to nonzero-rank order -----------------
    # Placement cost is linear in the number of columns placed; in zigzag
    # order the last present column sits at p90 ~25 (up to 63) while
    # blocks rarely have more than ~12 NONZEROS. Move each present
    # emission LEFT to its rank lane (rank = in-half running nonzero
    # count) with binary-doubling rolls. This is collision-free: within a
    # half, destinations are distinct and monotone, so intermediate
    # positions p = pos - (d mod 2^k) stay strictly ordered inside
    # [rank, pos] for every live element, and dead lanes (len 0) never
    # move or get moved onto a live lane. (val, len) and (d, off) ride as
    # two packed i32 arrays so each step rolls only two vregs sets.
    d = jnp.where(nz, pos - cumnz, 0)
    # (val, len) pack as UNSIGNED 27+5 bits: val = (code << cat) | pattern
    # can reach 27 bits (16-bit codeword, category 11), so an i32 pack
    # would overflow into the sign bit and sign-extend on unpack.
    vl = (lax.bitcast_convert_type(e_ac_val, _U32) << 5) | (
        lax.bitcast_convert_type(e_ac_len, _U32)
    )
    od = (d << 12) | e_ac_off              # off < 2^12 (block < 1730 bits)
    u31 = jnp.uint32(31)
    for s in (1, 2, 4, 8, 16, 32):
        rvl = pltpu.roll(vl, 128 - s, axis=1)
        rod = pltpu.roll(od, 128 - s, axis=1)
        # u32 equality is safe on Mosaic; ordered unsigned compares may
        # not be — keep the liveness test as != 0
        cond = (((rod >> 12) & s) > 0) & ((rvl & u31) != 0)
        self_mov = ((od >> 12) & s) > 0
        vl = jnp.where(cond, rvl, jnp.where(self_mov, vl & ~u31, vl))
        od = jnp.where(cond, rod - (s << 12), od)
    e_ac_val = lax.bitcast_convert_type(vl >> jnp.uint32(5), _I32)
    e_ac_len = lax.bitcast_convert_type(vl & u31, _I32)
    e_ac_off = od & 0xFFF

    out = []
    for half in (0, 1):
        lo = 64 * half
        zrl_code = zrl_ents[half] >> 8
        zrl_len = zrl_ents[half] & 0xFF
        eob_code = eob_ents[half] >> 8
        eob_len = eob_ents[half] & 0xFF
        e_dc_len = dc_lens[half]
        # max nonzero pos = the in-half cummax at the half's last lane
        # (prev_nz lane 63 covers pos 0..62; fold in lane 63 itself)
        l63 = lo + 63
        last_nz = jnp.maximum(prev_nz[:, l63 : l63 + 1],
                              nzpos[:, l63 : l63 + 1])
        has_eob = last_nz < 63
        e_eob_len = jnp.where(has_eob, eob_len, 0)
        ac_total = ac_tot2[:, half : half + 1]
        e_eob_off = e_dc_len + ac_total
        block_bits = e_dc_len + ac_total + e_eob_len

        # --- the <=3 ZRL slots (MXU sums above; no take_along_axis) -----
        total_z = totz2[:, half : half + 1]
        zrl_slots = []
        for i in range(3):
            active = total_z > i
            start_ki = slot_start2[i][:, half : half + 1]
            excl_ki = slot_excl2[i][:, half : half + 1]
            off_i = start_ki + (i - excl_ki) * zrl_len
            len_i = jnp.where(active, zrl_len, 0)
            zrl_slots.append((zrl_code, len_i, off_i))

        # slice this half's 63 AC lanes to [T, 63]
        sl = lo + 1
        out.append((
            (dc_vals[half], dc_lens[half]),
            (e_ac_val[:, sl : sl + 63], e_ac_len[:, sl : sl + 63],
             e_ac_off[:, sl : sl + 63]),
            zrl_slots,
            (eob_code, e_eob_len, e_eob_off),
            block_bits,
        ))
    return out


def _prep_contrib(val, ln, off, shift):
    """Word-index + word contributions (c0 main, c1 spill) for emission
    columns — the vectorized prep shared by every placement tier. Done
    ONCE on the full-width emission arrays (ops on narrow column slices
    cost a full vreg each on Mosaic, so per-tier re-prep is pure waste)."""
    import jax.lax as lax

    zero_u = jnp.zeros((), _U32)
    off = off + shift
    b0 = off & 31
    end = b0 + ln
    spill_i = jnp.maximum(end - 32, 0)
    spill = lax.bitcast_convert_type(spill_i, _U32)
    keep = lax.bitcast_convert_type(jnp.maximum(32 - end, 0), _U32)
    uval = lax.bitcast_convert_type(val, _U32)
    c0 = jnp.where(ln > 0, (uval >> spill) << keep, zero_u)
    c1 = jnp.where(
        spill_i > 0,
        uval << lax.bitcast_convert_type(32 - spill_i, _U32),
        zero_u,
    )
    return off >> 5, c0, c1


def _place_cols(frag, prepped, cols, t_rows):
    """OR column range [cols) of a prepped (o, c0, c1) emission set into
    the [T, FRAG_WORDS] fragment via lane-iota compares."""
    lane_f = _lane_iota(t_rows, FRAG_WORDS)
    zero_u = jnp.zeros((), _U32)
    o, c0, c1 = prepped
    for e in cols:
        oe = o[:, e : e + 1]
        frag = frag | jnp.where(lane_f == oe, c0[:, e : e + 1], zero_u)
        frag = frag | jnp.where(lane_f == oe + 1, c1[:, e : e + 1], zero_u)
    return frag


# Base placement covers AC RANK slots [0, AC_BASE); [AC_BASE, 32) and
# [32, 63) run under per-tile guards. The emissions arrive compacted to
# nonzero-rank order (_emit_both), and measured per-block nonzero counts
# are p99=7 / max=12 for photographic content at spec quality — so 12
# covers whole tiles and the guards almost never fire.
AC_BASE = 12


def _place_row_fragment_tiered(frag_ref, emis_pair, shifts, t_rows):
    """Build the pre-shifted per-ROW fragments (both scan-adjacent blocks
    contiguously) in a VMEM scratch, TIERED: the DC, EOB, and first
    AC_BASE AC slots always place; the higher zigzag slots and the ZRL
    slots only when some block in the tile actually uses them (for
    photographic content at moderate quality almost all energy sits in
    the first coefficients, so typical tiles skip most placement ops).

    emis_pair/shifts: per-half emission tuples and in-fragment bit shifts
    (half 1's shift = half 0's phase + half 0's block bits)."""
    from jax.experimental import pallas as pl

    # one vector prep per half for each emission family
    ac_prep, misc_prep, zrl_prep = [], [], []
    for emis, shift in zip(emis_pair, shifts):
        (dc_val, dc_len), (ac_val, ac_len, ac_off), zrls, \
            (eob_code, eob_len, eob_off), _ = emis
        ac_prep.append(_prep_contrib(ac_val, ac_len, ac_off, shift))
        # DC (offset 0) and EOB share one 2-column prep
        mv = jnp.concatenate([dc_val, eob_code * jnp.ones_like(eob_len)], 1)
        ml = jnp.concatenate([dc_len, eob_len], axis=1)
        mo = jnp.concatenate([jnp.zeros_like(dc_len), eob_off], axis=1)
        misc_prep.append(_prep_contrib(mv, ml, mo, shift))
        zv = jnp.concatenate([c * jnp.ones_like(ln) for c, ln, _ in zrls], 1)
        zl = jnp.concatenate([ln for _, ln, _ in zrls], axis=1)
        zo = jnp.concatenate([off for _, _, off in zrls], axis=1)
        zrl_prep.append(_prep_contrib(zv, zl, zo, shift))

    base = jnp.zeros((t_rows, FRAG_WORDS), _U32)
    for h in range(2):
        base = _place_cols(base, misc_prep[h], range(2), t_rows)
        if _ABLATE != "noac":
            base = _place_cols(base, ac_prep[h], range(AC_BASE), t_rows)
    frag_ref[:] = base
    if _ABLATE == "noac":
        return

    def pairmax(f):
        return jnp.maximum(f(emis_pair[0]), f(emis_pair[1]))

    g_mid = pairmax(lambda e: jnp.max(e[1][1][:, AC_BASE:32])) > 0
    g32 = pairmax(lambda e: jnp.max(e[1][1][:, 32:])) > 0
    # ZRL tiers PER SLOT: ~96% of photographic tiles contain some block
    # with one ZRL, but blocks with two or three (>=32 consecutive zeros
    # before a nonzero, twice) are rare — slots 1-2 get their own guard.
    gz = pairmax(lambda e: jnp.max(e[2][0][1])) > 0
    gz12 = pairmax(lambda e: jnp.max(e[2][1][1])) > 0

    @pl.when(g_mid)
    def _():
        acc = frag_ref[:]
        for h in range(2):
            acc = _place_cols(acc, ac_prep[h], range(AC_BASE, 32), t_rows)
        frag_ref[:] = acc

    @pl.when(g32)
    def _():
        acc = frag_ref[:]
        for h in range(2):
            acc = _place_cols(acc, ac_prep[h], range(32, 63), t_rows)
        frag_ref[:] = acc

    @pl.when(gz)
    def _():
        acc = frag_ref[:]
        for h in range(2):
            acc = _place_cols(acc, zrl_prep[h], range(1), t_rows)
        frag_ref[:] = acc

    @pl.when(gz12)
    def _():
        acc = frag_ref[:]
        for h in range(2):
            acc = _place_cols(acc, zrl_prep[h], range(1, 3), t_rows)
        frag_ref[:] = acc


def _byte_plane_merge(m_bf, rolled, rows):
    """[rows, T] bf16 selector x [T, FRAG_WIDE] u32 words -> [rows,
    FRAG_WIDE] u32 via exact byte-plane matmuls (per-byte sums < 256 fit
    bf16/f32 exactly; bit-disjoint adds are ORs)."""
    import jax.lax as lax

    out = jnp.zeros((rows, FRAG_WIDE), _U32)
    for b in range(4):
        plane_i = lax.bitcast_convert_type((rolled >> (8 * b)) & 0xFF, _I32)
        plane = plane_i.astype(jnp.float32).astype(jnp.bfloat16)
        acc = jnp.dot(m_bf, plane, preferred_element_type=jnp.float32)
        acc_u = lax.bitcast_convert_type(acc.astype(_I32), _U32)
        out = out | (acc_u << (8 * b))
    return out


def _merge_into_staging(staging, frag, q_rel, t_rows):
    """Accumulate one half's fragments into the staging window, TIERED by
    the tile's output row span: typical tiles land in < 15 rows, so the
    block->row selector matmul runs at [16, T] instead of [R_MM, T]."""
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wide = jnp.pad(frag, ((0, 0), (0, FRAG_WIDE - FRAG_WORDS)))
    l = q_rel & (ROW_WORDS - 1)
    if _ABLATE == "noroll":
        rolled = wide
    else:
        rolled = _var_roll_lanes(wide, l, FRAG_WIDE, ROW_WORDS - 1)
    if _ABLATE == "nomerge":
        staging[0:16, :] = staging[0:16, :] | rolled[0:16, :ROW_WORDS]
        return

    r = (q_rel // ROW_WORDS).astype(jnp.float32)  # [T, 1]
    r_max = jnp.max(q_rel) // ROW_WORDS
    ei = lax.broadcasted_iota(_I32, (t_rows, t_rows), 0)
    ej = lax.broadcasted_iota(_I32, (t_rows, t_rows), 1)
    eye = jnp.where(ei == ej, 1.0, 0.0).astype(jnp.float32)
    r_lane = lax.dot_general(
        r, eye, (((0,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).astype(_I32)  # [1, T] (f32 iota/compare are Mosaic gaps; go via i32)

    spill_w = FRAG_WIDE - ROW_WORDS

    def accumulate(rows):
        sub = lax.broadcasted_iota(_I32, (rows, t_rows), 0)
        m_bf = jnp.where(sub == r_lane, 1.0, 0.0).astype(jnp.bfloat16)
        out = _byte_plane_merge(m_bf, rolled, rows)
        main = out[:, :ROW_WORDS]
        spill = out[:, ROW_WORDS:]
        spill_dn = pltpu.roll(spill, 1, axis=0)
        sub_s = lax.broadcasted_iota(_I32, (rows, spill_w), 0)
        spill_dn = jnp.where(sub_s >= 1, spill_dn, 0)
        staging[0:rows, :] = staging[0:rows, :] | main
        staging[0:rows, 0:spill_w] = staging[0:rows, 0:spill_w] | spill_dn

    @pl.when(r_max < 15)
    def _():
        accumulate(16)

    @pl.when(r_max >= 15)
    def _():
        accumulate(R_MM)


# --------------------------------------------------------------------------
# The kernel
# --------------------------------------------------------------------------


def _make_kernel(n_blocks, stride, luma_per_mcu, k_dc, k_ac, n2_rows, adj,
                 dyn_k=False, has_valid=False, slab=None):
    """Builds the kernel fn; static config baked in (block count for the
    valid mask, scan stride for the in-kernel luma/chroma pattern). With
    dyn_k, the sweep loop bounds come from an SMEM input at run time (the
    one-dispatch path: tables are built on device, so the present-symbol
    counts are data) while k_dc/k_ac remain the static array capacities.

    slab=(tiles_per_image, region_rows): SLAB mode — the grid is
    (B, tiles_per_image) and the kernel packs B independent same-geometry
    streams in ONE dispatch. Image b's stream lands in its own static
    output region (rows [b*region_rows, (b+1)*region_rows)); the bit/row
    state is LOCAL to each image (program_id(1) == 0 resets it, and the
    carry window is only loaded within an image), so each region's words
    are bit-identical to a standalone fused_pack_words run. Per-image
    sweep tables/k_dyn arrive via per-image SMEM block windows (the
    BlockSpec index maps select image b's row), so the kernel body is
    unchanged."""
    # DMMT_SWEEP=2tier: head-only AC sweep with data-dependent tail
    # (tables must arrive hot-first — the one-dispatch builders switch to
    # device_sweep_tables_freq under the same knob). Read at BUILD time;
    # programs are cached under trace_mode_key so toggles retrace.
    k_head_2t = (
        int(os.environ.get("DMMT_SWEEP_HEAD", "32"))
        if os.environ.get("DMMT_SWEEP", "1") == "2tier"
        else 0
    )

    def kernel(*refs):
        import jax.lax as lax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        refs = list(refs)
        blocks_ref = refs.pop(0)
        adj_ref = refs.pop(0) if adj else None
        valid_ref = refs.pop(0) if has_valid else None
        kdyn_ref = refs.pop(0) if dyn_k else None
        (dcsym, dcl, dcc, acsym, acl, acc, misc,
         out_ref, nbits_ref, staging, carry, state, sem, fragbuf) = refs
        if dyn_k and slab is not None:
            k_dc_rt = jnp.minimum(kdyn_ref[pl.program_id(0), 0], k_dc)
            k_ac_rt = jnp.minimum(kdyn_ref[pl.program_id(0), 1], k_ac)
        elif dyn_k:
            k_dc_rt = jnp.minimum(kdyn_ref[0, 0], k_dc)
            k_ac_rt = jnp.minimum(kdyn_ref[0, 1], k_ac)
        else:
            k_dc_rt, k_ac_rt = k_dc, k_ac
        if _ABLATE == "k4":
            k_ac_rt = jnp.minimum(jnp.asarray(k_ac_rt), 4)

        if slab is None:
            t = pl.program_id(0)
            row0 = 0
            img = 0  # SMEM tables have one row
        else:
            # grid (B, tiles_per_image), executed lexicographically (one
            # TensorCore): all of image 0's tiles, then image 1's, ...
            # SMEM tables arrive as FULL [B, k] arrays (Mosaic rejects
            # sub-row SMEM block windows) and are indexed by image here.
            t = pl.program_id(1)
            img = pl.program_id(0)
            row0 = img * slab[1]
        trows = TILE_ROWS

        @pl.when(t == 0)
        def _():
            state[0] = 0
            state[1] = 0

        bit_base = state[0]
        base_row = pl.multiple_of(state[1], 8)

        v = blocks_ref[:].astype(_I32)  # [T, 128] i16 in HBM, widened here
        lane = _lane_iota(trows, 128)
        sub = lax.broadcasted_iota(_I32, (trows, 1), 0)
        # global block index per half
        i_e = (t * trows + sub) * 2
        i_o = i_e + 1
        valid_e = i_e < n_blocks
        valid_o = i_o < n_blocks
        if valid_ref is not None:
            # caller-provided per-block validity (sharded alignment
            # padding: black pad blocks must emit nothing)
            va = valid_ref[:]
            valid_e = valid_e & (va[:, 0:1] > 0)
            valid_o = valid_o & (va[:, 1:2] > 0)
        # scan interleave pattern: Y...Y Cb Cr per MCU (block_fold_iterator).
        # int32 0/1 flags, not bool: Mosaic rejects bool-valued selects.
        ic_e = ((i_e % stride) >= luma_per_mcu).astype(_I32)
        ic_o = ((i_o % stride) >= luma_per_mcu).astype(_I32)
        ischroma = jnp.where((lane // 64) == 0, ic_e, ic_o)

        cat = _magnitude_category(v)

        def misc_pick(l_idx, c_idx, ic):
            return jnp.where(ic > 0, misc[img, c_idx], misc[img, l_idx])

        # DC lookup: ONE sweep over present DC categories on the [T, 2]
        # pair of DC lanes (a [T, 1] op costs the same vregs as [T, 2],
        # so sweeping the halves separately doubled the cost for nothing)
        dccat2 = jnp.concatenate([cat[:, 0:1], cat[:, 64:65]], axis=1)
        ic2 = jnp.concatenate([ic_e, ic_o], axis=1)
        dc2 = _sweep_lookup(dccat2, ic2, dcsym, dcl, dcc, k_dc_rt, row=img)
        dc_ents = [dc2[:, 0:1], dc2[:, 1:2]]
        zrl_ents, eob_ents = [], []
        for ic in (ic_e, ic_o):
            zrl_ents.append(misc_pick(0, 1, ic))
            eob_ents.append(misc_pick(2, 3, ic))
        halves = _emit_both(
            v, cat, lane, ischroma, acsym, acl, acc, k_ac_rt,
            dc_ents, zrl_ents, eob_ents, k_head_2t=k_head_2t, row=img,
        )

        bits_e = jnp.where(valid_e, halves[0][4], 0)
        bits_o = jnp.where(valid_o, halves[1][4], 0)
        if adj_ref is not None:
            a = adj_ref[:]
            adj_e = a[:, 0:1]
            adj_o = a[:, 1:2]
        else:
            adj_e = jnp.zeros_like(bits_e)
            adj_o = jnp.zeros_like(bits_o)

        # global bit offsets: carried base + in-tile exclusive row scan
        row_bits = bits_e + bits_o + adj_e + adj_o
        row_base = bit_base + _row_cumsum_excl(row_bits, trows)
        boff_e = row_base + adj_e
        tile_bits = jnp.sum(row_bits)

        staging[:] = jnp.zeros_like(staging)

        @pl.when(t > 0)
        def _():
            staging[0:16, :] = carry[:]

        # both blocks of a row share ONE contiguous fragment: half 0 at
        # the row's bit phase, half 1 immediately after its bits
        emis_pair = []
        for emis, valid in ((halves[0], valid_e), (halves[1], valid_o)):
            # invalid (padding) blocks: zero every emission length
            (dc_v, dc_l), (ac_v, ac_l, ac_o), zrls, (eb_c, eb_l, eb_o), _ = emis
            dc_l = jnp.where(valid, dc_l, 0)
            ac_l = jnp.where(valid, ac_l, 0)
            eb_l = jnp.where(valid, eb_l, 0)
            zrls = [(c, jnp.where(valid, ln, 0), o) for (c, ln, o) in zrls]
            emis_pair.append(((dc_v, dc_l), (ac_v, ac_l, ac_o), zrls,
                              (eb_c, eb_l, eb_o), None))
        shift_e = boff_e & 31
        shift_o = shift_e + bits_e + adj_o
        _place_row_fragment_tiered(fragbuf, emis_pair, (shift_e, shift_o),
                                   trows)
        q_rel = (boff_e >> 5) - base_row * ROW_WORDS
        _merge_into_staging(staging, fragbuf[:], q_rel, trows)

        new_bits = bit_base + tile_bits
        new_base = (new_bits // (32 * ROW_WORDS)) & ~7
        d_r = pl.multiple_of(new_base - base_row, 8)
        # carry rows hand off UNSWAPPED; the window then byteswaps to
        # big-endian IN VMEM so the output stream needs no whole-buffer
        # XLA byteswap pass (the buffer is worst-case sized — swapping
        # all of it cost ~67 MB of HBM traffic for a ~0.5 MB stream).
        # Every output row's FINAL writer is some tile's DMA, so rows a
        # later window rewrites are re-derived from the unswapped carry.
        carry[:] = staging[pl.ds(d_r, 16), :]
        s = staging[:]
        staging[:] = (
            (s << 24)
            | ((s & 0xFF00) << 8)
            | ((s >> 8) & 0xFF00)
            | (s >> 24)
        )

        # DMA the window out; hand the boundary to the next tile. The
        # inline wait is ~free (roll/merge/DMA ablate to ~0 ms of the
        # kernel); a double-buffered variant with a dynamic staging.at[par]
        # view showed no win and risks slow dynamic scratch addressing.
        dma = pltpu.make_async_copy(
            staging,
            out_ref.at[pl.ds(pl.multiple_of(row0 + base_row, 8), R_LOC), :],
            sem,
        )
        dma.start()
        dma.wait()

        state[0] = new_bits
        state[1] = new_base
        nbits_ref[0, img] = new_bits

    return kernel


def fused_pack_capacity(needed_words: int) -> int:
    """Bucketed output capacity (power of two) incl. the DMA window slop."""
    base = needed_words + (R_LOC + 2) * ROW_WORDS
    return 1 << max(16, int(base).bit_length())


def fused_pack_words(
    scan_blocks: jnp.ndarray,
    stride: int,
    luma_per_mcu: int,
    sweep: tuple,
    n_words: int,
    adj: jnp.ndarray | None = None,
    k_dyn: jnp.ndarray | None = None,
    valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scan-order zigzag blocks [N, 64] (int, DC already DPCM) -> packed
    u32 word stream + total bit count, one Pallas dispatch. Words are
    byteswapped to MEMORY (big-endian stream) order in-kernel — callers
    view the result as bytes directly, no byteswap_words pass needed.

    sweep: build_sweep_tables output (device or numpy arrays).
    adj: optional [N] int32 per-block bit adjustments added to the running
    offset BEFORE the block (word-aligning a following image). Odd-index
    adjustments must keep their block pair within the row-fragment
    capacity (adj < ~700 bits); even-index adjustments are unbounded.
    k_dyn: optional i32 [2] runtime (dc, ac) sweep lengths — pass when the
    sweep arrays are device-built with capacity padding.
    valid: optional i32/bool [N] per-block mask — invalid blocks emit no
    bits (sharded alignment padding).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    dc_syms, dc_l, dc_c, ac_syms, ac_l, ac_c, misc = sweep
    k_dc = int(dc_syms.shape[0])
    k_ac = int(ac_syms.shape[0])

    n = int(scan_blocks.shape[0])
    n2 = -(-n // 2)
    n2_pad = -(-n2 // TILE_ROWS) * TILE_ROWS
    # quantized coefficients (incl. DPCM'd DC) fit int16: feeding the
    # kernel i16 halves its HBM input traffic and skips the i32 upcast
    # materialization; the kernel widens in VMEM
    v = scan_blocks.astype(jnp.int16).reshape(-1)
    pad_elems = n2_pad * 128 - n * 64
    if pad_elems:
        v = jnp.pad(v, (0, pad_elems))
    v2 = v.reshape(n2_pad, 128)
    args = [v2]
    if adj is not None:
        a = adj.astype(_I32)
        if n2_pad * 2 - n:
            a = jnp.pad(a, (0, n2_pad * 2 - n))
        args.append(a.reshape(n2_pad, 2))
    if valid is not None:
        vv = valid.astype(_I32)
        if n2_pad * 2 - n:
            vv = jnp.pad(vv, (0, n2_pad * 2 - n))
        args.append(vv.reshape(n2_pad, 2))

    n_tiles = n2_pad // TILE_ROWS
    r_out = n_words // ROW_WORDS

    in_specs = [
        pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if adj is not None:
        in_specs.append(
            pl.BlockSpec((TILE_ROWS, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    if valid is not None:
        in_specs.append(
            pl.BlockSpec((TILE_ROWS, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    if k_dyn is not None:
        in_specs.append(
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(jnp.asarray(k_dyn).astype(_I32).reshape(1, 2))
    for k in (k_dc, k_dc, k_dc, k_ac, k_ac, k_ac, 4):
        in_specs.append(
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
    args += [
        jnp.asarray(x).reshape(1, -1)
        for x in (dc_syms, dc_l, dc_c, ac_syms, ac_l, ac_c, misc)
    ]

    kernel = _make_kernel(
        n, stride, luma_per_mcu, k_dc, k_ac, n2_pad, adj is not None,
        dyn_k=k_dyn is not None, has_valid=valid is not None,
    )
    words2d, nbits = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_out, ROW_WORDS), _U32),
            jax.ShapeDtypeStruct((1, 1), _I32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R_LOC, ROW_WORDS), _U32),
            pltpu.VMEM((16, ROW_WORDS), _U32),
            pltpu.SMEM((4,), _I32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((TILE_ROWS, FRAG_WORDS), _U32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return words2d.reshape(-1), nbits[0, 0]


def fused_pack_words_slab(
    scans: jnp.ndarray,
    stride: int,
    luma_per_mcu: int,
    sweep: tuple,
    n_words: int,
    k_dyn: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """B same-geometry scan streams -> B packed word streams in ONE
    kernel dispatch (VERDICT r4 #1: the B separate fused_pack_words
    invocations were the measured per-extra-image slab-program overhead —
    each pays its own grid prologue, sweep-table SMEM staging, and
    dispatch fixed cost).

    scans: [B, N, 64] int zigzag blocks (DC already DPCM, per-image
    independent chains). sweep: per-image-stacked sweep tables
    (dc_syms [B, Kdc], dc_l, dc_c, ac_syms [B, Kac], ac_l, ac_c,
    misc [B, 4]). k_dyn: i32 [B, 2] per-image (dc, ac) present counts.
    n_words: PER-IMAGE output capacity (fused_pack_capacity of one
    image). valid: optional [B, N] per-block mask.

    Each image is padded to a whole number of grid tiles so no tile
    straddles two images' tables; image b writes rows
    [b*region_rows, ...) of the output, bit-identical to a standalone
    pack. Returns (words u32 [B, n_words] in memory order,
    total_bits i32 [B])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    dc_syms, dc_l, dc_c, ac_syms, ac_l, ac_c, misc = sweep
    b = int(scans.shape[0])
    n = int(scans.shape[1])
    k_dc = int(dc_syms.shape[1])
    k_ac = int(ac_syms.shape[1])

    n2 = -(-n // 2)
    n2_pad = -(-n2 // TILE_ROWS) * TILE_ROWS
    tiles_per_image = n2_pad // TILE_ROWS
    v = scans.astype(jnp.int16).reshape(b, -1)
    pad_elems = n2_pad * 128 - n * 64
    if pad_elems:
        v = jnp.pad(v, ((0, 0), (0, pad_elems)))
    v2 = v.reshape(b * n2_pad, 128)

    args = [v2]
    in_specs = [
        pl.BlockSpec(
            (TILE_ROWS, 128),
            lambda ib, it: (ib * tiles_per_image + it, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if valid is not None:
        vv = valid.astype(_I32)
        if n2_pad * 2 - n:
            vv = jnp.pad(vv, ((0, 0), (0, n2_pad * 2 - n)))
        args.append(vv.reshape(b * n2_pad, 2))
        in_specs.append(
            pl.BlockSpec(
                (TILE_ROWS, 2),
                lambda ib, it: (ib * tiles_per_image + it, 0),
                memory_space=pltpu.VMEM,
            )
        )
    # SMEM tables arrive WHOLE ([B, k] block == array): Mosaic rejects
    # sub-row SMEM block windows (block last dims must divide (8, 128) or
    # equal the array dims — caught by the round-5 hardware probe); the
    # kernel indexes image rows with program_id(0) instead.
    in_specs.append(
        pl.BlockSpec((b, 2), lambda ib, it: (0, 0), memory_space=pltpu.SMEM)
    )
    args.append(jnp.asarray(k_dyn).astype(_I32).reshape(b, 2))
    for k in (k_dc, k_dc, k_dc, k_ac, k_ac, k_ac, 4):
        in_specs.append(
            pl.BlockSpec(
                (b, k), lambda ib, it: (0, 0), memory_space=pltpu.SMEM
            )
        )
    args += [
        jnp.asarray(x).reshape(b, -1)
        for x in (dc_syms, dc_l, dc_c, ac_syms, ac_l, ac_c, misc)
    ]

    region_rows = n_words // ROW_WORDS
    kernel = _make_kernel(
        n, stride, luma_per_mcu, k_dc, k_ac, n2_pad, False,
        dyn_k=True, has_valid=valid is not None,
        slab=(tiles_per_image, region_rows),
    )
    words2d, nbits = pl.pallas_call(
        kernel,
        grid=(b, tiles_per_image),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, b), lambda ib, it: (0, 0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * region_rows, ROW_WORDS), _U32),
            jax.ShapeDtypeStruct((1, b), _I32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R_LOC, ROW_WORDS), _U32),
            pltpu.VMEM((16, ROW_WORDS), _U32),
            pltpu.SMEM((4,), _I32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((TILE_ROWS, FRAG_WORDS), _U32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return words2d.reshape(b, region_rows * ROW_WORDS), nbits[0]

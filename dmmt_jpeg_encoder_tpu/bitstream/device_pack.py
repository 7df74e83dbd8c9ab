"""Device-side entropy-scan bit packing.

The reference emits the scan through a serial BitWriter on one CPU thread
(reference: src/image/writer/jpeg/encoder.rs:264-404, binary_stream.rs).
Here the whole variable-length bitstream is assembled ON DEVICE as three
data-parallel stages over the interleaved scan-order block array:

1. EMISSIONS — every (block, slot) pair becomes an independent
   (value, bit-length, block-relative offset) triple. Slots per block:
   1 DC (codeword and magnitude bits fused into one <=31-bit emission),
   63 AC (fused the same way; length 0 where the coefficient is zero),
   3 ZRL (a block has at most floor(63/16)=3 zero-runs >=16), 1 EOB.
   Offsets come from an exclusive prefix sum of per-position bit costs.
2. OFFSETS — per-block bit lengths -> exclusive scan -> global bit offsets
   (the associative-scan form of the BitWriter's running bit position).
3. SCATTER — each emission contributes to at most two 32-bit words of the
   output stream (big-endian bit order). Bit ranges are disjoint by
   construction, so scatter-ADD is scatter-OR with no carries, and XLA is
   free to parallelize it.

The host tail then only byte-stuffs ~0.4 MB of finished stream instead of
re-encoding 25 MB of coefficients: phase-2 output is ~64x smaller than the
coefficient download the C packer needs.

Table lookups assume every symbol present in the data has a codeword —
guaranteed when the tables were built from this image's own histograms
(encoder.py always does). The C/Python packers remain as validating
fallbacks that raise on missing symbols.
"""

from __future__ import annotations

from functools import lru_cache
from ..utils.capability import mode_keyed_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..entropy.categorize import magnitude_category

# Static per-block worst case: DC 31 bits, 63 AC emissions of <=31 bits,
# 3 ZRL of <=16 bits, EOB <=16 bits -> round up to 64 words.
MAX_BLOCK_BITS = 2048
_U32 = jnp.uint32


def _pattern(v: jnp.ndarray, cat: jnp.ndarray) -> jnp.ndarray:
    """JPEG magnitude bits: v for positives, one's complement for negatives
    (reference: src/...transformer/categorize.rs:45-74)."""
    return jnp.where(v >= 0, v, v + (1 << cat) - 1).astype(_U32)


def _exclusive_cumsum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    inc = jnp.cumsum(x, axis=axis)
    return inc - x


def combine_tables(codes: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """(codeword << 8 | length) combined lookup entries (uint32)."""
    return (np.asarray(codes, np.uint32) << 8) | np.asarray(lens, np.uint32)


def block_emissions(
    zz: jnp.ndarray,
    table_idx: jnp.ndarray,
    dc_comb: jnp.ndarray,
    ac_comb: jnp.ndarray,
    groups: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-block emission triples for scan-order blocks.

    zz: int [N, 64] zigzag coefficients (DC already DPCM).
    table_idx: int32 [N] selects the code-table set per block (0=luma,
        1=chroma for a single image; image*2 + chroma for batched packing).
    dc_comb / ac_comb: stacked combined tables, uint32 [T*16] / [T*256] of
        (code << 8 | len) entries (see combine_tables) — ONE gather per
        coefficient instead of 8 (small-table gathers dominate this stage
        on TPU; fusing them is ~4x).

    Returns (values u32 [N, 68], lens i32 [N, 68], rel_offs i32 [N, 68],
    block_bits i32 [N]).
    """
    from ..ops.pallas_lookup import (
        pallas_table_lookup,
        pallas_table_lookup_grouped,
    )

    v = zz.astype(jnp.int32)
    n = v.shape[0]
    cat = magnitude_category(v)  # [N, 64]
    chroma_off = table_idx
    tmod = table_idx % 2  # 0=luma, 1=chroma within this block's table group

    def _lookup(within_idx: jnp.ndarray, comb: jnp.ndarray, t: int) -> jnp.ndarray:
        """Lookup with per-group tables when packing several images at once
        (keeps the in-VMEM one-hot T wide instead of groups*T)."""
        if groups == 1:
            return pallas_table_lookup(within_idx, comb)
        flat = within_idx.reshape(groups, -1)
        out = pallas_table_lookup_grouped(flat, comb.reshape(groups, t))
        return out.reshape(within_idx.shape)

    # --- DC ------------------------------------------------------------
    dccat = cat[:, 0]
    dc_cl = _lookup(tmod * 16 + dccat, dc_comb, 32)
    dccode = dc_cl >> 8
    dclen = (dc_cl & 0xFF).astype(jnp.int32)
    e_dc_val = (dccode << dccat) | _pattern(v[:, 0], dccat)
    e_dc_len = dclen + dccat

    # --- AC structure (categorize.rs:132-151 as scans) ------------------
    ac = v[:, 1:]
    accat = cat[:, 1:]
    pos = jnp.arange(1, 64, dtype=jnp.int32)[None, :]
    nz = ac != 0
    nzpos = jnp.where(nz, pos, 0)
    shifted = jnp.concatenate([jnp.zeros((n, 1), jnp.int32), nzpos[:, :-1]], axis=1)
    prev_nz = jax.lax.associative_scan(jnp.maximum, shifted, axis=1)
    run = pos - prev_nz - 1
    zrl = jnp.where(nz, run >> 4, 0)  # ZRLs immediately before this nonzero
    sym = ((run & 15) << 4) | accat

    ac_cl = _lookup((tmod[:, None] * 256) + sym, ac_comb, 512)
    accode = ac_cl >> 8
    aclen = (ac_cl & 0xFF).astype(jnp.int32)
    e_ac_val = jnp.where(nz, (accode << accat) | _pattern(ac, accat), 0)
    e_ac_len = jnp.where(nz, aclen + accat, 0)

    # --- ZRL / EOB per-block constants ----------------------------------
    zrl_cl = ac_comb[(chroma_off * 256) + 0xF0]
    zrl_code = zrl_cl >> 8
    zrl_len = (zrl_cl & 0xFF).astype(jnp.int32)
    eob_cl = ac_comb[chroma_off * 256]
    eob_code = eob_cl >> 8
    eob_len_t = (eob_cl & 0xFF).astype(jnp.int32)
    has_eob = jnp.max(nzpos, axis=1) < 63
    e_eob_len = jnp.where(has_eob, eob_len_t, 0)

    # --- offsets within the block ---------------------------------------
    pre = zrl * zrl_len[:, None]  # ZRL bits before each position
    seg = pre + e_ac_len
    start = e_dc_len[:, None] + _exclusive_cumsum(seg, axis=1)
    e_ac_off = start + pre
    ac_total = jnp.sum(seg, axis=1)
    e_eob_off = e_dc_len + ac_total
    block_bits = e_dc_len + ac_total + e_eob_len

    # --- the <=3 ZRL slots ----------------------------------------------
    cz = jnp.cumsum(zrl, axis=1)  # inclusive count of ZRLs up to position
    cz_excl = cz - zrl
    total_z = cz[:, -1]
    zrl_vals, zrl_lens, zrl_offs = [], [], []
    for i in range(3):
        active = total_z > i
        ki = jnp.argmax(cz > i, axis=1)  # first position whose count exceeds i
        start_ki = jnp.take_along_axis(start, ki[:, None], axis=1)[:, 0]
        excl_ki = jnp.take_along_axis(cz_excl, ki[:, None], axis=1)[:, 0]
        zrl_offs.append(start_ki + (i - excl_ki) * zrl_len)
        zrl_lens.append(jnp.where(active, zrl_len, 0))
        zrl_vals.append(zrl_code)

    values = jnp.concatenate(
        [e_dc_val[:, None], e_ac_val]
        + [val[:, None] for val in zrl_vals]
        + [eob_code[:, None]],
        axis=1,
    )
    lens = jnp.concatenate(
        [e_dc_len[:, None], e_ac_len]
        + [ln[:, None] for ln in zrl_lens]
        + [e_eob_len[:, None]],
        axis=1,
    )
    offs = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), e_ac_off]
        + [off[:, None] for off in zrl_offs]
        + [e_eob_off[:, None]],
        axis=1,
    )
    return values, lens, offs, block_bits


def byteswap_words(words: jnp.ndarray) -> jnp.ndarray:
    """Logical big-endian words -> memory-order bytes (done on device so the
    host writes the stream with a zero-copy uint8 view; this host moves
    memory at ~350 MB/s, the device at ~800 GB/s)."""
    w = words.astype(jnp.uint32)
    return (
        ((w & 0xFF) << 24)
        | ((w & 0xFF00) << 8)
        | ((w >> 8) & 0xFF00)
        | (w >> 24)
    ).astype(jnp.uint32)


def pack_to_words(
    values: jnp.ndarray,
    lens: jnp.ndarray,
    offs: jnp.ndarray,
    block_bits: jnp.ndarray,
    n_words: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter emissions into a big-endian u32 word stream.

    Returns (words u32 [n_words], total_bits i32 scalar)."""
    block_off = _exclusive_cumsum(block_bits, axis=0)
    total_bits = block_off[-1] + block_bits[-1]

    goff = (block_off[:, None] + offs).reshape(-1)
    val = values.reshape(-1)
    ln = lens.reshape(-1)

    w0 = goff >> 5
    b0 = goff & 31
    end = b0 + ln
    # Emission occupies bits [b0, end) of (w0, w0+1) in MSB-first order.
    spill = jnp.maximum(end - 32, 0)
    c0 = jnp.where(ln > 0, (val >> spill) << jnp.maximum(32 - end, 0), 0).astype(_U32)
    c1 = jnp.where(spill > 0, val << (32 - spill), 0).astype(_U32)

    words = jnp.zeros((n_words,), _U32)
    words = words.at[w0].add(c0, mode="drop")
    words = words.at[w0 + 1].add(c1, mode="drop")
    return words, total_bits


@lru_cache(maxsize=32)
def scan_order_permutation(
    n_luma: int, n_chroma: int, luma_per_mcu: int
) -> tuple[np.ndarray, np.ndarray]:
    """(perm, is_luma) mapping scan position -> index into the concatenated
    [luma; cb; cr] block array (reference interleave:
    src/image/writer/jpeg/encoder/block_fold_iterator.rs:75-148)."""
    if n_chroma == 0:
        return np.arange(n_luma, dtype=np.int32), np.ones(n_luma, dtype=bool)
    n_mcu = n_chroma
    perm = np.empty(n_luma + 2 * n_chroma, dtype=np.int32)
    is_luma = np.zeros(n_luma + 2 * n_chroma, dtype=bool)
    stride = luma_per_mcu + 2
    for j in range(luma_per_mcu):
        perm[j::stride] = np.arange(n_mcu) * luma_per_mcu + j
        is_luma[j::stride] = True
    perm[luma_per_mcu::stride] = n_luma + np.arange(n_mcu)
    perm[luma_per_mcu + 1 :: stride] = n_luma + n_chroma + np.arange(n_mcu)
    return perm, is_luma


def finalize_scan_bytes(words: np.ndarray, total_bits: int) -> bytes:
    """Host tail: trim, 1-pad the final byte, byte-stuff 0xFF -> 0xFF 0x00.

    `words` must already be in memory byte order (byteswap_words ran on
    device), so this is a zero-copy uint8 view plus the stuffing pass."""
    n_bytes = (int(total_bits) + 7) // 8
    raw = np.ascontiguousarray(words).view(np.uint8)[:n_bytes].copy()
    pad = n_bytes * 8 - int(total_bits)
    if pad:
        raw[-1] |= (1 << pad) - 1  # JPEG 1-padding (encoder.rs:267)
    ff = np.flatnonzero(raw == 0xFF)
    if len(ff):
        raw = np.insert(raw, ff + 1, 0)
    return raw.tobytes()


def exact_scan_bits(
    hists: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
    ldc: tuple,
    lac: tuple,
    cdc: tuple | None,
    cac: tuple | None,
) -> int:
    """EXACT total scan bit count from symbol histograms + code lengths —
    no device sync needed. Every emitted DC/AC symbol contributes its
    codeword length plus its magnitude-category extra bits (the category is
    the symbol's low nibble for AC, the symbol itself for DC)."""
    ldc_h, lac_h, cdc_h, cac_h = (np.asarray(h, dtype=np.int64) for h in hists)
    cats16 = np.arange(16, dtype=np.int64)
    extra256 = np.arange(256, dtype=np.int64) & 15
    total = int((ldc_h * (np.asarray(ldc[1], np.int64)[:16] + cats16)).sum())
    total += int((lac_h * (np.asarray(lac[1], np.int64) + extra256)).sum())
    if cdc is not None:
        total += int((cdc_h * (np.asarray(cdc[1], np.int64)[:16] + cats16)).sum())
    if cac is not None:
        total += int((cac_h * (np.asarray(cac[1], np.int64) + extra256)).sum())
    return total


def device_pack_scan(
    luma: jnp.ndarray,
    cb: jnp.ndarray | None,
    cr: jnp.ndarray | None,
    luma_per_mcu: int,
    ldc: tuple[np.ndarray, np.ndarray],
    lac: tuple[np.ndarray, np.ndarray],
    cdc: tuple[np.ndarray, np.ndarray] | None,
    cac: tuple[np.ndarray, np.ndarray] | None,
    known_bits: int | None = None,
) -> bytes:
    """Full device packing pipeline; blocks may be device-resident arrays.

    When `known_bits` (from exact_scan_bits) is given, the stream length is
    trusted and only ONE device->host fetch happens (the word slice)."""
    n_luma = int(luma.shape[0])
    n_chroma = int(cb.shape[0]) if cb is not None else 0
    if _use_fused_pack():
        return _fused_device_pack_scan(
            luma, cb, cr, luma_per_mcu, ldc, lac, cdc, cac, known_bits
        )
    perm, is_luma = scan_order_permutation(n_luma, n_chroma, luma_per_mcu)
    if known_bits is not None:
        # Exact size known up front: use a power-of-two bucketed capacity so
        # the output buffer is right-sized (the worst-case bound is 64x the
        # typical stream) while jit executables still get reused.
        needed_words = (known_bits + 31) // 32 + 2
    else:
        needed_words = (n_luma + 2 * n_chroma) * (MAX_BLOCK_BITS // 32) + 2
    if _use_pallas_pack():
        from .pallas_pack import pack_words_capacity

        n_words = pack_words_capacity(needed_words)
    else:
        n_words = 1 << max(12, int(needed_words).bit_length())

    fn = _compiled_pack(n_luma, n_chroma, luma_per_mcu, n_words)
    zeros16 = np.zeros(16, np.uint32)
    zeros256 = np.zeros(256, np.uint32)
    # Reference DHT tables use 16-entry DC arrays; flat_code_arrays gives
    # 256 — slice down so the combined DC table is [2*16].
    dc_comb = np.concatenate(
        [
            combine_tables(np.asarray(ldc[0])[:16], np.asarray(ldc[1])[:16]),
            combine_tables(np.asarray(cdc[0])[:16], np.asarray(cdc[1])[:16])
            if cdc is not None
            else zeros16,
        ]
    )
    ac_comb = np.concatenate(
        [
            combine_tables(np.asarray(lac[0]), np.asarray(lac[1])),
            combine_tables(np.asarray(cac[0]), np.asarray(cac[1]))
            if cac is not None
            else zeros256,
        ]
    )
    args = [luma]
    if n_chroma:
        args += [cb, cr]
    words, total_bits = fn(*args, jnp.asarray(dc_comb), jnp.asarray(ac_comb))
    if known_bits is not None and _check_bits_enabled():
        # Debug cross-check (DMMT_CHECK_BITS=1, on in tests + dryrun): the
        # host-predicted stream length (exact_scan_bits from histograms x
        # code lengths) must equal what the kernels actually packed —
        # otherwise trusting known_bits would silently truncate/pad the
        # scan. Zero cost in production mode (no extra fetch).
        device_bits = int(jax.device_get(total_bits))
        if device_bits != int(known_bits):
            raise AssertionError(
                f"device packed {device_bits} scan bits but host predicted "
                f"{known_bits}; histogram/emission mismatch"
            )
    nbits = int(known_bits) if known_bits is not None else int(jax.device_get(total_bits))
    needed = (nbits + 31) // 32
    host_words = jax.device_get(words[:needed])
    return finalize_scan_bytes(host_words, nbits)


def _use_pallas_pack() -> bool:
    # Capability probe, not a backend-name check (VERDICT r2 #7): a
    # trivial pallas_call lowering attempt, cached per process, with a
    # stderr diagnostic when a non-CPU backend falls back.
    from ..utils.capability import pallas_capable

    return pallas_capable()


def _use_fused_pack() -> bool:
    """Route single-image packing through the one-kernel fused packer
    (bitstream/fused_pack.py). DMMT_NO_FUSED_PACK=1 falls back to the
    staged emissions->fragment->merge path."""
    import os

    return _use_pallas_pack() and not os.environ.get("DMMT_NO_FUSED_PACK")


def _check_bits_enabled() -> bool:
    import os

    return bool(os.environ.get("DMMT_CHECK_BITS"))


@mode_keyed_cache(maxsize=64)
def _compiled_fused_pack(
    n_luma: int, n_chroma: int, luma_per_mcu: int, n_words: int,
    k_dc: int, k_ac: int,
):
    from .fused_pack import fused_pack_words

    if n_chroma:
        stride, lpm = luma_per_mcu + 2, luma_per_mcu
    else:
        stride, lpm = 1, 1  # i % 1 == 0 < 1: every block is luma

    def fn(luma, cb, cr, *sweep):
        if n_chroma:
            scan = _interleave_scan(luma, cb, cr, n_chroma, luma_per_mcu)
        else:
            scan = luma
        # fused_pack_words output is already in memory byte order
        words, bits = fused_pack_words(scan, stride, lpm, sweep, n_words)
        return words, bits

    return jax.jit(fn)


def _fused_device_pack_scan(
    luma, cb, cr, luma_per_mcu, ldc, lac, cdc, cac, known_bits
):
    """Single-image packing via the one-kernel fused packer."""
    from .fused_pack import build_sweep_tables, fused_pack_capacity

    n_luma = int(luma.shape[0])
    n_chroma = int(cb.shape[0]) if cb is not None else 0
    n_blocks = n_luma + 2 * n_chroma
    sweep = build_sweep_tables(ldc, lac, cdc, cac)
    if known_bits is not None:
        needed_words = (known_bits + 31) // 32 + 2
    else:
        needed_words = n_blocks * (MAX_BLOCK_BITS // 32) + 2
    n_words = fused_pack_capacity(needed_words)
    fn = _compiled_fused_pack(
        n_luma, n_chroma, luma_per_mcu, n_words,
        int(sweep[0].shape[0]), int(sweep[3].shape[0]),
    )
    words, total_bits = fn(
        luma,
        cb if n_chroma else jnp.zeros((0, 64), jnp.int16),
        cr if n_chroma else jnp.zeros((0, 64), jnp.int16),
        *(jnp.asarray(t) for t in sweep),
    )
    if known_bits is not None and _check_bits_enabled():
        device_bits = int(jax.device_get(total_bits))
        if device_bits != int(known_bits):
            raise AssertionError(
                f"device packed {device_bits} scan bits but host predicted "
                f"{known_bits}; histogram/emission mismatch"
            )
    nbits = int(known_bits) if known_bits is not None else int(
        jax.device_get(total_bits)
    )
    needed = (nbits + 31) // 32
    host_words = jax.device_get(words[:needed])
    return finalize_scan_bytes(host_words, nbits)


def _interleave_scan(luma, cb, cr, n_mcu: int, luma_per_mcu: int):
    """Scan-order interleave (Y..Y Cb Cr per MCU) as concat+reshape — a pure
    data movement XLA lowers to one copy, instead of an N-row gather
    (gathers serialize on TPU)."""
    return jnp.concatenate(
        [
            luma.reshape(n_mcu, luma_per_mcu, 64),
            cb[:, None, :],
            cr[:, None, :],
        ],
        axis=1,
    ).reshape(-1, 64)


@mode_keyed_cache(maxsize=32)
def _compiled_pack(n_luma: int, n_chroma: int, luma_per_mcu: int, n_words: int):
    perm, is_luma = scan_order_permutation(n_luma, n_chroma, luma_per_mcu)
    table_idx = (~is_luma).astype(np.int32)

    def fn(*args):
        if n_chroma:
            dc_comb, ac_comb = args[3], args[4]
            scan_blocks = _interleave_scan(
                args[0], args[1], args[2], n_chroma, luma_per_mcu
            )
        else:
            scan_blocks = args[0]
            dc_comb, ac_comb = args[1], args[2]
        values, lens, offs, block_bits = block_emissions(
            scan_blocks, jnp.asarray(table_idx), dc_comb, ac_comb
        )
        if _use_pallas_pack():
            from .pallas_pack import pallas_pack_words

            words, total_bits = pallas_pack_words(
                values, lens, offs, block_bits, n_words
            )
        else:
            words, total_bits = pack_to_words(
                values, lens, offs, block_bits, n_words
            )
        return byteswap_words(words), total_bits

    return jax.jit(fn)


# --- Batched multi-image packing ---------------------------------------------


def device_pack_scan_batch(
    luma: jnp.ndarray,
    cb: jnp.ndarray,
    cr: jnp.ndarray,
    luma_per_mcu: int,
    tables: list[tuple],
    bits_per_image: list[int],
    words_cap: int,
) -> list[bytes]:
    """Pack B images' scans in ONE device dispatch.

    luma/cb/cr: [B, N, 64] device arrays (phase-1 batched outputs).
    tables: per image (ldc, lac, cdc, cac) flat code arrays.
    bits_per_image: EXACT per-image stream bits (exact_scan_bits) — places
    each image's stream at a word-aligned offset so one contiguous slice
    fetch returns all streams.
    """
    b = int(luma.shape[0])
    n_luma = int(luma.shape[1])
    n_chroma = int(cb.shape[1])

    dc_parts, ac_parts = [], []
    for ldc, lac, cdc, cac in tables:
        dc_parts.append(combine_tables(np.asarray(ldc[0])[:16], np.asarray(ldc[1])[:16]))
        dc_parts.append(combine_tables(np.asarray(cdc[0])[:16], np.asarray(cdc[1])[:16]))
        ac_parts.append(combine_tables(np.asarray(lac[0]), np.asarray(lac[1])))
        ac_parts.append(combine_tables(np.asarray(cac[0]), np.asarray(cac[1])))
    dc_comb = np.concatenate(dc_parts)  # [B*2*16]
    ac_comb = np.concatenate(ac_parts)  # [B*2*256]

    word_off = np.zeros(b, dtype=np.int32)
    acc = 0
    for i, bits in enumerate(bits_per_image):
        word_off[i] = acc
        acc += (bits + 31) // 32
    total_words = acc

    fn = _compiled_pack_batch(b, n_luma, n_chroma, luma_per_mcu, words_cap)
    words = fn(
        luma, cb, cr,
        jnp.asarray(dc_comb), jnp.asarray(ac_comb), jnp.asarray(word_off),
    )
    host_words = jax.device_get(words[:total_words])
    out = []
    for i, bits in enumerate(bits_per_image):
        seg = host_words[word_off[i] : word_off[i] + (bits + 31) // 32]
        out.append(finalize_scan_bytes(seg, bits))
    return out


@mode_keyed_cache(maxsize=16)
def _compiled_pack_batch(
    b: int, n_luma: int, n_chroma: int, luma_per_mcu: int, words_cap: int
):
    perm, is_luma = scan_order_permutation(n_luma, n_chroma, luma_per_mcu)
    ns = len(perm)
    chroma_idx = (~is_luma).astype(np.int32)

    def fn(luma, cb, cr, dc_comb, ac_comb, word_off):
        scan = jnp.concatenate(
            [
                luma.reshape(b, n_chroma, luma_per_mcu, 64),
                cb[:, :, None, :],
                cr[:, :, None, :],
            ],
            axis=2,
        ).reshape(b * ns, 64)
        tbl = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * 2 + jnp.asarray(chroma_idx)[None, :]
        ).reshape(-1)
        values, lens, offs, block_bits = block_emissions(
            scan, tbl, dc_comb, ac_comb, groups=b
        )

        bb = block_bits.reshape(b, ns)
        in_img = jnp.cumsum(bb, axis=1) - bb  # exclusive, per image
        goff_blocks = word_off[:, None] * 32 + in_img  # [B, NS] global bits

        if _use_pallas_pack():
            from .pallas_pack import pallas_pack_words

            words, _ = pallas_pack_words(
                values, lens, offs, block_bits, words_cap,
                boff=goff_blocks.reshape(-1),
            )
            return byteswap_words(words)

        goff = (goff_blocks.reshape(-1)[:, None] + offs).reshape(-1)
        val = values.reshape(-1)
        ln = lens.reshape(-1)
        w0 = goff >> 5
        b0 = goff & 31
        end = b0 + ln
        spill = jnp.maximum(end - 32, 0)
        c0 = jnp.where(ln > 0, (val >> spill) << jnp.maximum(32 - end, 0), 0).astype(_U32)
        c1 = jnp.where(spill > 0, val << (32 - spill), 0).astype(_U32)
        words = jnp.zeros((words_cap,), _U32)
        words = words.at[w0].add(c0, mode="drop")
        words = words.at[w0 + 1].add(c1, mode="drop")
        return byteswap_words(words)

    return jax.jit(fn)

"""Scan packing: coefficients -> stuffed, 1-padded entropy bytes.

Native C fast path (csrc/scan_encoder.c) with a bit-identical pure-Python
fallback. Inputs are the device pipeline's outputs: int16 [N, 64] blocks in
zigzag order, DC already DPCM-delta-coded, luma in MCU-entangled order.

Behavioral reference: src/image/writer/jpeg/encoder.rs:264-404 (scan
emission), block_fold_iterator.rs (interleave), binary_stream.rs (bit order,
1-padded flush), segment_marker_injector.rs (byte stuffing).
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..errors import CategoryOverflow, HuffmanSymbolMissing
from ..utils.native import load_native
from .bitwriter import BitWriter, byte_stuff

CodeTable = tuple[list[int], list[int]]  # (codes[256], lens[256]) right-aligned


def encode_scan(
    luma: np.ndarray,
    cb: np.ndarray | None,
    cr: np.ndarray | None,
    luma_per_mcu: int,
    luma_dc: CodeTable,
    luma_ac: CodeTable,
    chroma_dc: CodeTable | None,
    chroma_ac: CodeTable | None,
    use_native: bool = True,
) -> bytes:
    """Entropy-encode the interleaved scan; returns stuffed, 1-padded bytes."""
    luma = np.ascontiguousarray(luma, dtype=np.int16)
    has_chroma = cb is not None and cr is not None and len(cb) > 0
    if has_chroma:
        cb = np.ascontiguousarray(cb, dtype=np.int16)
        cr = np.ascontiguousarray(cr, dtype=np.int16)

    if use_native:
        lib = load_native()
        if lib is not None:
            result = _encode_native(
                lib, luma, cb, cr, has_chroma, luma_per_mcu,
                luma_dc, luma_ac, chroma_dc, chroma_ac,
            )
            if result is not None:
                return result
    return _encode_python(
        luma, cb, cr, has_chroma, luma_per_mcu,
        luma_dc, luma_ac, chroma_dc, chroma_ac,
    )


def _as_code_arrays(table: CodeTable) -> tuple[np.ndarray, np.ndarray]:
    codes, lens = table
    return (
        np.asarray(codes, dtype=np.uint16),
        np.asarray(lens, dtype=np.uint8),
    )


def _encode_native(
    lib, luma, cb, cr, has_chroma, luma_per_mcu,
    luma_dc, luma_ac, chroma_dc, chroma_ac,
) -> bytes | None:
    fn = lib.dmmt_encode_scan
    fn.restype = ctypes.c_long
    n_luma = len(luma)
    n_chroma = len(cb) if has_chroma else 0
    # Worst case ~512B/block before stuffing; stuffing at most doubles.
    cap = (n_luma + 2 * n_chroma) * 1100 + 64
    out = np.empty(cap, dtype=np.uint8)

    ldc_c, ldc_l = _as_code_arrays(luma_dc)
    lac_c, lac_l = _as_code_arrays(luma_ac)
    if has_chroma:
        cdc_c, cdc_l = _as_code_arrays(chroma_dc)
        cac_c, cac_l = _as_code_arrays(chroma_ac)
    else:
        cdc_c = cdc_l = cac_c = cac_l = None

    def ptr(a, t):
        if a is None:
            return None
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = fn(
        ptr(luma, ctypes.c_int16), ctypes.c_long(n_luma),
        ptr(cb if has_chroma else None, ctypes.c_int16),
        ptr(cr if has_chroma else None, ctypes.c_int16),
        ctypes.c_long(n_chroma),
        ctypes.c_int(luma_per_mcu),
        ptr(ldc_c, ctypes.c_uint16), ptr(ldc_l, ctypes.c_uint8),
        ptr(lac_c, ctypes.c_uint16), ptr(lac_l, ctypes.c_uint8),
        ptr(cdc_c, ctypes.c_uint16), ptr(cdc_l, ctypes.c_uint8),
        ptr(cac_c, ctypes.c_uint16), ptr(cac_l, ctypes.c_uint8),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(cap),
    )
    if rc == -2:
        raise CategoryOverflow("coefficient magnitude category exceeds 15")
    if rc == -3:
        raise HuffmanSymbolMissing(-1, "scan")
    if rc < 0:
        return None  # buffer sizing issue; fall back
    return bytes(out[:rc])


# --- Pure-Python fallback ----------------------------------------------------


def _category(v: int) -> int:
    cat = int(abs(v)).bit_length()
    if cat > 15:
        raise CategoryOverflow(
            f"Unable to categorize value '{v}' because it is out of range"
        )
    return cat


def _pattern(v: int, cat: int) -> int:
    return v if v >= 0 else ((1 << cat) - 1 - abs(v))


def _emit_block(w: BitWriter, block, dc_table: CodeTable, ac_table: CodeTable):
    dc_codes, dc_lens = dc_table
    ac_codes, ac_lens = ac_table
    dc = int(block[0])
    cat = _category(dc)
    if dc_lens[cat] == 0:
        raise HuffmanSymbolMissing(cat, "dc")
    w.write_bits(dc_codes[cat], dc_lens[cat])
    if cat:
        w.write_bits(_pattern(dc, cat), cat)
    run = 0
    for k in range(1, 64):
        a = int(block[k])
        if a == 0:
            run += 1
            continue
        while run > 15:
            if ac_lens[0xF0] == 0:
                raise HuffmanSymbolMissing(0xF0, "ac")
            w.write_bits(ac_codes[0xF0], ac_lens[0xF0])
            run -= 16
        acat = _category(a)
        sym = (run << 4) | acat
        if ac_lens[sym] == 0:
            raise HuffmanSymbolMissing(sym, "ac")
        w.write_bits(ac_codes[sym], ac_lens[sym])
        w.write_bits(_pattern(a, acat), acat)
        run = 0
    if run:
        if ac_lens[0x00] == 0:
            raise HuffmanSymbolMissing(0x00, "ac")
        w.write_bits(ac_codes[0x00], ac_lens[0x00])


def _encode_python(
    luma, cb, cr, has_chroma, luma_per_mcu,
    luma_dc, luma_ac, chroma_dc, chroma_ac,
) -> bytes:
    w = BitWriter(flush_with_ones=True)
    n_mcu = len(cb) if has_chroma else len(luma) // max(luma_per_mcu, 1)
    li = 0
    for m in range(n_mcu):
        for _ in range(luma_per_mcu):
            _emit_block(w, luma[li], luma_dc, luma_ac)
            li += 1
        if has_chroma:
            _emit_block(w, cb[m], chroma_dc, chroma_ac)
            _emit_block(w, cr[m], chroma_dc, chroma_ac)
    w.flush()
    return byte_stuff(w.getvalue())

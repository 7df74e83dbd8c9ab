"""Literal expected-output vectors harvested from the reference's unit
tests (VERDICT r3 #10): with no Rust toolchain in this environment, these
constants are the closest available ground truth for the BASELINE
bit-exactness clause. Each test cites the reference test it mirrors."""

import numpy as np
import pytest

from dmmt_jpeg_encoder_tpu.bitstream.bitwriter import BitWriter
from dmmt_jpeg_encoder_tpu.container import dqt
from dmmt_jpeg_encoder_tpu.errors import (
    HuffmanCodeTooLong,
    HuffmanDepthOverflow,
    HuffmanUnsortedInput,
)
from dmmt_jpeg_encoder_tpu.huffman.canonical import canonical_codes
from dmmt_jpeg_encoder_tpu.huffman.package_merge import package_merge_lengths
from dmmt_jpeg_encoder_tpu.huffman.spec import SymbolCodeLength
from dmmt_jpeg_encoder_tpu.tables import quantization_table_pair
from dmmt_jpeg_encoder_tpu.config import QuantizationTablePreset


# --- length_limited.rs generate() vectors ---------------------------------


def test_generate_one():
    """reference: src/huffman/length_limited.rs:209-223 (test_generate_one)."""
    freqs = [1, 2, 5, 8, 10, 11, 14, 14, 15, 18, 20]
    assert package_merge_lengths(freqs, 4) == [4, 4, 4, 4, 4, 4, 3, 3, 3, 3, 3]


def test_generate_two():
    """reference: src/huffman/length_limited.rs:225-239 (test_generate_two)."""
    freqs = [1, 1, 1, 2, 2, 2, 3, 6, 17, 20]
    assert package_merge_lengths(freqs, 5) == [5, 5, 4, 4, 4, 4, 4, 3, 2, 2]


def test_generate_three():
    """reference: src/huffman/length_limited.rs:241-255 (test_generate_three)."""
    freqs = [1, 1, 1, 2, 2, 2, 3, 6, 17, 20]
    assert package_merge_lengths(freqs, 4) == [4, 4, 4, 4, 4, 4, 4, 4, 2, 2]


def test_generate_too_long_input_array():
    """reference: src/huffman/length_limited.rs:257-264 (should_panic)."""
    freqs = [1, 1, 1, 2, 2, 2, 3, 6, 17, 20]
    with pytest.raises(HuffmanDepthOverflow):
        package_merge_lengths(freqs, 3)


# --- huffman/encoder.rs translator vectors --------------------------------


def test_translator_rejects_unsorted():
    """reference: src/huffman/encoder.rs:198-204 (test_unsorted_symbols)."""
    scl = [SymbolCodeLength(s, l) for s, l in [(0, 1), (1, 5), (2, 4), (3, 3)]]
    with pytest.raises(HuffmanUnsortedInput):
        canonical_codes(scl)


def test_translator_rejects_length_over_16():
    """reference: src/huffman/encoder.rs:206-211 (test_max_code_length_too_long)."""
    scl = [SymbolCodeLength(s, l) for s, l in [(0, 17), (1, 5), (2, 4), (3, 3)]]
    with pytest.raises(HuffmanCodeTooLong):
        canonical_codes(scl)


# reference: src/huffman/encoder.rs:213-230 (TEST_SYMBOL_SEQUENCE /
# TEST_BYTE_SEQUENCE / SYMBOLS_AND_FREQUENCIES_ODD_LEN)
TEST_SYMBOL_SEQUENCE = [
    27, 17, 7, 31, 22, 12, 2, 29, 21, 19, 11, 9, 1, 30, 25, 15, 5, 24, 14,
    4, 20, 10, 26, 23, 16, 13, 6, 3, 32, 28, 18, 8,
]
TEST_BYTE_SEQUENCE = bytes([
    0b00000100, 0b01101000, 0b10101100, 0b11110000, 0b10001100, 0b10100111,
    0b01001010, 0b11011010, 0b11101011, 0b11110000, 0b11000111, 0b00101100,
    0b11110100, 0b11010111, 0b01101101, 0b11111000, 0b11100111, 0b10101110,
    0b11111100, 0b11110111, 0b11101111, 0b11000000,
])
SYMBOLS_AND_FREQUENCIES_ODD_LEN = [
    (1, 14), (2, 30), (3, 4), (4, 7), (5, 9), (6, 4), (7, 42), (8, 1),
    (9, 14), (10, 5), (11, 14), (12, 30), (13, 4), (14, 7), (15, 9),
    (16, 4), (17, 42), (18, 1), (19, 14), (20, 5), (21, 14), (22, 30),
    (23, 4), (24, 7), (25, 9), (26, 4), (27, 42), (28, 1), (29, 14),
    (30, 12), (31, 32), (32, 1),
]


def test_coder_encode_byte_sequence():
    """reference: src/huffman/encoder.rs:244-269 (test_coder_encode): the
    full chain — stable sort by frequency, package-merge at limit 6,
    lengths[0] += 1 bump, canonical translation, MSB-first bit packing
    with ZERO flush padding — must reproduce the committed 22-byte
    stream exactly."""
    sorted_syms = sorted(SYMBOLS_AND_FREQUENCIES_ODD_LEN, key=lambda x: x[1])
    lengths = package_merge_lengths([f for _, f in sorted_syms], 6)
    scl = [
        SymbolCodeLength(sym, ln)
        for (sym, _), ln in zip(sorted_syms, lengths)
    ]
    scl[0] = SymbolCodeLength(scl[0].symbol, scl[0].length + 1)
    codes = canonical_codes(scl)
    bw = BitWriter(flush_with_ones=False)
    for s in TEST_SYMBOL_SEQUENCE:
        cw = codes[s]
        bw.write_bits(cw.bits, cw.length)
    bw.flush()
    assert bw.getvalue() == TEST_BYTE_SEQUENCE


# --- encoder.rs segment vectors -------------------------------------------


def test_write_quantization_table_id2():
    """reference: src/image/writer/jpeg/encoder.rs:520-538
    (test_write_quantization): DQT with table id 2 and the Specification
    luma table, entries in zigzag order."""
    luma, _ = quantization_table_pair(QuantizationTablePreset.SPECIFICATION)
    expected = bytes([
        0xFF, 0xDB, 0x00, 0x43, 0x02, 16, 11, 12, 14, 12, 10, 16, 14, 13,
        14, 18, 17, 16, 19, 24, 40, 26, 24, 22, 22, 24, 49, 35, 37, 29, 40,
        58, 51, 61, 60, 57, 51, 56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55,
        56, 80, 109, 81, 87, 95, 98, 103, 104, 103, 62, 77, 113, 121, 112,
        100, 120, 92, 101, 103, 99,
    ])
    assert dqt(2, np.asarray(luma)) == expected

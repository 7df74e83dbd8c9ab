"""Fused one-kernel scan packer vs the staged reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dmmt_jpeg_encoder_tpu.bitstream.device_pack import (
    block_emissions,
    combine_tables,
    pack_to_words,
)
from dmmt_jpeg_encoder_tpu.bitstream.fused_pack import (
    build_sweep_tables,
    fused_pack_capacity,
    fused_pack_words,
)
from dmmt_jpeg_encoder_tpu.entropy.categorize import symbol_histograms
from dmmt_jpeg_encoder_tpu.huffman.canonical import flat_code_arrays
from dmmt_jpeg_encoder_tpu.huffman.spec import code_lengths_from_histogram


@pytest.fixture
def interpret(monkeypatch):
    monkeypatch.setenv("DMMT_PALLAS_INTERPRET", "1")


def _scan_case(rng, n_mcu, luma_per_mcu, density=0.15):
    """Random interleaved scan blocks + per-channel optimal tables."""
    stride = luma_per_mcu + 2
    n = n_mcu * stride
    blocks = np.zeros((n, 64), dtype=np.int16)
    mask = rng.random(blocks.shape) < density
    blocks[mask] = rng.integers(-900, 900, mask.sum())
    if n > 3:
        blocks[1] = 0
        blocks[2, 63] = 5  # trailing nonzero: ZRLs, no EOB
    is_chroma = (np.arange(n) % stride) >= luma_per_mcu

    def tables_for(sel):
        dc_h, ac_h = (
            np.asarray(h) for h in symbol_histograms(jnp.asarray(blocks[sel]))
        )
        dc = flat_code_arrays(code_lengths_from_histogram(dc_h))
        ac = flat_code_arrays(code_lengths_from_histogram(ac_h))
        return dc, ac

    ldc, lac = tables_for(~is_chroma)
    cdc, cac = tables_for(is_chroma)
    return blocks, is_chroma, ldc, lac, cdc, cac


def _reference_words(blocks, is_chroma, ldc, lac, cdc, cac, cap):
    dc_comb = np.concatenate(
        [
            combine_tables(np.asarray(ldc[0])[:16], np.asarray(ldc[1])[:16]),
            combine_tables(np.asarray(cdc[0])[:16], np.asarray(cdc[1])[:16]),
        ]
    )
    ac_comb = np.concatenate(
        [
            combine_tables(np.asarray(lac[0]), np.asarray(lac[1])),
            combine_tables(np.asarray(cac[0]), np.asarray(cac[1])),
        ]
    )
    values, lens, offs, block_bits = block_emissions(
        jnp.asarray(blocks),
        jnp.asarray(is_chroma.astype(np.int32)),
        jnp.asarray(dc_comb),
        jnp.asarray(ac_comb),
    )
    words, bits = pack_to_words(values, lens, offs, block_bits, cap)
    # fused_pack_words emits words already in MEMORY (big-endian stream)
    # order; swap the logical-order reference to match
    from dmmt_jpeg_encoder_tpu.bitstream.device_pack import byteswap_words

    return byteswap_words(words), bits


@pytest.mark.parametrize("luma_per_mcu,n_mcu", [(1, 40), (2, 30), (4, 25)])
def test_fused_pack_matches_reference(rng, interpret, luma_per_mcu, n_mcu):
    blocks, is_chroma, ldc, lac, cdc, cac = _scan_case(rng, n_mcu, luma_per_mcu)
    cap = fused_pack_capacity(blocks.shape[0] * 64 + 2)
    ref_words, ref_bits = _reference_words(
        blocks, is_chroma, ldc, lac, cdc, cac, cap
    )
    sweep = build_sweep_tables(ldc, lac, cdc, cac)
    words, bits = fused_pack_words(
        jnp.asarray(blocks), luma_per_mcu + 2, luma_per_mcu, sweep, cap
    )
    assert int(bits) == int(ref_bits)
    used = (int(ref_bits) + 31) // 32
    np.testing.assert_array_equal(
        np.asarray(words[:used]), np.asarray(ref_words[:used])
    )


def test_fused_pack_dense_worst_case(rng, interpret):
    """Near-dense blocks: long codes, multi-word fragments."""
    blocks, is_chroma, ldc, lac, cdc, cac = _scan_case(
        rng, 12, 4, density=0.95
    )
    cap = fused_pack_capacity(blocks.shape[0] * 64 + 2)
    ref_words, ref_bits = _reference_words(
        blocks, is_chroma, ldc, lac, cdc, cac, cap
    )
    sweep = build_sweep_tables(ldc, lac, cdc, cac)
    words, bits = fused_pack_words(
        jnp.asarray(blocks), 6, 4, sweep, cap
    )
    assert int(bits) == int(ref_bits)
    used = (int(ref_bits) + 31) // 32
    np.testing.assert_array_equal(
        np.asarray(words[:used]), np.asarray(ref_words[:used])
    )


def test_fused_pack_with_adjustments(rng, interpret):
    """Per-block bit adjustments word-align a second image's stream."""
    blocks, is_chroma, ldc, lac, cdc, cac = _scan_case(rng, 20, 1)
    cap = fused_pack_capacity(blocks.shape[0] * 64 + 64)
    sweep = build_sweep_tables(ldc, lac, cdc, cac)
    plain, bits = fused_pack_words(jnp.asarray(blocks), 3, 1, sweep, cap)
    base_words = 9
    adj = np.zeros(blocks.shape[0], np.int32)
    adj[0] = base_words * 32
    shifted, total = fused_pack_words(
        jnp.asarray(blocks), 3, 1, sweep, cap, adj=jnp.asarray(adj)
    )
    used = (int(bits) + 31) // 32
    np.testing.assert_array_equal(
        np.asarray(shifted[base_words : base_words + used]),
        np.asarray(plain[:used]),
    )
    assert int(np.asarray(shifted[:base_words]).sum()) == 0
    assert int(total) == int(bits) + base_words * 32


def test_fused_pack_27bit_emission_value(rng, interpret):
    """A 16-bit codeword paired with a category-11 coefficient makes a
    27-bit emission VALUE. The rank-compaction (val, len) pack must keep
    all 27 bits (an i32 '<< 5' pack overflows the sign bit and unpacks
    sign-extended — regression for exactly that)."""
    lpm = 1
    stride = lpm + 2
    n_mcu = 4
    blocks = np.zeros((n_mcu * stride, 64), np.int16)
    # luma block 0: (run 0, cat 11) -> 16-bit code + 11 magnitude bits
    blocks[0, 1] = 1500
    blocks[0, 2] = -1200
    blocks[0, 10] = 3          # (run 7, cat 2)
    blocks[3, 5] = -1          # (run 4, cat 1)
    is_chroma = (np.arange(n_mcu * stride) % stride) >= lpm

    def flat(n, entries):
        codes = np.zeros(n, np.int64)
        lens = np.zeros(n, np.int64)
        for sym, code, ln in entries:
            codes[sym] = code
            lens[sym] = ln
        return codes, lens

    # handcrafted tables: the packer only looks codes up, and both the
    # fused kernel and the staged reference get the SAME tables
    ldc = flat(16, [(0, 0b101, 3)])
    lac = flat(256, [
        (0x0B, 0xFFFE, 16),   # run 0, cat 11 -> the 27-bit emission
        (0x0A, 0x3FFE, 14),   # run 0, cat 10 (the -1200 coefficient)
        (0x72, 0x6, 3),       # run 7, cat 2
        (0x41, 0x2, 3),       # run 4, cat 1
        (0x00, 0x0, 2),       # EOB
    ])
    cdc = flat(16, [(0, 0b1, 2)])
    cac = flat(256, [(0x00, 0x3, 2)])

    cap = fused_pack_capacity(blocks.shape[0] * 64 + 2)
    ref_words, ref_bits = _reference_words(
        blocks, is_chroma, ldc, lac, cdc, cac, cap
    )
    sweep = build_sweep_tables(ldc, lac, cdc, cac)
    words, bits = fused_pack_words(
        jnp.asarray(blocks), stride, lpm, sweep, cap
    )
    assert int(bits) == int(ref_bits)
    used = (int(ref_bits) + 31) // 32
    np.testing.assert_array_equal(
        np.asarray(words[:used]), np.asarray(ref_words[:used])
    )

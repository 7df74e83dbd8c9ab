"""Pallas bitstream-pack kernels vs the scatter reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dmmt_jpeg_encoder_tpu.bitstream.device_pack import (
    block_emissions,
    combine_tables,
    pack_to_words,
)
from dmmt_jpeg_encoder_tpu.bitstream.pallas_pack import (
    pack_words_capacity,
    pallas_pack_words,
)
from dmmt_jpeg_encoder_tpu.entropy.categorize import symbol_histograms
from dmmt_jpeg_encoder_tpu.huffman.canonical import flat_code_arrays
from dmmt_jpeg_encoder_tpu.huffman.spec import code_lengths_from_histogram


@pytest.fixture
def interpret(monkeypatch):
    monkeypatch.setenv("DMMT_PALLAS_INTERPRET", "1")


def _emissions_for(rng, n_blocks, density=0.15):
    blocks = np.zeros((n_blocks, 64), dtype=np.int16)
    mask = rng.random(blocks.shape) < density
    blocks[mask] = rng.integers(-900, 900, mask.sum())
    blocks[1] = 0
    blocks[2, 63] = 5  # trailing nonzero: ZRLs, no EOB
    dc_h, ac_h = (np.asarray(h) for h in symbol_histograms(jnp.asarray(blocks)))
    dc = flat_code_arrays(code_lengths_from_histogram(dc_h))
    ac = flat_code_arrays(code_lengths_from_histogram(ac_h))
    dc_comb = np.concatenate(
        [combine_tables(np.asarray(dc[0])[:16], np.asarray(dc[1])[:16])] * 2
    )
    ac_comb = np.concatenate(
        [combine_tables(np.asarray(ac[0]), np.asarray(ac[1]))] * 2
    )
    return block_emissions(
        jnp.asarray(blocks),
        jnp.zeros(n_blocks, jnp.int32),
        jnp.asarray(dc_comb),
        jnp.asarray(ac_comb),
    )


def test_pallas_pack_matches_scatter(rng, interpret):
    values, lens, offs, block_bits = _emissions_for(rng, 96)
    cap = pack_words_capacity(int(np.asarray(block_bits).sum()) // 32 + 2)
    ref_words, ref_bits = pack_to_words(values, lens, offs, block_bits, cap)
    out_words, out_bits = pallas_pack_words(values, lens, offs, block_bits, cap)
    assert int(out_bits) == int(ref_bits)
    n_used = (int(ref_bits) + 31) // 32
    np.testing.assert_array_equal(
        np.asarray(out_words[:n_used]), np.asarray(ref_words[:n_used])
    )


def test_pallas_pack_with_explicit_offsets(rng, interpret):
    """Word-aligned per-image bases (the batched layout) must place streams
    identically to packing each image alone."""
    values, lens, offs, block_bits = _emissions_for(rng, 64)
    bits = np.asarray(jnp.cumsum(block_bits) - block_bits)
    total = int(np.asarray(block_bits).sum())
    base_words = 7
    boff = jnp.asarray(bits + base_words * 32)
    cap = pack_words_capacity(total // 32 + base_words + 2)
    shifted, _ = pallas_pack_words(
        values, lens, offs, block_bits, cap, boff=boff
    )
    plain, bits_out = pallas_pack_words(values, lens, offs, block_bits, cap)
    n_used = (int(bits_out) + 31) // 32
    np.testing.assert_array_equal(
        np.asarray(shifted[base_words : base_words + n_used]),
        np.asarray(plain[:n_used]),
    )
    assert int(np.asarray(shifted[:base_words]).sum()) == 0


def test_pack_words_capacity_is_row_aligned():
    from dmmt_jpeg_encoder_tpu.bitstream.pallas_pack import ROW_WORDS

    for needed in (1, 1000, 123_456, 5_000_000):
        cap = pack_words_capacity(needed)
        assert cap % ROW_WORDS == 0
        assert cap >= needed

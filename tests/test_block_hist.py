"""Fused structure+histogram kernel (ops/pallas_block_hist.py) vs the
XLA reference semantics (entropy/categorize.symbol_histograms)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dmmt_jpeg_encoder_tpu.entropy.categorize import symbol_histograms
from dmmt_jpeg_encoder_tpu.ops.pallas_block_hist import fused_block_histograms


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("DMMT_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize(
    "n,density",
    [(512, 0.2), (513, 0.1), (1000, 0.02), (64, 0.9), (2, 0.5)],
)
def test_matches_reference(rng, n, density):
    blocks = np.where(
        rng.random((n, 64)) < density,
        rng.integers(-900, 900, (n, 64)),
        0,
    ).astype(np.int16)
    blocks[:, 0] = rng.integers(-2047, 2047, n)  # DPCM'd DC deltas
    ref_dc, ref_ac = symbol_histograms(jnp.asarray(blocks))
    got_dc, got_ac = fused_block_histograms(jnp.asarray(blocks))
    np.testing.assert_array_equal(np.asarray(got_dc), np.asarray(ref_dc))
    np.testing.assert_array_equal(np.asarray(got_ac), np.asarray(ref_ac))


def test_prefix_mask_matches_reference(rng):
    n, nv = 700, 512
    blocks = np.where(
        rng.random((n, 64)) < 0.15, rng.integers(-500, 500, (n, 64)), 0
    ).astype(np.int16)
    mask = jnp.arange(n) < nv
    ref = symbol_histograms(jnp.asarray(blocks), mask)
    got = fused_block_histograms(jnp.asarray(blocks), nv)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_extreme_blocks(rng):
    """All-zero blocks (pure EOB), dense max-run blocks (ZRL chains), and
    a lone coefficient at zigzag position 63 (no EOB)."""
    blocks = np.zeros((6, 64), np.int16)
    blocks[1, 63] = 5          # no EOB, run 62 -> 3 ZRL + symbol
    blocks[2, 1] = -1          # short block: symbol + EOB
    blocks[3, :] = 1           # fully dense, no zeros at all
    blocks[4, 16] = 300
    ref = symbol_histograms(jnp.asarray(blocks))
    got = fused_block_histograms(jnp.asarray(blocks))
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_e2e_hist_mode_bytes_identical(rng, monkeypatch):
    """DMMT_HIST=fused must not change output bytes (counts are exact, so
    tables and scans are identical)."""
    import dmmt_jpeg_encoder_tpu as dj

    px = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    cfg = dj.EncoderConfig(
        chroma_subsampling=dj.ChromaSubsamplingPreset("P420")
    )
    monkeypatch.setenv("DMMT_HIST", "matmul")
    a = dj.encode_array(px, 255, cfg)
    monkeypatch.setenv("DMMT_HIST", "fused")
    b = dj.encode_array(px, 255, cfg)
    assert a == b


def test_sharded_with_fused_hist_bit_exact(rng, monkeypatch):
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.setenv("DMMT_HIST", "fused")
    import dmmt_jpeg_encoder_tpu as dj

    px = rng.integers(0, 256, (44, 28, 3), dtype=np.uint16)
    single = dj.encode_array(px, 255, dj.EncoderConfig())
    sharded = dj.encode_array(
        px, 255, dj.EncoderConfig(num_shards=8, scan_backend="device")
    )
    assert sharded == single

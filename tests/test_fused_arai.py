"""Arai-bit-exact fused phase-1 kernel (ops/fused_arai.py, DMMT_P1=fused2).

fused2 claims BIT-IDENTITY with the parity path (DMMT_P1=plane), not just
oracle-equality — so beyond the kernel == jnp-oracle interpret checks
(mirroring test_fused_phase1.py), these tests pin encode BYTES equal to
the plane path for every preset, which is the whole point of the mode
(VERDICT round-3 #4: the fastest mode must satisfy the bit-exactness
clause, reference: src/cosine_transform/arai.rs:29-104).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dmmt_jpeg_encoder_tpu.ops.fused_arai import (
    fused_arai_phase1,
    fused_arai_reference,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("DMMT_PALLAS_INTERPRET", "1")


def _planes(rng, h, w, dtype=np.uint8, hi=256):
    return tuple(
        jnp.asarray(rng.integers(0, hi, (h, w)).astype(dtype))
        for _ in range(3)
    )


@pytest.mark.parametrize("rates", [(2, 2), (2, 1), (1, 1)])
@pytest.mark.parametrize(
    "h,w",
    [
        (128, 256),   # exactly one tile
        (144, 272),   # non-divisible edge tiles (row + lane mask paths)
        (256, 768),   # multi-tile both ways
    ],
)
def test_kernel_matches_oracle(rng, h, w, rates):
    hr, vr = rates
    r, g, b = _planes(rng, h, w)
    lq = jnp.asarray(rng.integers(1, 60, 64).astype(np.uint8))
    cq = jnp.asarray(rng.integers(1, 90, 64).astype(np.uint8))
    got = fused_arai_phase1(r, g, b, jnp.float32(255.0), lq, cq, hr, vr)
    want = fused_arai_reference(
        r, g, b, jnp.float32(255.0), lq, cq, hr, vr
    )
    for a, e, name in zip(got, want, ("luma", "cb", "cr")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(e), name)


def test_oracle_matches_plane_path(rng):
    """The jnp oracle's coefficient planes must equal the DMMT_P1=plane
    chain bit for bit (same normalize/color/subsample/Arai order)."""
    from dmmt_jpeg_encoder_tpu.config import ChromaSubsamplingPreset
    from dmmt_jpeg_encoder_tpu.ops.color import rgb_to_ycbcr_planes
    from dmmt_jpeg_encoder_tpu.ops.geometry import subsample
    from dmmt_jpeg_encoder_tpu.pipeline import (
        _plane_dct_zigzag_blocks,
        plane_to_zigzag_blocks,
    )

    h, w = 64, 128
    r, g, b = _planes(rng, h, w)
    lq = jnp.asarray(rng.integers(1, 60, 64).astype(np.uint8))
    cq = jnp.asarray(rng.integers(1, 90, 64).astype(np.uint8))
    y_c, cb_c, cr_c = fused_arai_reference(
        r, g, b, jnp.float32(255.0), lq, cq, 2, 2
    )
    mv = jnp.float32(255.0)
    y, cb, cr = rgb_to_ycbcr_planes(
        r.astype(jnp.float32) / mv,
        g.astype(jnp.float32) / mv,
        b.astype(jnp.float32) / mv,
    )
    preset = ChromaSubsamplingPreset.P420
    np.testing.assert_array_equal(
        np.asarray(plane_to_zigzag_blocks(y_c, False)),
        np.asarray(_plane_dct_zigzag_blocks(y, lq, False, "plane")),
    )
    np.testing.assert_array_equal(
        np.asarray(plane_to_zigzag_blocks(cb_c, False)),
        np.asarray(
            _plane_dct_zigzag_blocks(subsample(cb, preset), cq, False, "plane")
        ),
    )
    np.testing.assert_array_equal(
        np.asarray(plane_to_zigzag_blocks(cr_c, False)),
        np.asarray(
            _plane_dct_zigzag_blocks(subsample(cr, preset), cq, False, "plane")
        ),
    )


def _photo(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 60 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0)
    return np.clip(
        np.stack([base, base * 0.9 + 10, base * 1.1 - 8], axis=-1)
        + rng.normal(0, 3, (h, w, 3)),
        0, 255,
    ).astype(np.uint8)


@pytest.mark.parametrize("preset", ["P420", "P422", "P444"])
def test_e2e_bytes_equal_plane_path(rng, monkeypatch, preset):
    """The parity claim itself: fused2 encode bytes == plane encode bytes,
    for every covered preset, odd geometry included."""
    import dmmt_jpeg_encoder_tpu as dj

    px = _photo(rng, 52, 76)  # non-MCU-multiple both ways
    cfg = dj.EncoderConfig(
        chroma_subsampling=dj.ChromaSubsamplingPreset(preset)
    )
    monkeypatch.setenv("DMMT_P1", "plane")
    plane_bytes = dj.encode_array(px, 255, cfg)
    monkeypatch.setenv("DMMT_P1", "fused2")
    fused_bytes = dj.encode_array(px, 255, cfg)
    assert plane_bytes == fused_bytes


def test_fused2_actually_dispatches_the_kernel(rng, monkeypatch):
    """Dispatch-reached assertion (CLAUDE.md rule: every env-gated mode
    needs a call-counter test, not just output checks)."""
    import dmmt_jpeg_encoder_tpu as dj
    from dmmt_jpeg_encoder_tpu.ops import fused_arai as fa

    calls = []
    for name in ("fused_arai_phase1", "fused_arai_reference"):
        orig = getattr(fa, name)
        monkeypatch.setattr(
            fa, name,
            lambda *a, _o=orig, _n=name, **k: (calls.append(_n), _o(*a, **k))[1],
        )
    monkeypatch.setenv("DMMT_P1", "fused2")
    px = rng.integers(0, 256, (40, 72, 3), dtype=np.uint8)  # fresh geometry
    dj.encode_array(px, 255, dj.EncoderConfig())
    assert calls, "DMMT_P1=fused2 did not reach the fused_arai kernel"


def test_kernel_matches_oracle_wide_tile(rng, monkeypatch):
    """The shared DMMT_FUSED1_TILEW knob retiles the grid only."""
    monkeypatch.setenv("DMMT_FUSED1_TILEW", "512")
    r, g, b = _planes(rng, 144, 592)
    lq = jnp.asarray(rng.integers(1, 60, 64).astype(np.uint8))
    cq = jnp.asarray(rng.integers(1, 90, 64).astype(np.uint8))
    got = fused_arai_phase1(r, g, b, jnp.float32(255.0), lq, cq, 2, 2)
    want = fused_arai_reference(r, g, b, jnp.float32(255.0), lq, cq, 2, 2)
    for a, e in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(e))


def test_fused2_onedispatch_matches_plane_bytes(rng, monkeypatch):
    """One-dispatch program under fused2 == one-dispatch under plane."""
    from dmmt_jpeg_encoder_tpu import ChromaSubsamplingPreset, EncoderConfig
    from dmmt_jpeg_encoder_tpu.config import QuantizationTablePreset
    from dmmt_jpeg_encoder_tpu.onedispatch import (
        finish_one_dispatch,
        start_one_dispatch,
    )
    from dmmt_jpeg_encoder_tpu.tables import quantization_table_pair

    px = _photo(rng, 48, 64)
    cfg = EncoderConfig(chroma_subsampling=ChromaSubsamplingPreset.P420)
    lq, cq = quantization_table_pair(QuantizationTablePreset.SPECIFICATION)
    monkeypatch.setenv("DMMT_P1", "plane")
    plane = finish_one_dispatch(
        start_one_dispatch(px, 255, cfg, lq, cq), cfg
    )
    monkeypatch.setenv("DMMT_P1", "fused2")
    fused = finish_one_dispatch(
        start_one_dispatch(px, 255, cfg, lq, cq), cfg
    )
    assert plane[0] == fused[0]
    assert plane[1] == fused[1]

"""Fused phase-1 kernel (ops/fused_phase1.py, DMMT_P1=fused1).

Normalize/color/subsample/DCT/quantize as ONE Pallas kernel. Like
DMMT_P1=mxu it is not Arai-bit-exact (different f32 DCT summation
order); these tests pin (a) kernel == jnp oracle exactly in interpret
mode (including edge-tile masking), (b) end-to-end encodes decode at the
same PSNR as the parity path, (c) the oracle fallback off Pallas
backends, (d) the mode falls back to the exact path for presets the
kernel does not implement, (e) planar and interleaved inputs produce
identical bytes.
"""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from dmmt_jpeg_encoder_tpu.ops.fused_phase1 import (
    fused_phase1,
    fused_phase1_p420,
    fused_phase1_reference,
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
        (32, 512),    # shorter than one tile, two lane tiles
        (256, 768),   # multi-tile both ways
    ],
)
def test_kernel_matches_oracle(rng, h, w, rates):
    hr, vr = rates
    r, g, b = _planes(rng, h, w)
    lq = jnp.asarray(rng.integers(1, 60, 64).astype(np.uint8))
    cq = jnp.asarray(rng.integers(1, 90, 64).astype(np.uint8))
    got = fused_phase1(r, g, b, jnp.float32(255.0), lq, cq, hr, vr)
    want = fused_phase1_reference(
        r, g, b, jnp.float32(255.0), lq, cq, hr, vr
    )
    for a, e, name in zip(got, want, ("luma", "cb", "cr")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(e), name)


@pytest.mark.parametrize("tile_w", [256, 512])
def test_kernel_matches_oracle_tile_widths(rng, monkeypatch, tile_w):
    """DMMT_FUSED1_TILEW changes the grid/operand tiling only — outputs
    must stay exactly equal to the oracle at every width."""
    monkeypatch.setenv("DMMT_FUSED1_TILEW", str(tile_w))
    r, g, b = _planes(rng, 144, 592)  # edge tiles at both widths
    lq = jnp.asarray(rng.integers(1, 60, 64).astype(np.uint8))
    cq = jnp.asarray(rng.integers(1, 90, 64).astype(np.uint8))
    got = fused_phase1_p420(r, g, b, jnp.float32(255.0), lq, cq)
    want = fused_phase1_reference(r, g, b, jnp.float32(255.0), lq, cq)
    for a, e in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(e))


def test_tile_width_validation(monkeypatch):
    from dmmt_jpeg_encoder_tpu.ops.fused_phase1 import _tile_w

    monkeypatch.setenv("DMMT_FUSED1_TILEW", "384")
    with pytest.raises(ValueError):
        _tile_w()


def test_precision_knob_plumbs_and_validates(rng, monkeypatch):
    """DMMT_P1_PREC=high: kernel still == oracle (interpret mode runs on
    CPU where the hint is a no-op — this pins the PLUMBING; the numeric
    effect is hardware-A/B'd per ops/mxu_dct.p1_precision's note)."""
    import jax
    from dmmt_jpeg_encoder_tpu.ops.mxu_dct import p1_precision

    monkeypatch.setenv("DMMT_P1_PREC", "high")
    assert p1_precision() is jax.lax.Precision.HIGH
    r, g, b = _planes(rng, 64, 256)
    lq = jnp.asarray(np.full(64, 16, np.uint8))
    cq = jnp.asarray(np.full(64, 24, np.uint8))
    got = fused_phase1_p420(r, g, b, jnp.float32(255.0), lq, cq)
    want = fused_phase1_reference(r, g, b, jnp.float32(255.0), lq, cq)
    for a, e in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(e))
    monkeypatch.setenv("DMMT_P1_PREC", "medium")
    with pytest.raises(ValueError):
        p1_precision()


def test_kernel_matches_oracle_u16_maxval(rng):
    """16-bit samples + non-255 maxval flow through the same normalize."""
    r, g, b = _planes(rng, 64, 256, dtype=np.uint16, hi=1024)
    lq = jnp.asarray(np.full(64, 16, np.uint8))
    cq = jnp.asarray(np.full(64, 24, np.uint8))
    got = fused_phase1_p420(r, g, b, jnp.float32(1023.0), lq, cq)
    want = fused_phase1_reference(r, g, b, jnp.float32(1023.0), lq, cq)
    for a, e in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(e))


def _photo(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 60 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0)
    return np.clip(
        np.stack([base, base * 0.9 + 10, base * 1.1 - 8], axis=-1)
        + rng.normal(0, 3, (h, w, 3)),
        0, 255,
    ).astype(np.uint8)


@pytest.mark.parametrize("preset", ["P420", "P422", "P444"])
def test_e2e_fused1_mode_decodes(rng, monkeypatch, preset):
    PIL = pytest.importorskip("PIL.Image")
    import dmmt_jpeg_encoder_tpu as dj

    px = _photo(rng, 64, 80)
    img = dj.PPMImage(80, 64, 255, px)
    cfg = dj.EncoderConfig(
        chroma_subsampling=dj.ChromaSubsamplingPreset(preset)
    )

    def psnr(jpeg):
        dec = np.asarray(
            PIL.open(io.BytesIO(jpeg)).convert("RGB")
        ).astype(np.float64)
        mse = ((dec - px.astype(np.float64)) ** 2).mean()
        return 10 * np.log10(255**2 / mse)

    monkeypatch.setenv("DMMT_P1", "plane")
    p = psnr(dj.encode_ppm_image(img, cfg))
    monkeypatch.setenv("DMMT_P1", "fused1")
    f = psnr(dj.encode_ppm_image(img, cfg))
    assert abs(p - f) < 0.1, (p, f)
    assert f > 30


@pytest.mark.parametrize("preset", ["P420", "P422", "P444"])
def test_fused1_actually_dispatches_the_kernel(rng, monkeypatch, preset):
    """Dispatch-reached assertion (the DMMT_P1=mxu gate bug showed
    PSNR/byte tests pass on the WRONG path): encoding under fused1 must
    CALL the fused_phase1 entry point for every covered preset."""
    import dmmt_jpeg_encoder_tpu as dj
    from dmmt_jpeg_encoder_tpu.ops import fused_phase1 as fp1

    calls = []
    for name in ("fused_phase1", "fused_phase1_reference"):
        orig = getattr(fp1, name)
        monkeypatch.setattr(
            fp1, name,
            lambda *a, _o=orig, _n=name, **k: (calls.append(_n), _o(*a, **k))[1],
        )
    monkeypatch.setenv("DMMT_P1", "fused1")
    px = rng.integers(0, 256, (56, 88, 3), dtype=np.uint8)  # fresh geometry
    cfg = dj.EncoderConfig(
        chroma_subsampling=dj.ChromaSubsamplingPreset(preset)
    )
    dj.encode_array(px, 255, cfg)
    assert calls, f"DMMT_P1=fused1 did not reach the kernel for {preset}"


def test_fused1_without_pallas_uses_oracle(rng, monkeypatch):
    monkeypatch.delenv("DMMT_PALLAS_INTERPRET", raising=False)
    monkeypatch.setenv("DMMT_P1", "fused1")
    import dmmt_jpeg_encoder_tpu as dj
    from dmmt_jpeg_encoder_tpu.debug.jpeg_decoder import parse_jpeg

    px = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    jpeg = dj.encode_array(px, 255, dj.EncoderConfig())
    parsed = parse_jpeg(jpeg)
    assert (parsed.width, parsed.height) == (48, 32)


def test_fused1_falls_back_exactly_for_explicit_variant(rng, monkeypatch):
    """An explicit non-default DCT variant keeps the exact parity path —
    the bytes must be IDENTICAL to DMMT_P1=plane."""
    import dmmt_jpeg_encoder_tpu as dj
    from dmmt_jpeg_encoder_tpu.config import DCTVariant

    px = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    cfg = dj.EncoderConfig(
        chroma_subsampling=dj.ChromaSubsamplingPreset("P444"),
        dct_variant=DCTVariant.SEPARATED,
    )
    monkeypatch.setenv("DMMT_P1", "plane")
    plane_bytes = dj.encode_array(px, 255, cfg)
    monkeypatch.setenv("DMMT_P1", "fused1")
    fused_bytes = dj.encode_array(px, 255, cfg)
    assert plane_bytes == fused_bytes


def test_fused1_batch_matches_single(rng, monkeypatch):
    """The legacy fused-batch pipeline loops the fused1 kernel per image
    (no vmap over pallas_call); bytes must equal per-image encodes."""
    from dmmt_jpeg_encoder_tpu import (
        ChromaSubsamplingPreset, EncoderConfig, encode_array,
    )
    from dmmt_jpeg_encoder_tpu.encoder import _encode_batch_fused

    monkeypatch.setenv("DMMT_P1", "fused1")
    imgs = [_photo(rng, 32, 48) for _ in range(3)]
    cfg = EncoderConfig(
        chroma_subsampling=ChromaSubsamplingPreset.P420,
        scan_backend="device",
    )
    fused = _encode_batch_fused(imgs, 255, cfg)
    singles = [encode_array(px, 255, cfg) for px in imgs]
    assert fused == singles


def test_fused1_onedispatch_multi_matches_single(rng, monkeypatch):
    """start_one_dispatch_multi loops the program per image; fused1 must
    produce the same bytes as per-image one-dispatch."""
    import numpy as np

    from dmmt_jpeg_encoder_tpu import ChromaSubsamplingPreset, EncoderConfig
    from dmmt_jpeg_encoder_tpu.config import QuantizationTablePreset
    from dmmt_jpeg_encoder_tpu.onedispatch import (
        finish_one_dispatch,
        start_one_dispatch,
        start_one_dispatch_multi,
    )
    from dmmt_jpeg_encoder_tpu.tables import quantization_table_pair

    monkeypatch.setenv("DMMT_P1", "fused1")
    cfg = EncoderConfig(chroma_subsampling=ChromaSubsamplingPreset.P420)
    lq, cq = quantization_table_pair(QuantizationTablePreset.SPECIFICATION)
    stack = np.stack([_photo(rng, 32, 48) for _ in range(2)])
    multi = [
        finish_one_dispatch(st, cfg)
        for st in start_one_dispatch_multi(stack, 255, cfg, lq, cq)
    ]
    singles = [
        finish_one_dispatch(start_one_dispatch(px, 255, cfg, lq, cq), cfg)
        for px in stack
    ]
    assert multi == singles


@pytest.mark.parametrize("preset", ["P420", "P422", "P444"])
def test_fused1_onedispatch_planar_matches_interleaved(
    rng, monkeypatch, preset
):
    from dmmt_jpeg_encoder_tpu import ChromaSubsamplingPreset, EncoderConfig
    from dmmt_jpeg_encoder_tpu.config import QuantizationTablePreset
    from dmmt_jpeg_encoder_tpu.onedispatch import (
        finish_one_dispatch,
        start_one_dispatch,
    )
    from dmmt_jpeg_encoder_tpu.tables import quantization_table_pair

    monkeypatch.setenv("DMMT_P1", "fused1")
    px = _photo(rng, 48, 64)
    cfg = EncoderConfig(
        chroma_subsampling=ChromaSubsamplingPreset(preset)
    )
    lq, cq = quantization_table_pair(QuantizationTablePreset.SPECIFICATION)
    inter = finish_one_dispatch(
        start_one_dispatch(px, 255, cfg, lq, cq), cfg
    )
    planar = finish_one_dispatch(
        start_one_dispatch(
            np.ascontiguousarray(px.transpose(2, 0, 1)), 255, cfg, lq, cq
        ),
        cfg,
    )
    assert inter[0] == planar[0]
    assert inter[1] == planar[1]

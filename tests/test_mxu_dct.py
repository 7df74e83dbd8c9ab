"""MXU plane-DCT mode (ops/mxu_dct.py, DMMT_P1=mxu).

The opt-in phase-1 mode that rides the MXU (block-diagonal kron(I,C)
matmuls) instead of the VPU Arai butterflies. Not Arai-bit-exact by
design (different f32 summation order); these tests pin (a) kernel ==
jnp oracle exactly in interpret mode, (b) the oracle's quantized ints
stay within one ULP-flip of the SEPARATED matmul DCT, (c) end-to-end
encodes decode at the same PSNR as the parity path.
"""

import io
import os

import numpy as np
import jax.numpy as jnp
import pytest

from dmmt_jpeg_encoder_tpu.ops.mxu_dct import (
    mxu_dct_reference,
    plane_dct_quant_mxu,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("DMMT_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize(
    "h,w",
    [
        (128, 384),   # exactly one tile
        (136, 392),   # non-divisible edge tiles (mask path)
        (16, 16),     # smaller than one tile in both dims
        (256, 768),   # multi-tile
    ],
)
def test_kernel_matches_oracle(rng, h, w):
    plane = jnp.asarray(rng.normal(0, 50, (h, w)).astype(np.float32))
    q = jnp.asarray(rng.integers(1, 60, 64).astype(np.uint8))
    a = np.asarray(plane_dct_quant_mxu(plane, q))
    b = np.asarray(mxu_dct_reference(plane, q))
    np.testing.assert_array_equal(a, b)


def test_oracle_vs_separated_dct(rng):
    """Same DCT math as the SEPARATED variant: quantized integers agree
    except at exact .5 rounding boundaries (rare; bounded here)."""
    from dmmt_jpeg_encoder_tpu.config import DCTVariant
    from dmmt_jpeg_encoder_tpu.ops.dct import dct2d
    from dmmt_jpeg_encoder_tpu.ops.quantize import quantize_zigzag
    from dmmt_jpeg_encoder_tpu.tables import ZIGZAG

    h, w = 64, 128
    plane = jnp.asarray(rng.normal(0, 60, (h, w)).astype(np.float32))
    q = jnp.asarray(np.full(64, 17, np.uint8))
    ref_plane = np.asarray(mxu_dct_reference(plane, q))
    blocks = (
        ref_plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 64)[:, ZIGZAG]
    )
    sep = np.asarray(
        quantize_zigzag(
            dct2d(
                jnp.asarray(
                    np.asarray(plane)
                    .reshape(h // 8, 8, w // 8, 8)
                    .transpose(0, 2, 1, 3)
                    .reshape(-1, 8, 8)
                ),
                DCTVariant.SEPARATED,
            ),
            q,
        )
    )
    diff = np.abs(blocks.astype(np.int32) - sep.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.001


def test_e2e_mxu_mode_decodes(rng, monkeypatch):
    PIL = pytest.importorskip("PIL.Image")
    import dmmt_jpeg_encoder_tpu as dj

    yy, xx = np.mgrid[0:64, 0:80]
    base = 96 + 60 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0)
    px = np.clip(
        np.stack([base, base * 0.9 + 10, base * 1.1 - 8], axis=-1)
        + rng.normal(0, 3, (64, 80, 3)),
        0, 255,
    ).astype(np.uint8)
    img = dj.PPMImage(80, 64, 255, px)
    cfg = dj.EncoderConfig(
        chroma_subsampling=dj.ChromaSubsamplingPreset("P420")
    )

    def psnr(jpeg):
        dec = np.asarray(
            PIL.open(io.BytesIO(jpeg)).convert("RGB")
        ).astype(np.float64)
        mse = ((dec - px.astype(np.float64)) ** 2).mean()
        return 10 * np.log10(255**2 / mse)

    monkeypatch.setenv("DMMT_P1", "plane")
    p = psnr(dj.encode_ppm_image(img, cfg))
    monkeypatch.setenv("DMMT_P1", "mxu")
    m = psnr(dj.encode_ppm_image(img, cfg))
    assert abs(p - m) < 0.1, (p, m)
    assert m > 30


def test_mxu_mode_actually_dispatches_the_mxu_path(rng, monkeypatch):
    """Regression: the encode_blocks_from_planes mode gate excluded
    "mxu", so DMMT_P1=mxu silently ran the default blockize+ARAI path.
    PSNR-parity tests cannot catch that (both paths are correct
    encoders); assert the MXU DCT entry points are actually CALLED."""
    import dmmt_jpeg_encoder_tpu as dj
    from dmmt_jpeg_encoder_tpu.ops import mxu_dct

    calls = []
    for name in ("plane_dct_quant_mxu", "mxu_dct_reference"):
        orig = getattr(mxu_dct, name)
        monkeypatch.setattr(
            mxu_dct, name,
            lambda *a, _o=orig, _n=name, **k: (calls.append(_n), _o(*a, **k))[1],
        )
    monkeypatch.setenv("DMMT_P1", "mxu")
    px = rng.integers(0, 256, (40, 72, 3), dtype=np.uint8)  # fresh geometry
    dj.encode_array(px, 255, dj.EncoderConfig())
    assert calls, "DMMT_P1=mxu did not reach the MXU DCT path"


def test_mxu_mode_without_pallas_uses_oracle(rng, monkeypatch):
    """Off Pallas backends DMMT_P1=mxu routes through the jnp oracle and
    still produces a valid encode."""
    monkeypatch.delenv("DMMT_PALLAS_INTERPRET", raising=False)
    monkeypatch.setenv("DMMT_P1", "mxu")
    import dmmt_jpeg_encoder_tpu as dj
    from dmmt_jpeg_encoder_tpu.debug.jpeg_decoder import parse_jpeg

    px = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    jpeg = dj.encode_array(px, 255, dj.EncoderConfig())
    parsed = parse_jpeg(jpeg)
    assert (parsed.width, parsed.height) == (48, 32)

"""Fused phase 1: normalize -> RGB->YCbCr -> chroma subsample (per
preset rate; P444 skips it) -> 2-D DCT -> quantize, ONE Pallas kernel,
zero HBM intermediates.

The XLA phase-1 chain materializes the f32 Y/Cb/Cr planes (and the
subsampled chroma planes) in HBM between the color/subsample ops and the
DCT chain; PERF.md attributes ~2 ms/4K to that color/normalize/subsample
slice on top of the DCT itself. Here a [128, TILE_W] tile of the integer
R/G/B planes is loaded once into VMEM and everything up to the quantized
int16 coefficients happens in-register:

- color conversion (reference weights/order, src/color.rs:75-100) on the
  VPU, full-lane;
- the 2x2 Average chroma subsample as two exact one-hot f32 matmuls
  (row-pair sum+decimate D2, lane-pair sum+decimate S) — a stride-2 lane
  slice is a pathological relayout on TPU (ops/geometry.py), while the
  one-hots ride the MXU. Cell sum order: (tl+bl) + (tr+br), each pair an
  exact 2-term f32 add;
- the 2-D 8x8 DCT as block-diagonal kron(I, C) matmuls via dot_p1
  (ops/mxu_dct.py; default HIGHEST — a default-precision f32 matmul may
  take a single bf16 pass and truncate mantissas; DMMT_P1_PREC=high
  opts into a hand-written bf16x3 decomposition, since Mosaic cannot
  lower the HIGH dot precision);
- quantize (divide by the tiled table), round half away from zero
  (reference: src/image/writer/jpeg/quantizer.rs:53-63), cast int16.

Grid: one step per 128 input rows x TILE_W input lanes (TILE_W =
DMMT_FUSED1_TILEW, default 256, multiples of 256 — see _tile_w). The same
step writes the luma coefficient tile [128, TILE_W] and the Cb/Cr
coefficient tiles [64, TILE_W/2] (chroma rows 64*i .. 64*i+63 read exactly
input rows 128*i .. 128*i+127, so the blocking is self-contained; 64 and
TILE_W/2 are multiples of 8, keeping every 8-point DCT group inside one
tile).

NUMERICS: like DMMT_P1=mxu this is NOT Arai-bit-exact (different f32
summation order in the DCT; the subsample differs from the XLA path's
((tl+bl)+tr)+br by at most 1 ULP) — an opt-in throughput mode
(DMMT_P1=fused1), never the parity default. Output planes use the same
contract as ops/mxu_dct.py: int16, v = row % 8, u = lane % 8.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .dct import dct_matrix
from .mxu_dct import _cl_matrix as _cl16  # kron(I_16, C), shared
from .mxu_dct import dot_p1
from .quantize import round_half_away_from_zero as _round_half_away

_LEVEL_SHIFT = 128.0 / 255.0


def _tile_w() -> int:
    """Input lanes per grid step (DMMT_FUSED1_TILEW, default 256). Must
    be a multiple of 256: the chroma half-width tiles then stay exact
    128-lane chunks of the shared kron(I16, C) row-DCT operand. Baked
    into traced programs (utils/capability.trace_mode_key)."""
    tw = int(os.environ.get("DMMT_FUSED1_TILEW", "256"))
    if tw <= 0 or tw % 256:
        raise ValueError(
            f"DMMT_FUSED1_TILEW must be a positive multiple of 256, got {tw}"
        )
    return tw


@lru_cache(maxsize=1)
def _cl8() -> np.ndarray:
    """kron(I_8, C): column DCT of the eight 8-row chroma groups."""
    return np.kron(np.eye(8, dtype=np.float32), dct_matrix()).astype(
        np.float32
    )


@lru_cache(maxsize=1)
def _d2_rows() -> np.ndarray:
    """[64, 128] one-hot: out row j = in row 2j + in row 2j+1."""
    d = np.zeros((64, 128), np.float32)
    d[np.arange(64), np.arange(0, 128, 2)] = 1.0
    d[np.arange(64), np.arange(1, 128, 2)] = 1.0
    return d


@lru_cache(maxsize=4)
def _s_cols(tile_w: int) -> np.ndarray:
    """[tile_w, tile_w//2] one-hot: out lane c = in lane 2c + in lane
    2c+1. Lane pairs never straddle a tile boundary (tile_w is even)."""
    s = np.zeros((tile_w, tile_w // 2), np.float32)
    s[np.arange(0, tile_w, 2), np.arange(tile_w // 2)] = 1.0
    s[np.arange(1, tile_w, 2), np.arange(tile_w // 2)] = 1.0
    return s


def _dot_exact(a, b):
    """One-hot decimation sums (D2/S operands): these realize EXACT
    2-term adds and must stay exact at any DMMT_P1_PREC, so always the
    full-precision contraction (a bf16 split would re-associate the
    residuals and drift from the oracle's direct pair adds)."""
    return jnp.dot(
        a, b,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _to_f32(x):
    """Integer-plane load cast. Mosaic cannot lower unsigned -> float
    directly (lowering.py's _convert_helper raises on uint8 -> float32,
    hit on real hardware in round 3); route through int32 — exact for
    every sample dtype the encoder ingests (<= 32-bit values)."""
    if jnp.issubdtype(x.dtype, jnp.unsignedinteger):
        x = x.astype(jnp.int32)
    return x.astype(jnp.float32)


def _make_kernel(h: int, w: int, tile_w: int, hrate: int, vrate: int):
    import jax.experimental.pallas as pl

    n_chunks = tile_w // 128
    chroma_w = tile_w // hrate

    def kernel(
        r_ref, g_ref, b_ref, mv_ref,
        cl_ref, clt_ref, cl8_ref, d2_ref, s_ref,
        qly_ref, qlc_ref,
        oy_ref, ocb_ref, ocr_ref,
    ):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        inv = 1.0 / mv_ref[0, 0]
        r = _to_f32(r_ref[:]) * inv
        g = _to_f32(g_ref[:]) * inv
        b = _to_f32(b_ref[:]) * inv
        # Mask out-of-bounds rows/lanes of edge tiles to 0.0 (black = the
        # padder's value; also keeps unspecified OOB block padding from
        # poisoning the matmuls through NaN * 0).
        if h % 128 or w % tile_w:
            rows = jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
            lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
            ok = (rows + ti * 128 < h) & (lanes + tj * tile_w < w)
            r = jnp.where(ok, r, 0.0)
            g = jnp.where(ok, g, 0.0)
            b = jnp.where(ok, b, 0.0)
        # reference color math, left-to-right order (src/color.rs:75-100)
        y = (r * 0.299 + g * 0.587 + b * 0.114 - _LEVEL_SHIFT) * 255.0
        cb = (r * -0.1687 + g * -0.3312 + b * 0.5) * 255.0
        cr = (r * 0.5 + g * -0.4186 + b * -0.0813) * 255.0

        # luma: column DCT of all 16 groups, then row DCT per 128-chunk
        t1 = dot_p1(cl_ref[:], y)
        for c in range(n_chunks):
            sl = slice(c * 128, (c + 1) * 128)
            t2 = dot_p1(t1[:, sl], clt_ref[:])
            oy_ref[:, sl] = _round_half_away(t2 / qly_ref[:, sl]).astype(
                jnp.int16
            )

        # chroma: Average subsample per preset rate (one-hot matmuls:
        # vertical row-pair D2 when vrate=2, horizontal lane-pair S when
        # hrate=2 — P444 skips both), then DCT — column pass once on the
        # subsampled tile, row pass per 128-lane chunk (clt is
        # block-diagonal in 8x8 groups, so any aligned 128-lane chunk
        # multiplies against the same kron(I16, C) operand)
        colm_ref = cl8_ref if vrate == 2 else cl_ref
        for src, oref in ((cb, ocb_ref), (cr, ocr_ref)):
            ss = src
            if vrate == 2:
                ss = _dot_exact(d2_ref[:], ss)     # [64, TW]: tl+bl
            if hrate == 2:
                ss = _dot_exact(ss, s_ref[:])      # [.., TW/2]: +tr+br
            if hrate * vrate > 1:
                ss = ss * (1.0 / (hrate * vrate))
            t1c = dot_p1(colm_ref[:], ss)
            for c in range(chroma_w // 128):
                sl = slice(c * 128, (c + 1) * 128)
                t = dot_p1(t1c[:, sl], clt_ref[:])
                oref[:, sl] = _round_half_away(t / qlc_ref[:, sl]).astype(
                    jnp.int16
                )

    return kernel


def fused_phase1(
    r: jnp.ndarray,
    g: jnp.ndarray,
    b: jnp.ndarray,
    maxval: jnp.ndarray,
    luma_q: jnp.ndarray,
    chroma_q: jnp.ndarray,
    hrate: int = 2,
    vrate: int = 2,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Integer R/G/B planes [H, W] (MCU-padded: H, W multiples of
    8*vrate / 8*hrate) + maxval + raster uint8[64] tables ->
    (luma [H, W], cb/cr [H/vrate, W/hrate]) int16 quantized coefficient
    planes. (hrate, vrate): P444=(1,1), P422=(2,1), P420=(2,2)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert hrate in (1, 2) and vrate in (1, 2) and hrate >= vrate, (
        hrate, vrate,
    )
    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    tile_w = _tile_w()
    chroma_w = tile_w // hrate
    chroma_rows = 128 // vrate
    h, w = int(r.shape[0]), int(r.shape[1])
    assert h % (8 * vrate) == 0 and w % (8 * hrate) == 0, (h, w)
    cl = jnp.asarray(_cl16())
    qly = jnp.tile(
        luma_q.astype(jnp.float32).reshape(8, 8), (16, tile_w // 8)
    )
    qlc = jnp.tile(
        chroma_q.astype(jnp.float32).reshape(8, 8),
        (chroma_rows // 8, chroma_w // 8),
    )
    mv = jnp.asarray(maxval, jnp.float32).reshape(1, 1)
    grid = (pl.cdiv(h, 128), pl.cdiv(w, tile_w))
    plane_spec = pl.BlockSpec(
        (128, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )

    def const_spec(shape):
        return pl.BlockSpec(
            shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
        )

    chroma_spec = pl.BlockSpec(
        (chroma_rows, chroma_w), lambda i, j: (i, j),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _make_kernel(h, w, tile_w, hrate, vrate),
        grid=grid,
        in_specs=[
            plane_spec, plane_spec, plane_spec,
            pl.BlockSpec(
                (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            const_spec((128, 128)),           # CL
            const_spec((128, 128)),           # CL^T
            const_spec((64, 64)),             # CL8
            const_spec((64, 128)),            # D2
            const_spec((tile_w, tile_w // 2)),  # S
            const_spec((128, tile_w)),        # luma q tiled
            const_spec((chroma_rows, chroma_w)),  # chroma q tiled
        ],
        out_specs=[
            pl.BlockSpec(
                (128, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            chroma_spec,
            chroma_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.int16),
            jax.ShapeDtypeStruct((h // vrate, w // hrate), jnp.int16),
            jax.ShapeDtypeStruct((h // vrate, w // hrate), jnp.int16),
        ],
        cost_estimate=pl.CostEstimate(
            # HIGHEST f32 matmuls decompose into multiple bf16 passes;
            # dominated by the luma 2 x 128-MAC/element contractions.
            flops=2 * h * w * 256 * 8,
            bytes_accessed=h * w * (3 + 2)
            + (h // vrate) * (w // hrate) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(r, g, b, mv, cl, cl.T, jnp.asarray(_cl8()), jnp.asarray(_d2_rows()),
      jnp.asarray(_s_cols(tile_w)), qly, qlc)


def fused_phase1_p420(r, g, b, maxval, luma_q, chroma_q):
    """P420 alias (the original entry point)."""
    return fused_phase1(r, g, b, maxval, luma_q, chroma_q, 2, 2)


def fused_phase1_reference(
    r: jnp.ndarray,
    g: jnp.ndarray,
    b: jnp.ndarray,
    maxval: jnp.ndarray,
    luma_q: jnp.ndarray,
    chroma_q: jnp.ndarray,
    hrate: int = 2,
    vrate: int = 2,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """jnp oracle for the kernel (identical f32 math: same color op
    order, the same 2-term pair sums, the same dot_p1 DCT contractions).
    Used by tests and as the CPU fallback when Pallas is unavailable."""
    from .mxu_dct import mxu_dct_reference

    inv = 1.0 / jnp.asarray(maxval, jnp.float32)
    rf = r.astype(jnp.float32) * inv
    gf = g.astype(jnp.float32) * inv
    bf = b.astype(jnp.float32) * inv
    y = (rf * 0.299 + gf * 0.587 + bf * 0.114 - _LEVEL_SHIFT) * 255.0
    cb = (rf * -0.1687 + gf * -0.3312 + bf * 0.5) * 255.0
    cr = (rf * 0.5 + gf * -0.4186 + bf * -0.0813) * 255.0

    def subsample_pairs(chan):
        # kernel sum order: vertical pair first (tl+bl | tr+br), then
        # horizontal pair, then one scale — each pair an exact 2-term add
        h, w = chan.shape
        if vrate == 2:
            v = chan.reshape(h // 2, 2, w)
            chan = v[:, 0, :] + v[:, 1, :]
        if hrate == 2:
            p = chan.reshape(chan.shape[0], w // 2, 2)
            chan = p[:, :, 0] + p[:, :, 1]
        if hrate * vrate > 1:
            chan = chan * (1.0 / (hrate * vrate))
        return chan

    return (
        mxu_dct_reference(y, luma_q),
        mxu_dct_reference(subsample_pairs(cb), chroma_q),
        mxu_dct_reference(subsample_pairs(cr), chroma_q),
    )

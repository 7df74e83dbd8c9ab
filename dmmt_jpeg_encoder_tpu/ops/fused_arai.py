"""Fused ARAI-BIT-EXACT phase 1 (DMMT_P1=fused2): normalize ->
RGB->YCbCr -> chroma subsample -> Arai 2-D DCT -> quantize, ONE Pallas
kernel, zero HBM intermediates — with f32 results bit-identical to the
parity path (DMMT_P1=plane).

ops/fused_phase1.py (DMMT_P1=fused1) won its VMEM-residency throughput
A/B but computes the DCT as kron(I, C) MXU matmuls, whose f32 summation
order differs from the reference Arai dataflow
(/root/reference/src/cosine_transform/arai.rs:29-104) — so the fastest
mode could not satisfy the bit-exactness clause. This kernel keeps
fused1's structure (integer RGB tiles load once into VMEM; everything to
quantized int16 happens in-register) but replaces every non-parity op:

- normalize is a true f32 DIVISION by maxval (the parity chain's
  `astype(f32) / maxval`), not a reciprocal multiply;
- color conversion uses the exact rgb_to_ycbcr_planes expression order
  (reference: src/color.rs:75-100); elementwise f32 is layout-invariant;
- the Average subsample reproduces ops/geometry.subsample's summation
  order — P420: ((tl + bl) + tr) + br then /4.0, P422: (l + r) then /2.0
  — using exact one-hot row-parity copies (even/odd row extraction),
  lane rolls for the right neighbour, and an exact one-hot even-lane
  decimation. The roll is circular, but wrapped values only land on ODD
  lanes, which the even-lane decimation weights by exact 0.0;
- the 2-D DCT is the dense-roll Arai butterfly dataflow proven bit-exact
  in ops/pallas_dct.py (_dense_phases / _arai_butterfly / _recombine):
  identical f32 op ORDER to the plane path, so identical bits;
- quantize divides by the tiled table and rounds half away from zero
  (reference: src/image/writer/jpeg/transformer/quantizer.rs:53-63).

Tile geometry, grid, masking, and the output contract (int16 planes,
v = row % 8, u = lane % 8) are identical to ops/fused_phase1.fused_phase1;
the tile width knob is SHARED (DMMT_FUSED1_TILEW — already part of
utils/capability.trace_mode_key).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from .dct import _arai_butterfly, _arai_pass
from .fused_phase1 import _tile_w, _to_f32
from .pallas_dct import _dense_phases, _recombine
from .quantize import round_half_away_from_zero as _round_half_away

_LEVEL_SHIFT = 128.0 / 255.0


def _row_parity_onehots() -> tuple[np.ndarray, np.ndarray]:
    """[64, 128] one-hots: E picks even input rows, O odd — exact copies
    (one 1.0 per output row; 0.0 * finite == 0.0 contributes exactly 0)."""
    e = np.zeros((64, 128), np.float32)
    o = np.zeros((64, 128), np.float32)
    e[np.arange(64), np.arange(0, 128, 2)] = 1.0
    o[np.arange(64), np.arange(1, 128, 2)] = 1.0
    return e, o


def _even_lane_onehot(tile_w: int) -> np.ndarray:
    """[tile_w, tile_w//2] one-hot: out lane c copies in lane 2c (the
    matmul form of geometry._decimate_cols_matmul, per tile)."""
    s = np.zeros((tile_w, tile_w // 2), np.float32)
    s[np.arange(0, tile_w, 2), np.arange(tile_w // 2)] = 1.0
    return s


def _dot_exact(a, b):
    """Exact one-hot contraction (copy / 2-term-add operands only)."""
    return jnp.dot(
        a, b,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _arai_2d(x, qpat):
    """Dense-roll 2-D Arai + quantize on a [R, C] tile (R, C multiples of
    8): the ops/pallas_dct.py dataflow — bit-identical to the plane path."""
    import jax.lax as lax

    rr, cc = x.shape
    lane = lax.broadcasted_iota(jnp.int32, (rr, cc), 1) & 7
    sub = lax.broadcasted_iota(jnp.int32, (rr, cc), 0) & 7
    r = _recombine(_arai_butterfly(_dense_phases(x, 1)), lane, 1)
    c = _recombine(_arai_butterfly(_dense_phases(r, 0)), sub, 0)
    return _round_half_away(c / qpat).astype(jnp.int16)


def _make_kernel(h: int, w: int, tile_w: int, hrate: int, vrate: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(*refs):
        it = iter(refs)
        r_ref, g_ref, b_ref, mv_ref = (next(it) for _ in range(4))
        if vrate == 2:
            e_ref, o_ref = next(it), next(it)
        if hrate == 2:
            s_ref = next(it)
        qly_ref, qlc_ref, oy_ref, ocb_ref, ocr_ref = (
            next(it) for _ in range(5)
        )

        ti = pl.program_id(0)
        tj = pl.program_id(1)
        mv = mv_ref[0, 0]
        # parity normalize: true f32 division (pipeline.py's
        # `astype(f32) / maxval`), correctly rounded => layout-invariant
        r = _to_f32(r_ref[:]) / mv
        g = _to_f32(g_ref[:]) / mv
        b = _to_f32(b_ref[:]) / mv
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

        oy_ref[:] = _arai_2d(y, qly_ref[:])

        for src, oref in ((cb, ocb_ref), (cr, ocr_ref)):
            ss = src
            if vrate == 2:
                # geometry.subsample P420 order: ((tl+bl) + tr) + br.
                # Row-parity extraction via exact one-hot copies; the
                # right neighbour via a circular lane roll — wrapped
                # values land only on odd lanes, which the even-lane
                # decimation one-hot weights by exact 0.0.
                s0 = _dot_exact(e_ref[:], ss)         # even rows [64, TW]
                s1 = _dot_exact(o_ref[:], ss)         # odd rows
                tot = s0 + s1                          # tl + bl
                if hrate == 2:
                    s0r = pltpu.roll(s0, tile_w - 1, axis=1)   # tr
                    s1r = pltpu.roll(s1, tile_w - 1, axis=1)   # br
                    tot = (tot + s0r) + s1r
                    ss = _dot_exact(tot, s_ref[:]) / 4.0
                else:
                    ss = tot / 2.0
            elif hrate == 2:
                # geometry.subsample P422: (l + r) at even lanes, / 2.0
                rr = pltpu.roll(ss, tile_w - 1, axis=1)
                ss = _dot_exact(ss + rr, s_ref[:]) / 2.0
            oref[:] = _arai_2d(ss, qlc_ref[:])

    return kernel


def fused_arai_phase1(
    r: jnp.ndarray,
    g: jnp.ndarray,
    b: jnp.ndarray,
    maxval: jnp.ndarray,
    luma_q: jnp.ndarray,
    chroma_q: jnp.ndarray,
    hrate: int = 2,
    vrate: int = 2,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Integer R/G/B planes [H, W] (MCU-padded) + maxval + raster uint8[64]
    tables -> (luma [H, W], cb/cr [H/vrate, W/hrate]) int16 quantized
    coefficient planes, BIT-IDENTICAL to the DMMT_P1=plane parity path.
    (hrate, vrate): P444=(1,1), P422=(2,1), P420=(2,2)."""
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
    in_specs = [
        plane_spec, plane_spec, plane_spec,
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
    ]
    operands = [r, g, b, mv]
    if vrate == 2:
        e, o = _row_parity_onehots()
        in_specs += [const_spec((64, 128)), const_spec((64, 128))]
        operands += [jnp.asarray(e), jnp.asarray(o)]
    if hrate == 2:
        in_specs.append(const_spec((tile_w, tile_w // 2)))
        operands.append(jnp.asarray(_even_lane_onehot(tile_w)))
    in_specs += [const_spec((128, tile_w)), const_spec((chroma_rows, chroma_w))]
    operands += [qly, qlc]
    return pl.pallas_call(
        _make_kernel(h, w, tile_w, hrate, vrate),
        grid=grid,
        in_specs=in_specs,
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
            # VPU-dominated: ~2 x (29 adds + 13 muls + 22 rolls/selects)
            # full-width ops per pass pair, luma + 2 quarter-area chroma
            flops=int(h * w * 150 * 1.5),
            bytes_accessed=h * w * (3 + 2)
            + (h // vrate) * (w // hrate) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def fused_arai_reference(
    r: jnp.ndarray,
    g: jnp.ndarray,
    b: jnp.ndarray,
    maxval: jnp.ndarray,
    luma_q: jnp.ndarray,
    chroma_q: jnp.ndarray,
    hrate: int = 2,
    vrate: int = 2,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """jnp oracle / CPU fallback: the same parity math as the kernel (and
    as DMMT_P1=plane — geometry.subsample order, _arai_pass dataflow),
    returning plane-layout int16 coefficient planes."""
    mv = jnp.asarray(maxval, jnp.float32)
    rf = r.astype(jnp.float32) / mv
    gf = g.astype(jnp.float32) / mv
    bf = b.astype(jnp.float32) / mv
    y = (rf * 0.299 + gf * 0.587 + bf * 0.114 - _LEVEL_SHIFT) * 255.0
    cb = (rf * -0.1687 + gf * -0.3312 + bf * 0.5) * 255.0
    cr = (rf * 0.5 + gf * -0.4186 + bf * -0.0813) * 255.0

    def sub(chan):
        # geometry.subsample's exact order, rates static
        h, w = chan.shape
        if vrate == 1 and hrate == 1:
            return chan
        if vrate == 1:  # P422
            right = jnp.pad(chan[:, 1:], ((0, 0), (0, 1)))
            tot = chan + right
            return tot[:, ::2] / 2.0
        rows = chan.reshape(h // 2, 2, w)
        s0, s1 = rows[:, 0, :], rows[:, 1, :]
        if hrate == 1:
            return (s0 + s1) / 2.0
        s0r = jnp.pad(s0[:, 1:], ((0, 0), (0, 1)))
        s1r = jnp.pad(s1[:, 1:], ((0, 0), (0, 1)))
        tot = ((s0 + s1) + s0r) + s1r
        return tot[:, ::2] / 4.0

    def plane_arai_quant(plane, q):
        hh, ww = plane.shape
        rp = _arai_pass(plane.reshape(hh, ww // 8, 8), axis=-1)
        rp = rp.reshape(hh // 8, 8, ww // 8, 8)
        cp = _arai_pass(rp, axis=1)
        qv = q.astype(jnp.float32).reshape(8, 8)
        out = _round_half_away(cp / qv[None, :, None, :]).astype(jnp.int16)
        return out.reshape(hh, ww)

    return (
        plane_arai_quant(y, luma_q),
        plane_arai_quant(sub(cb), chroma_q),
        plane_arai_quant(sub(cr), chroma_q),
    )

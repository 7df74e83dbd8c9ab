"""MXU plane DCT: the 2-D 8x8 DCT as block-diagonal 128x128 matmuls.

The production Arai chain (reference op order, src/cosine_transform/
arai.rs:29-104) runs on the VPU with [..., 8]-minor operands — 8 of 128
lanes per op — and measures ~6x above pure op-bound at 4K; every XLA-level
full-lane restructuring lost to layout transitions through HBM (PERF.md).
This kernel takes the opposite route: keep the plane layout untouched and
ride the MXU instead of the VPU.

For a [128, W] tile of an image plane, the column DCT of all sixteen
8-row groups is ONE matmul with the block-diagonal matrix

    CL = kron(I_16, C)          (C = 8-point DCT-II matrix, dct.py)

and the row DCT of each 128-lane chunk is one matmul with CL^T on the
right. Quantization (divide by the [8, 8] table tiled over the plane),
round-half-away-from-zero (quantizer.rs:53-63), and the int16 cast fuse
into the same VMEM tile — zero HBM intermediates between DCT, quantizer,
and cast. FLOPs: 2 x 128 FMA/element on the MXU instead of ~17 VPU
ops/element at 1/16 lane utilization.

NUMERICS: mathematically this is the exact DCT-II (same normalization the
Arai scale factors realize), but the f32 summation order differs from the
Arai butterflies, so post-quantization integers can differ from the ARAI
path in the rare cases where a coefficient lands within f32 noise of a
.5 rounding boundary. It is therefore an OPT-IN phase-1 mode
(DMMT_P1=mxu), not the parity default; output remains a valid baseline
JPEG with identical PSNR character (tests bound the coefficient drift).

Output contract matches ops/pallas_dct.plane_dct_quant: int16 [H, W] in
plane layout (v = row % 8, u = lane % 8); the caller's existing int16
transpose/zigzag/entangle tail produces scan blocks.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .dct import dct_matrix
from .quantize import round_half_away_from_zero

TILE_W = 384  # 3 MXU lane chunks; divides both 3840 and 1920


def p1_precision() -> jax.lax.Precision:
    """Matmul precision for the MXU DCT modes (DMMT_P1_PREC env):
    "highest" (default) forces the full multi-pass f32 contraction the
    jnp oracles use; "high" is the bf16x3 decomposition — roughly half
    the MXU passes at near-f32 accuracy. Only meaningful inside the
    already-non-parity mxu/fused1 modes; baked into traced programs
    (utils/capability.trace_mode_key). NOTE: interpret-mode equality
    tests run on CPU where precision hints are no-ops, so "high" must be
    quality-checked on real hardware (decoded PSNR vs "highest")."""
    v = os.environ.get("DMMT_P1_PREC", "highest")
    if v not in ("high", "highest"):
        raise ValueError(
            f"DMMT_P1_PREC must be 'high' or 'highest', got {v!r}"
        )
    return (
        jax.lax.Precision.HIGH if v == "high" else jax.lax.Precision.HIGHEST
    )


def dot_p1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """DCT contraction at the DMMT_P1_PREC precision, Pallas-lowerable.

    Mosaic lowers only DEFAULT and HIGHEST dot precisions (its
    _dot_general_lowering_rule raises "Unsupported dot precision: HIGH"
    — hit on real hardware in round 3), so "high" is the bf16x3
    decomposition written out by hand: a ~= hi(a) + lo(a) with hi the
    bf16 rounding and lo the bf16-rounded residual, and

        a @ b ~= hi(a)@hi(b) + (lo(a)@hi(b) + hi(a)@lo(b))

    three single-pass bf16 MXU products with f32 accumulation versus
    HIGHEST's six (the lo@lo term is below f32 resolution). Shared by
    the Pallas kernels and the jnp oracles so the interpret-mode
    equality tests pin the exact same arithmetic."""
    if p1_precision() is jax.lax.Precision.HIGHEST:
        return jnp.dot(
            a, b,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    return d(a_hi, b_hi) + (d(a_lo, b_hi) + d(a_hi, b_lo))


@lru_cache(maxsize=1)
def _cl_matrix() -> np.ndarray:
    """kron(I_16, C): column DCT of sixteen 8-row groups at once."""
    return np.kron(np.eye(16, dtype=np.float32), dct_matrix()).astype(
        np.float32
    )


def _make_kernel(h: int, w: int):
    n_chunks = TILE_W // 128

    def kernel(x_ref, cl_ref, clt_ref, qb_ref, o_ref):
        i = jax.lax.broadcasted_iota  # noqa: F841 (doc: 2D iota only)
        import jax.experimental.pallas as pl

        ti = pl.program_id(0)
        tj = pl.program_id(1)
        x = x_ref[:]
        # Mask out-of-bounds rows/lanes of edge tiles to 0.0: OOB block
        # padding is unspecified and a NaN there would poison valid
        # outputs through the matmul's 0-entries (0 * NaN = NaN).
        if h % 128:
            rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            x = jnp.where(rows + ti * 128 < h, x, 0.0)
        if w % TILE_W:
            lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            x = jnp.where(lanes + tj * TILE_W < w, x, 0.0)
        # Explicit precision: Mosaic's default f32 matmul may run a
        # single bf16 pass, truncating the 24-bit mantissas of the DCT
        # operands (interpret-mode tests use CPU f32 and cannot catch
        # it). dot_p1 defaults to the exact multi-pass HIGHEST
        # contraction the jnp oracle uses; DMMT_P1_PREC=high opts into
        # the cheaper hand-written bf16x3 decomposition.
        t1 = dot_p1(cl_ref[:], x)
        for c in range(n_chunks):
            sl = slice(c * 128, (c + 1) * 128)
            t2 = dot_p1(t1[:, sl], clt_ref[:])
            scaled = t2 / qb_ref[:, sl]
            o_ref[:, sl] = round_half_away_from_zero(scaled).astype(
                jnp.int16
            )

    return kernel


def plane_dct_quant_mxu(
    plane: jnp.ndarray, qtable_raster: jnp.ndarray
) -> jnp.ndarray:
    """[H, W] f32 plane (H, W multiples of 8) + uint8[64] raster table ->
    int16 [H, W] quantized coefficient plane (v = row%8, u = lane%8)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = bool(os.environ.get("DMMT_PALLAS_INTERPRET"))
    h, w = int(plane.shape[0]), int(plane.shape[1])
    assert h % 8 == 0 and w % 8 == 0, (h, w)
    cl = jnp.asarray(_cl_matrix())
    q_big = jnp.tile(
        qtable_raster.astype(jnp.float32).reshape(8, 8), (16, TILE_W // 8)
    )
    grid = (pl.cdiv(h, 128), pl.cdiv(w, TILE_W))
    return pl.pallas_call(
        _make_kernel(h, w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((128, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, TILE_W), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (128, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int16),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * 256,
            bytes_accessed=h * w * 6 + 2 * 128 * 128 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(plane, cl, cl.T, q_big)


def mxu_dct_reference(
    plane: jnp.ndarray, qtable_raster: jnp.ndarray
) -> jnp.ndarray:
    """jnp oracle for the kernel (same contraction arithmetic at either
    DMMT_P1_PREC): used by tests; also the CPU fallback when Pallas is
    unavailable. The kernel's kron(I, C) rows add only exact zeros on
    top of each 8-term sum, so the oracle contracts per 8-group."""
    from .quantize import round_half_away_from_zero

    h, w = plane.shape
    c = jnp.asarray(dct_matrix())
    q = qtable_raster.astype(jnp.float32).reshape(8, 8)
    if p1_precision() is jax.lax.Precision.HIGHEST:
        x = plane.reshape(h // 8, 8, w // 8, 8)
        t = jnp.einsum(
            "vy,aybx,ux->avbu",
            c, x, c,
            precision=jax.lax.Precision.HIGHEST,
        )
        scaled = t / q[None, :, None, :]
        return (
            round_half_away_from_zero(scaled).astype(jnp.int16).reshape(h, w)
        )
    # HIGH: the same dot_p1 (bf16x3) contractions the kernel performs —
    # column pass C @ (8-row groups), then row pass (8-lane groups) @ C^T.
    xr = plane.reshape(h // 8, 8, w).transpose(1, 0, 2).reshape(8, -1)
    t1 = (
        dot_p1(c, xr).reshape(8, h // 8, w).transpose(1, 0, 2).reshape(h, w)
    )
    t2 = dot_p1(t1.reshape(h * (w // 8), 8), c.T).reshape(h, w)
    scaled = t2 / jnp.tile(q, (h // 8, w // 8))
    return round_half_away_from_zero(scaled).astype(jnp.int16)

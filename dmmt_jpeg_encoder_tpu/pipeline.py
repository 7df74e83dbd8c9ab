"""The single-chip encode pipeline.

Device core: ONE jit-compiled, static-shape XLA program from raw RGB
samples to (quantized zigzag coefficient blocks, symbol histograms):

    normalize -> pad -> RGB->YCbCr -> subsample -> blockize (luma directly
    into MCU-entangled order via a constant gather) -> batched 8x8 DCT ->
    quantize + zigzag -> DC DPCM -> histograms

This replaces the reference's lazy iterator chain + thread pool
(reference: src/image/writer/jpeg/transformer.rs:188-221) with batched
dataflow XLA fuses end to end. Everything after — Huffman table
construction, scan packing, container — is the thin host tail
(host_finalize / encoder.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .config import ChromaSubsamplingPreset, DCTVariant, EncoderConfig
from .ops.color import rgb_to_ycbcr
from .ops.dct import dct2d
from .ops.geometry import (
    blockize,
    entangle_permutation,
    entangled_blockize_p420,
    pad_to_mcu_multiple,
    padded_size,
    subsample,
)
from .ops.quantize import quantize_zigzag
from .entropy.categorize import dc_dpcm, symbol_histograms
from .utils.capability import mode_keyed_cache


@dataclass
class DeviceEncodeResult:
    """Pipeline outputs. Histograms are always host numpy (they gate the
    host-side Huffman build); the coefficient blocks may still be
    DEVICE-RESIDENT jax arrays so the device scan packer can consume them
    without a 25 MB round trip — np.asarray() them for host paths."""

    luma: np.ndarray      # int16 [NL, 64] zigzag, DC = DPCM delta, MCU order
    cb: np.ndarray        # int16 [NC, 64]
    cr: np.ndarray        # int16 [NC, 64]
    luma_dc_hist: np.ndarray    # int32 [16]
    luma_ac_hist: np.ndarray    # int32 [256]
    chroma_dc_hist: np.ndarray  # int32 [16]
    chroma_ac_hist: np.ndarray  # int32 [256]


def _plane_mode() -> str:
    """Phase-1 layout strategy for the ARAI path (DMMT_P1 env):

    - "plane" (default): run the Arai passes directly on PLANE layout —
      the 8-point axes come from FREE reshapes ([H,W] -> [H,B,8] and
      [A,8,B,8]), so the expensive f32 [N,8,8] blockize transpose never
      happens; only quantized int16 coefficients get shuffled, once.
    - "plane_mm": same, but the (v,u) interleave + zigzag are folded into
      exact MXU matmuls (identity/permutation one-hots at HIGHEST) before
      rounding, removing the int16 transpose too.
    - "plane2": keeps all 64 coefficient planes as separate full-lane
      [A, B] arrays through both butterfly passes and stacks once in
      zigzag order. MEASURED SLOWER than "plane" on TPU (85 vs 51 ms/4K:
      the 8 strided phase-slices + 64-way stack cost more than the
      [..., 8]-minor chain XLA fuses well); kept as a tested variant.
    - "pallas": the Arai+quantize chain as ONE Pallas kernel per plane
      (ops/pallas_dct.py) — dense phase rolls keep every op full-width,
      zero HBM intermediates; falls back to "plane" without a Pallas
      backend. Measured slightly SLOWER than "plane" on TPU (50 vs 46
      ms/4K phase 1: wide-row lane rotations beat XLA's fusion nowhere).
    - "mxu": the 2-D DCT as block-diagonal kron(I16, C) MXU matmuls
      (ops/mxu_dct.py). The ONLY mode that is NOT Arai-bit-exact: the
      f32 summation order differs, so quantized integers can flip at .5
      rounding boundaries — opt-in for throughput, never for parity.
    - "fused1": the whole phase 1 (normalize, color, preset-rate
      subsample, MXU DCT, quantize) as ONE Pallas kernel
      (ops/fused_phase1.py) — zero HBM intermediates between the integer
      RGB planes and the int16 coefficient planes. Same non-parity
      caveat as "mxu"; applies to every subsampling preset with the
      default (ARAI) DCT selection — explicit non-default variants fall
      back to "plane". Handled by the program builders (the color
      conversion itself moves in-kernel); this function treats it as
      "plane" for the post-color path.
    - "fused2": fused1's VMEM-resident single-kernel structure with the
      ARAI dense-roll dataflow and parity subsample/normalize order
      (ops/fused_arai.py) — BIT-IDENTICAL to "plane", with fused1's
      zero-HBM-intermediate phase 1. Same coverage/fallback rules as
      "fused1".
    - "block": the original blockize-first path.
    All modes except "mxu"/"fused1" produce bit-identical blocks (f32
    elementwise ops don't depend on vectorization layout; the matmuls
    are exact one-hots).
    """
    import os

    return os.environ.get("DMMT_P1", "plane")


# P_UV[u*8+v, j] = 1 iff zigzag position j reads raster (v, u) — the
# zigzag permutation re-based onto u-major flattening (what the plane_mm
# transpose-by-matmul produces).
def _zz_perm_uv() -> np.ndarray:
    from .tables import ZIGZAG

    p = np.zeros((64, 64), dtype=np.float32)
    for j in range(64):
        rast = int(ZIGZAG[j])
        v, u = rast // 8, rast % 8
        p[u * 8 + v, j] = 1.0
    return p


_P_UV = None


def _plane_dct_zigzag_blocks_fullwidth(
    plane: jnp.ndarray,
    qtable: jnp.ndarray,
    entangle_quads: bool,
) -> jnp.ndarray:
    """[H, W] f32 plane -> int16 [N, 64] zigzag blocks, Arai bit-exact,
    with every vector op FULL-WIDTH: the 64 (v, u) coefficient planes live
    as separate [A, B]-shaped arrays through both butterfly passes and
    quantization (a [..., 8]-minor layout uses 8 of 128 lanes per op — the
    row pass alone cost ~15 ms/4K that way). One strided read (the eight
    x-phase slices) and one strided write (the zigzag-ordered stack)
    bracket ~800 full-lane elementwise ops."""
    from .ops.dct import _arai_butterfly
    from .ops.quantize import round_half_away_from_zero
    from .tables import ZIGZAG

    hh, ww = plane.shape
    a, b = hh // 8, ww // 8
    p4 = plane.reshape(a, 8, b, 8)                    # [A, 8y, B, 8x] free
    xs = tuple(p4[:, :, :, x] for x in range(8))      # 8 x [A, 8y, B]
    us = _arai_butterfly(xs)                          # row pass (over x)
    q = qtable.astype(jnp.float32).reshape(8, 8)      # may be traced
    vals: dict[tuple[int, int], jnp.ndarray] = {}
    for u in range(8):
        ys = tuple(us[u][:, y, :] for y in range(8))  # 8 x [A, B]
        vs = _arai_butterfly(ys)                      # col pass (over y)
        for v in range(8):
            vals[(v, u)] = round_half_away_from_zero(
                vs[v] / q[v, u]
            ).astype(jnp.int16)
    zz_order = [divmod(int(ZIGZAG[j]), 8) for j in range(64)]
    blk = jnp.stack([vals[vu] for vu in zz_order], axis=-1)  # [A, B, 64]
    if entangle_quads:
        blk = blk.reshape(a // 2, 2, b // 2, 2, 64).transpose(0, 2, 1, 3, 4)
    return blk.reshape(-1, 64)


def _plane_dct_zigzag_blocks(
    plane: jnp.ndarray,
    qtable: jnp.ndarray,
    entangle_quads: bool,
    mode: str,
) -> jnp.ndarray:
    """[H, W] f32 plane -> int16 [N, 64] zigzag blocks. Arai bit-exact in
    every mode EXCEPT "mxu" (different f32 summation order — see
    ops/mxu_dct.py)."""
    global _P_UV
    from .ops.dct import _arai_pass
    from .ops.quantize import round_half_away_from_zero
    from .tables import ZIGZAG

    if mode == "plane2":
        return _plane_dct_zigzag_blocks_fullwidth(
            plane, qtable, entangle_quads
        )

    hh, ww = plane.shape
    a, b = hh // 8, ww // 8

    if mode in ("pallas", "mxu"):
        from .bitstream.device_pack import _use_pallas_pack

        if _use_pallas_pack() or mode == "mxu":
            if mode == "mxu":
                # MXU block-diagonal matmul DCT (ops/mxu_dct.py): opt-in,
                # not Arai-bit-exact (see its docstring); jnp oracle off
                # Pallas backends.
                from .ops.mxu_dct import mxu_dct_reference, plane_dct_quant_mxu

                if _use_pallas_pack():
                    rounded16 = plane_dct_quant_mxu(plane, qtable)
                else:
                    rounded16 = mxu_dct_reference(plane, qtable)
            else:
                from .ops.pallas_dct import plane_dct_quant

                rounded16 = plane_dct_quant(plane, qtable)  # i16 [H, W]
            return plane_to_zigzag_blocks(rounded16, entangle_quads)
        mode = "plane"  # no Pallas backend: identical jnp path

    r = _arai_pass(plane.reshape(hh, b, 8), axis=-1)   # rows: along x
    r = r.reshape(a, 8, b, 8)                          # [A, 8y, B, 8u] free
    c = _arai_pass(r, axis=1)                          # cols: [A, 8v, B, 8u]
    qv = qtable.astype(jnp.float32).reshape(8, 8)
    scaled = c / qv[None, :, None, :]

    if mode == "plane_mm":
        if _P_UV is None:
            _P_UV = _zz_perm_uv()
        eye = jnp.eye(8, dtype=jnp.float32)
        t = jnp.einsum(
            "avbu,vw->abuw", scaled, eye,
            precision=jax.lax.Precision.HIGHEST,
        )                                              # [A, B, 8u, 8v]
        zz = jnp.dot(
            t.reshape(-1, 64), jnp.asarray(_P_UV),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        out = round_half_away_from_zero(zz).astype(jnp.int16).reshape(a, b, 64)
    else:
        rounded = round_half_away_from_zero(scaled).astype(jnp.int16)
        blk = rounded.transpose(0, 2, 1, 3).reshape(-1, 64)  # raster 64
        out = blk[:, ZIGZAG].reshape(a, b, 64)

    if entangle_quads:
        # NOTE: folding this quad transpose into the (v,u)->block transpose
        # above (one 6D shuffle) measured 1.4 ms/4K SLOWER on TPU — XLA
        # handles the two simpler copies better. Keep them separate.
        out = out.reshape(a // 2, 2, b // 2, 2, 64).transpose(0, 2, 1, 3, 4)
    return out.reshape(-1, 64)


def plane_to_zigzag_blocks(
    rounded16: jnp.ndarray, entangle_quads: bool
) -> jnp.ndarray:
    """int16 coefficient PLANE (v = row%8, u = lane%8) -> int16 [N, 64]
    zigzag blocks, optionally in P420 MCU (quad) order. The shared tail
    of every plane-layout DCT mode."""
    from .tables import ZIGZAG

    hh, ww = rounded16.shape
    a, b = hh // 8, ww // 8
    blk = (
        rounded16.reshape(a, 8, b, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    )
    out = blk[:, ZIGZAG].reshape(a, b, 64)
    if entangle_quads:
        out = out.reshape(a // 2, 2, b // 2, 2, 64).transpose(0, 2, 1, 3, 4)
    return out.reshape(-1, 64)


def dc_dpcm_per_image(dc: jnp.ndarray, n_images: int) -> jnp.ndarray:
    """DC delta chains that RESET at image boundaries: a slab program
    (onedispatch.start_one_dispatch_slab) stacks n_images same-geometry
    images' rows into one tall image, so its block axis is the
    concatenation of per-image block sequences. Each image's chain starts
    from predictor 0 exactly as a standalone encode would
    (categorize.rs:156-161 semantics, per image)."""
    if n_images == 1:
        return dc_dpcm(dc)
    per = dc.shape[0] // n_images
    return jax.vmap(dc_dpcm)(dc.reshape(n_images, per)).reshape(-1)


def use_fused_phase1(
    preset: ChromaSubsamplingPreset, variant: DCTVariant
) -> bool:
    """True when DMMT_P1=fused1/fused2 applies: the fused phase-1 kernels
    cover every subsampling preset with the default (ARAI) DCT selection;
    explicit non-default DCT variants keep their exact paths."""
    return _plane_mode() in ("fused1", "fused2") and variant is DCTVariant.ARAI


def fused_phase1_zigzag_blocks(
    rgb_int: jnp.ndarray,
    maxval: jnp.ndarray,
    luma_q: jnp.ndarray,
    chroma_q: jnp.ndarray,
    height: int,
    width: int,
    planar: bool,
    preset: ChromaSubsamplingPreset = ChromaSubsamplingPreset.P420,
    n_images: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DMMT_P1=fused1 phase 1: integer RGB ([H, W, 3] or planar
    [3, H, W]) -> DPCM'd zigzag blocks via the ops/fused_phase1 kernel
    (jnp oracle off Pallas backends). Same output contract as
    encode_blocks_from_planes. n_images > 1: the input is a row-stacked
    slab of same-geometry images; DC chains reset per image."""
    from .bitstream.device_pack import _use_pallas_pack

    if _plane_mode() == "fused2":
        from .ops.fused_arai import (
            fused_arai_phase1 as kernel_fn,
            fused_arai_reference as oracle_fn,
        )
    else:
        from .ops.fused_phase1 import (
            fused_phase1 as kernel_fn,
            fused_phase1_reference as oracle_fn,
        )

    ph, pw = padded_size(height, width, preset)
    if planar:
        planes = (rgb_int[0], rgb_int[1], rgb_int[2])
    else:
        planes = (rgb_int[..., 0], rgb_int[..., 1], rgb_int[..., 2])
    if (ph, pw) != (height, width):
        # black padding in the integer domain: 0 / maxval == 0.0 exactly
        planes = tuple(
            jnp.pad(p, ((0, ph - height), (0, pw - width))) for p in planes
        )
    fn = kernel_fn if _use_pallas_pack() else oracle_fn
    y_c, cb_c, cr_c = fn(
        *planes, maxval, luma_q, chroma_q,
        preset.horizontal_rate, preset.vertical_rate,
    )
    entangle = preset is ChromaSubsamplingPreset.P420
    luma_zz = plane_to_zigzag_blocks(y_c, entangle)
    cb_zz = plane_to_zigzag_blocks(cb_c, False)
    cr_zz = plane_to_zigzag_blocks(cr_c, False)
    luma_zz = luma_zz.at[:, 0].set(dc_dpcm_per_image(luma_zz[:, 0], n_images))
    cb_zz = cb_zz.at[:, 0].set(dc_dpcm_per_image(cb_zz[:, 0], n_images))
    cr_zz = cr_zz.at[:, 0].set(dc_dpcm_per_image(cr_zz[:, 0], n_images))
    return luma_zz, cb_zz, cr_zz


def encode_blocks_from_planes(
    y: jnp.ndarray,
    cb: jnp.ndarray,
    cr: jnp.ndarray,
    luma_q: jnp.ndarray,
    chroma_q: jnp.ndarray,
    preset: ChromaSubsamplingPreset,
    variant: DCTVariant,
    entangle: np.ndarray | None,
    n_images: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared tail from YCbCr planes to DPCM'd zigzag blocks.

    Factored out so the sharded (shard_map) pipeline can reuse it per
    shard. n_images > 1: the planes are a row-stacked slab of
    same-geometry images; DC chains reset per image.
    """
    mode = _plane_mode()
    if mode in ("fused1", "fused2"):
        # callers land here only when the fused phase-1 kernel does not
        # apply (non-default DCT variant, or the sharded/batch tail): use
        # the default exact plane path, as documented in _plane_mode
        mode = "plane"
    if variant is DCTVariant.ARAI and mode in (
        "plane", "plane_mm", "plane2", "pallas", "mxu"
    ):
        luma_zz = _plane_dct_zigzag_blocks(
            y, luma_q, entangle is not None, mode
        )
        # ONE chroma chain: Cb/Cr stacked vertically run the identical
        # per-8x8-block math (rows stay block-aligned), halving the
        # chroma chain's XLA kernel launches; split back after (raster
        # block order = all Cb rows then all Cr rows)
        cbcr = jnp.concatenate(
            [subsample(cb, preset), subsample(cr, preset)], axis=0
        )
        cbcr_zz = _plane_dct_zigzag_blocks(cbcr, chroma_q, False, mode)
        nc = cbcr_zz.shape[0] // 2
        cb_zz = cbcr_zz[:nc]
        cr_zz = cbcr_zz[nc:]
    else:
        if entangle is not None:
            # P420: straight to MCU-quad order via reshape/transpose
            luma_blocks = entangled_blockize_p420(y)
        else:
            luma_blocks = blockize(y)
        cb_blocks = blockize(subsample(cb, preset))
        cr_blocks = blockize(subsample(cr, preset))

        if variant is DCTVariant.FUSED:
            from .ops.fused import fused_dct_quantize_zigzag

            luma_zz = fused_dct_quantize_zigzag(luma_blocks, luma_q)
            cb_zz = fused_dct_quantize_zigzag(cb_blocks, chroma_q)
            cr_zz = fused_dct_quantize_zigzag(cr_blocks, chroma_q)
        else:
            luma_zz = quantize_zigzag(dct2d(luma_blocks, variant), luma_q)
            cb_zz = quantize_zigzag(dct2d(cb_blocks, variant), chroma_q)
            cr_zz = quantize_zigzag(dct2d(cr_blocks, variant), chroma_q)

    luma_zz = luma_zz.at[:, 0].set(dc_dpcm_per_image(luma_zz[:, 0], n_images))
    cb_zz = cb_zz.at[:, 0].set(dc_dpcm_per_image(cb_zz[:, 0], n_images))
    cr_zz = cr_zz.at[:, 0].set(dc_dpcm_per_image(cr_zz[:, 0], n_images))
    return luma_zz, cb_zz, cr_zz


def build_pipeline_fn(
    height: int,
    width: int,
    preset: ChromaSubsamplingPreset,
    variant: DCTVariant,
):
    """The raw (unjitted) device program for a HxW image: uint16 RGB ->
    (zigzag blocks x3, histograms x4). Static-shape, jit/shard-ready."""
    ph, pw = padded_size(height, width, preset)
    entangle = entangle_permutation(pw // 8, ph // 8, preset)

    def pipeline(rgb_u16, maxval, luma_q, chroma_q):
        if use_fused_phase1(preset, variant):
            luma_zz, cb_zz, cr_zz = fused_phase1_zigzag_blocks(
                rgb_u16, maxval, luma_q, chroma_q, height, width,
                planar=False, preset=preset,
            )
        else:
            rgb = rgb_u16.astype(jnp.float32) / maxval
            rgb = pad_to_mcu_multiple(rgb, preset)
            y, cb, cr = rgb_to_ycbcr(rgb)
            luma_zz, cb_zz, cr_zz = encode_blocks_from_planes(
                y, cb, cr, luma_q, chroma_q, preset, variant, entangle
            )
        l_dc, l_ac = symbol_histograms(luma_zz)
        # chroma histograms are consumed summed: one exact pass over the
        # concatenated Cb/Cr blocks instead of two
        c_dc, c_ac = symbol_histograms(
            jnp.concatenate([cb_zz, cr_zz], axis=0)
        )
        return (
            luma_zz,
            cb_zz,
            cr_zz,
            l_dc,
            l_ac,
            c_dc,
            c_ac,
        )

    return pipeline


@mode_keyed_cache(maxsize=32)
def _compiled_pipeline(
    height: int,
    width: int,
    preset: ChromaSubsamplingPreset,
    variant: DCTVariant,
):
    return jax.jit(build_pipeline_fn(height, width, preset, variant))


@mode_keyed_cache(maxsize=16)
def _compiled_pipeline_batch(
    height: int,
    width: int,
    preset: ChromaSubsamplingPreset,
    variant: DCTVariant,
):
    """One dispatch for B images: the per-image block pipeline is vmapped,
    then per-image histograms run as GROUPED Pallas kernels (a pallas_call
    cannot sit under vmap, and grouped grids are faster anyway)."""
    from .entropy.categorize import batched_symbol_histograms

    ph, pw = padded_size(height, width, preset)
    entangle = entangle_permutation(pw // 8, ph // 8, preset)

    def core(rgb_u16, maxval, luma_q, chroma_q):
        rgb = rgb_u16.astype(jnp.float32) / maxval
        rgb = pad_to_mcu_multiple(rgb, preset)
        y, cb, cr = rgb_to_ycbcr(rgb)
        return encode_blocks_from_planes(
            y, cb, cr, luma_q, chroma_q, preset, variant, entangle
        )

    def batched(rgb_u16, maxval, luma_q, chroma_q):
        if use_fused_phase1(preset, variant):
            # the fused kernel's pallas_call can't sit under vmap; a
            # static Python loop launches the same B kernels (grid steps
            # serialize on the single TensorCore anyway) and keeps batch
            # bytes identical to per-image fused1 encodes
            per = [
                fused_phase1_zigzag_blocks(
                    rgb_u16[i], maxval, luma_q, chroma_q, height, width,
                    planar=False, preset=preset,
                )
                for i in range(rgb_u16.shape[0])
            ]
            luma_zz, cb_zz, cr_zz = (
                jnp.stack([p[j] for p in per]) for j in range(3)
            )
        else:
            luma_zz, cb_zz, cr_zz = jax.vmap(
                core, in_axes=(0, None, None, None)
            )(rgb_u16, maxval, luma_q, chroma_q)
        l_dc, l_ac = batched_symbol_histograms(luma_zz)
        # chroma histograms are consumed summed: one pass on concat Cb/Cr
        c_dc, c_ac = batched_symbol_histograms(
            jnp.concatenate([cb_zz, cr_zz], axis=1)
        )
        return (
            luma_zz,
            cb_zz,
            cr_zz,
            l_dc,
            l_ac,
            c_dc,
            c_ac,
        )

    return jax.jit(batched)


def run_device_pipeline_batch(
    pixels: np.ndarray,
    maxval: int,
    config: EncoderConfig,
    luma_q: np.ndarray,
    chroma_q: np.ndarray,
):
    """[B, H, W, 3] -> batched DeviceEncodeResult-like tuple of jax arrays:
    (luma [B,NL,64], cb, cr, dc/ac histograms [B,...])."""
    height, width = int(pixels.shape[1]), int(pixels.shape[2])
    fn = _compiled_pipeline_batch(
        height, width, config.chroma_subsampling, config.dct_variant
    )
    return fn(
        jnp.asarray(pixels),
        jnp.float32(maxval),
        jnp.asarray(luma_q),
        jnp.asarray(chroma_q),
    )


def run_device_pipeline(
    pixels: np.ndarray,
    maxval: int,
    config: EncoderConfig,
    luma_q: np.ndarray,
    chroma_q: np.ndarray,
) -> DeviceEncodeResult:
    """Execute the jitted pipeline and materialize outputs on host."""
    height, width = int(pixels.shape[0]), int(pixels.shape[1])
    fn = _compiled_pipeline(
        height, width, config.chroma_subsampling, config.dct_variant
    )
    outputs = fn(
        jnp.asarray(pixels),
        jnp.float32(maxval),
        jnp.asarray(luma_q),
        jnp.asarray(chroma_q),
    )
    # Everything stays device-resident; dispatch is asynchronous, so the
    # caller can issue further work before the first histogram fetch
    # (HuffmanTables.from_histograms) synchronizes.
    return DeviceEncodeResult(
        luma=outputs[0],
        cb=outputs[1],
        cr=outputs[2],
        luma_dc_hist=outputs[3],
        luma_ac_hist=outputs[4],
        chroma_dc_hist=outputs[5],
        chroma_ac_hist=outputs[6],
    )

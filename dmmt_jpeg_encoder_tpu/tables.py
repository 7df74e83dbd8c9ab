"""Quantization table presets and the zigzag permutation.

These are data constants, not code: the tables are published quantization
matrices (JPEG Annex K, plus perceptual-tuning tables from the literature)
that the reference also compiles in
(reference: src/image/writer/jpeg/quantization_tables.rs:8-230).
The zigzag index table matches
src/image/writer/jpeg/transformer/frequency_block.rs:1-6.
"""

from __future__ import annotations

import numpy as np

from .config import QuantizationTablePreset

# Scan order: ZIGZAG[k] = raster index of the k-th zigzag coefficient.
ZIGZAG = np.array(
    [
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

# Inverse permutation: INVERSE_ZIGZAG[raster] = zigzag position.
INVERSE_ZIGZAG = np.argsort(ZIGZAG).astype(np.int32)

# --- Quantization tables (raster order, uint8) --------------------------------

# JPEG Annex K (libjpeg / vips default).
SPECIFICATION_LUMA = np.array(
    [
        16,  11,  10,  16,  24,  40,  51,  61,
        12,  12,  14,  19,  26,  58,  60,  55,
        14,  13,  16,  24,  40,  57,  69,  56,
        14,  17,  22,  29,  51,  87,  80,  62,
        18,  22,  37,  56,  68, 109, 103,  77,
        24,  35,  55,  64,  81, 104, 113,  92,
        49,  64,  78,  87, 103, 121, 120, 101,
        72,  92,  95,  98, 112, 100, 103,  99,
    ],
    dtype=np.uint8,
)

SPECIFICATION_CHROMA = np.array(
    [
        17,  18,  24,  47,  99,  99,  99,  99,
        18,  21,  26,  66,  99,  99,  99,  99,
        24,  26,  56,  99,  99,  99,  99,  99,
        47,  66,  99,  99,  99,  99,  99,  99,
        99,  99,  99,  99,  99,  99,  99,  99,
        99,  99,  99,  99,  99,  99,  99,  99,
        99,  99,  99,  99,  99,  99,  99,  99,
        99,  99,  99,  99,  99,  99,  99,  99,
    ],
    dtype=np.uint8,
)

FLAT_LUMA = np.full(64, 16, dtype=np.uint8)
FLAT_CHROMA = np.full(64, 16, dtype=np.uint8)

# Tuned for MSSIM on the Kodak image set.
MSSIM_KODAK_LUMA = np.array(
    [
        12,  17,  20,  21,  30,  34,  56,  63,
        18,  20,  20,  26,  28,  51,  61,  55,
        19,  20,  21,  26,  33,  58,  69,  55,
        26,  26,  26,  30,  46,  87,  86,  66,
        31,  33,  36,  40,  46,  96, 100,  73,
        40,  35,  46,  62,  81, 100, 111,  91,
        46,  66,  76,  86, 102, 121, 120, 101,
        68,  90,  90,  96, 113, 102, 105, 103,
    ],
    dtype=np.uint8,
)

MSSIM_KODAK_CHROMA = np.array(
    [
         8,  12,  15,  15,  86,  96,  96,  98,
        13,  13,  15,  26,  90,  96,  99,  98,
        12,  15,  18,  96,  99,  99,  99,  99,
        17,  16,  90,  96,  99,  99,  99,  99,
        96,  96,  99,  99,  99,  99,  99,  99,
        99,  99,  99,  99,  99,  99,  99,  99,
        99,  99,  99,  99,  99,  99,  99,  99,
        99,  99,  99,  99,  99,  99,  99,  99,
    ],
    dtype=np.uint8,
)

# Tuned for PSNR-HVS-M on the Kodak image set.
PSNR_HVS_N_KODAK_LUMA = np.array(
    [
         9,  10,  12,  14,  27,  32,  51,  62,
        11,  12,  14,  19,  27,  44,  59,  73,
        12,  14,  18,  25,  42,  59,  79,  78,
        17,  18,  25,  42,  61,  92,  87,  92,
        23,  28,  42,  75,  79, 112, 112,  99,
        40,  42,  59,  84,  88, 124, 132, 111,
        42,  64,  78,  95, 105, 126, 125,  99,
        70,  75, 100, 102, 116, 100, 107,  98,
    ],
    dtype=np.uint8,
)

PSNR_HVS_N_KODAK_CHROMA = np.array(
    [
         9,  10,  17,  19,  62,  89,  91,  97,
        12,  13,  18,  29,  84,  91,  88,  98,
        14,  19,  29,  93,  95,  95,  98,  97,
        20,  26,  84,  88,  95,  95,  98,  94,
        26,  86,  91,  93,  97,  99,  98,  99,
        99, 100,  98,  99,  99,  99,  99,  99,
        99,  99,  99,  99,  99,  99,  99,  99,
        97,  97,  99,  99,  99,  99,  97,  99,
    ],
    dtype=np.uint8,
)

# DCTune Perceptual Optimization of Compressed Dental X-Rays (1997)
# Watson, Taylor, Borthwick.
DCTUNE_LUMA = np.array(
    [
          7,   8,  10,  14,  23,  44,  95, 241,
          8,   8,  11,  15,  25,  47, 102, 255,
         10,  11,  13,  19,  31,  58, 127, 255,
         14,  15,  19,  27,  44,  83, 181, 255,
         23,  25,  31,  44,  72, 136, 255, 255,
         44,  47,  58,  83, 136, 255, 255, 255,
         95, 102, 127, 181, 255, 255, 255, 255,
        241, 255, 255, 255, 255, 255, 255, 255,
    ],
    dtype=np.uint8,
)
DCTUNE_CHROMA = DCTUNE_LUMA.copy()

# A Visual Detection Model for DCT Coefficient Quantization (1993)
# Ahumada, Watson, Peterson.
A_VISUAL_DETECTION_LUMA = np.array(
    [
        15, 11, 11, 12, 15, 19, 25, 32,
        11, 13, 10, 10, 12, 15, 19, 24,
        11, 10, 14, 14, 16, 18, 22, 27,
        12, 10, 14, 18, 21, 24, 28, 33,
        15, 12, 16, 21, 26, 31, 36, 42,
        19, 15, 18, 24, 31, 38, 45, 53,
        25, 19, 22, 28, 36, 45, 55, 65,
        32, 24, 27, 33, 42, 53, 65, 77,
    ],
    dtype=np.uint8,
)
A_VISUAL_DETECTION_CHROMA = A_VISUAL_DETECTION_LUMA.copy()

# An Improved Detection Model for DCT Coefficient Quantization (1993)
# Peterson, Ahumada, Watson.
AN_IMPROVED_DETECTION_LUMA = np.array(
    [
        14,  10,  11,  14,  19,  25,  34,  45,
        10,  11,  11,  12,  15,  20,  26,  33,
        11,  11,  15,  18,  21,  25,  31,  38,
        14,  12,  18,  24,  28,  33,  39,  47,
        19,  15,  21,  28,  36,  43,  51,  59,
        25,  20,  25,  33,  43,  54,  64,  74,
        34,  26,  31,  39,  51,  64,  77,  91,
        45,  33,  38,  47,  59,  74,  91, 108,
    ],
    dtype=np.uint8,
)
AN_IMPROVED_DETECTION_CHROMA = AN_IMPROVED_DETECTION_LUMA.copy()

_PRESET_TABLES: dict[QuantizationTablePreset, tuple[np.ndarray, np.ndarray]] = {
    QuantizationTablePreset.SPECIFICATION: (SPECIFICATION_LUMA, SPECIFICATION_CHROMA),
    QuantizationTablePreset.FLAT: (FLAT_LUMA, FLAT_CHROMA),
    QuantizationTablePreset.MSSIM_KODAK_TUNED: (MSSIM_KODAK_LUMA, MSSIM_KODAK_CHROMA),
    QuantizationTablePreset.PSNR_HVS_N_KODAK_TUNED: (
        PSNR_HVS_N_KODAK_LUMA,
        PSNR_HVS_N_KODAK_CHROMA,
    ),
    QuantizationTablePreset.DCTUNE_PERCEPTUAL_OPTIMIZATION: (
        DCTUNE_LUMA,
        DCTUNE_CHROMA,
    ),
    QuantizationTablePreset.A_VISUAL_DETECTION_MODEL: (
        A_VISUAL_DETECTION_LUMA,
        A_VISUAL_DETECTION_CHROMA,
    ),
    QuantizationTablePreset.AN_IMPROVED_DETECTION_MODEL: (
        AN_IMPROVED_DETECTION_LUMA,
        AN_IMPROVED_DETECTION_CHROMA,
    ),
}


def quantization_table_pair(
    preset: QuantizationTablePreset,
    quality: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Return (luma_table, chroma_table) in raster order, uint8[64]
    (reference: quantization_tables.rs:286-326 `to_pair`).

    `quality` (1..100) applies the standard IJG scaling to the preset pair
    — an extension over the reference (which has fixed presets only) that
    enables quality sweeps: q<50 scales by 5000/q %, q>=50 by 200-2q %,
    clamped to 1..255; q=50 reproduces the base tables exactly."""
    luma, chroma = _PRESET_TABLES[preset]
    if quality is None:
        return luma.copy(), chroma.copy()
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for t in (luma, chroma):
        scaled = (t.astype(np.int64) * scale + 50) // 100
        out.append(np.clip(scaled, 1, 255).astype(np.uint8))
    return out[0], out[1]

"""Host orchestration: full PPM -> JPEG encode.

The TPU-native counterpart of the reference's `convert_ppm_to_jpeg`
(reference: src/lib.rs:59-77) and JpegImageWriter
(src/image/writer/jpeg.rs:41-75): device pipeline -> per-image optimal
Huffman tables (from device histograms) -> native scan packing -> JFIF
container assembly.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from .bitstream.packer import encode_scan
from .config import EncoderConfig
from .container import assemble_jpeg
from .huffman.canonical import flat_code_arrays
from .huffman.spec import SymbolCodeLength, code_lengths_from_histogram
from .io.ppm import PPMImage, read_ppm, read_ppm_bytes
from .pipeline import DeviceEncodeResult, run_device_pipeline
from .tables import quantization_table_pair


@dataclass
class HuffmanTables:
    """The four per-image code-length lists (descending length order),
    the OutputImage fields of the reference (src/image/writer/jpeg.rs:77-88)."""

    luma_dc: list[SymbolCodeLength]
    luma_ac: list[SymbolCodeLength]
    chroma_dc: list[SymbolCodeLength]
    chroma_ac: list[SymbolCodeLength]

    @classmethod
    def from_histograms(cls, result: DeviceEncodeResult) -> "HuffmanTables":
        return cls(
            luma_dc=code_lengths_from_histogram(result.luma_dc_hist),
            luma_ac=code_lengths_from_histogram(result.luma_ac_hist),
            chroma_dc=code_lengths_from_histogram(result.chroma_dc_hist),
            chroma_ac=code_lengths_from_histogram(result.chroma_ac_hist),
        )


def pack_scan(
    result: DeviceEncodeResult,
    tables: HuffmanTables,
    config: EncoderConfig,
    use_native: bool = True,
) -> bytes:
    return encode_scan(
        result.luma,
        result.cb,
        result.cr,
        config.chroma_subsampling.luma_blocks_per_mcu,
        flat_code_arrays(tables.luma_dc),
        flat_code_arrays(tables.luma_ac),
        flat_code_arrays(tables.chroma_dc),
        flat_code_arrays(tables.chroma_ac),
        use_native=use_native,
    )


def encode_array(
    pixels: np.ndarray,
    maxval: int = 255,
    config: EncoderConfig | None = None,
    use_native: bool = True,
) -> bytes:
    """uint16 RGB [H, W, 3] samples -> complete JPEG bytes."""
    config = config or EncoderConfig()
    if config.num_shards > 1:
        from .parallel.sharding import run_sharded_pipeline

        result = run_sharded_pipeline(pixels, maxval, config)
    else:
        luma_q, chroma_q = quantization_table_pair(config.quantization_preset)
        result = run_device_pipeline(pixels, maxval, config, luma_q, chroma_q)
    luma_q, chroma_q = quantization_table_pair(config.quantization_preset)
    tables = HuffmanTables.from_histograms(result)
    scan = pack_scan(result, tables, config, use_native=use_native)
    return assemble_jpeg(
        width=int(pixels.shape[1]),
        height=int(pixels.shape[0]),
        bits_per_channel=config.bits_per_channel,
        preset=config.chroma_subsampling,
        luma_quant=luma_q,
        chroma_quant=chroma_q,
        luma_dc=tables.luma_dc,
        luma_ac=tables.luma_ac,
        chroma_dc=tables.chroma_dc,
        chroma_ac=tables.chroma_ac,
        scan_bytes=scan,
    )


def encode_ppm_image(
    image: PPMImage, config: EncoderConfig | None = None, use_native: bool = True
) -> bytes:
    return encode_array(image.pixels, image.maxval, config, use_native=use_native)


def encode_ppm_bytes(data: bytes, config: EncoderConfig | None = None) -> bytes:
    return encode_ppm_image(read_ppm_bytes(data), config)


def convert_ppm_to_jpeg(
    input_file: str | Path,
    output_file: str | Path,
    config: EncoderConfig | None = None,
) -> None:
    """File-to-file encode (reference: src/lib.rs:59-77)."""
    image = read_ppm(input_file)
    jpeg = encode_ppm_image(image, config)
    Path(output_file).write_bytes(jpeg)

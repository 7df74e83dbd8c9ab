"""JFIF/JPEG container writer.

Emits exactly the segment sequence and field values of the reference encoder
(reference: src/image/writer/jpeg/encoder.rs:125-262):

    SOI
    APP0  (JFIF 1.02, density unit 0, 72x72, no thumbnail)
    DQT   luma id 0, then DQT chroma id 1 — two segments, zigzag order
    SOF0  (precision, height, width, 3 components; Y sampling h<<4|v,
           Cb/Cr 0x11; quant ids 0/1/1)
    DHT x4 in the order LumaAC(0x11), LumaDC(0x00), ChromaAC(0x13),
          ChromaDC(0x02)
    SOS   (Y -> DC table 0 / AC table 1; Cb,Cr -> DC 2 / AC 3;
           spectral selection 0..0x3F)
    entropy-coded scan (byte-stuffed, 1-padded)
    EOI

Segment length field = 2 + len(content), i.e. it covers itself, which is the
standard JPEG convention (and numerically equals the reference's
marker-length + content-length computation, encoder.rs:137-147).
No DRI/RST markers are emitted, matching the reference.
"""

from __future__ import annotations

import numpy as np

from .config import ChromaSubsamplingPreset
from .errors import SegmentTooLong
from .huffman.spec import SymbolCodeLength
from .huffman.canonical import dht_payload
from .tables import ZIGZAG
from .utils.segment_log import log_segment

SOI = b"\xff\xd8"
EOI = b"\xff\xd9"
APP0_MARKER = b"\xff\xe0"
DQT_MARKER = b"\xff\xdb"
SOF0_MARKER = b"\xff\xc0"
DHT_MARKER = b"\xff\xc4"
SOS_MARKER = b"\xff\xda"

# DHT class/id bytes (reference: src/image/writer/jpeg/encoder.rs:78-89)
TABLE_LUMA_DC = 0x00
TABLE_LUMA_AC = 0x11
TABLE_CHROMA_DC = 0x02
TABLE_CHROMA_AC = 0x13


def segment(marker: bytes, content: bytes) -> bytes:
    """Marker + u16 length (2+len(content)) + content, with hexdump logging."""
    seg_len = len(marker) + len(content)
    if seg_len > 0xFFFF:
        raise SegmentTooLong(
            f"The length of the segment '{marker.hex()}' is greater than u16::MAX"
        )
    length_bytes = seg_len.to_bytes(2, "big")
    log_segment(marker, content, length_bytes)
    return marker + length_bytes + content


def app0_jfif() -> bytes:
    content = bytes(
        [
            0x4A, 0x46, 0x49, 0x46, 0x00,  # "JFIF\0"
            0x01, 0x02,                    # version 1.02
            0x00,                          # density unit
            0x00, 0x48, 0x00, 0x48,        # 72 x 72
            0x00, 0x00,                    # no thumbnail
        ]
    )
    return segment(APP0_MARKER, content)


def dqt(table_id: int, table_raster: np.ndarray) -> bytes:
    """One DQT segment; the 64 entries are emitted in zigzag order
    (reference: encoder.rs:190-209)."""
    zigzagged = np.asarray(table_raster, dtype=np.uint8)[ZIGZAG]
    return segment(DQT_MARKER, bytes([table_id]) + zigzagged.tobytes())


def sof0(
    width: int,
    height: int,
    bits_per_channel: int,
    preset: ChromaSubsamplingPreset,
) -> bytes:
    ratio = (preset.horizontal_rate << 4) | preset.vertical_rate
    content = bytes(
        [
            bits_per_channel,
            (height >> 8) & 0xFF, height & 0xFF,
            (width >> 8) & 0xFF, width & 0xFF,
            0x03,
            0x01, ratio, 0x00,  # Y: sampling, quant table 0
            0x02, 0x11, 0x01,   # Cb
            0x03, 0x11, 0x01,   # Cr
        ]
    )
    return segment(SOF0_MARKER, content)


def dht(table_class_and_id: int, code_lengths: list[SymbolCodeLength]) -> bytes:
    return segment(DHT_MARKER, dht_payload(table_class_and_id, code_lengths))


def sos() -> bytes:
    content = bytes(
        [
            0x03,
            0x01, 0x01,  # Y: DC table 0, AC table 1
            0x02, 0x23,  # Cb: DC table 2, AC table 3
            0x03, 0x23,  # Cr
            0x00, 0x3F, 0x00,  # spectral selection 0..63, approximation 0
        ]
    )
    return segment(SOS_MARKER, content)


def assemble_jpeg(
    width: int,
    height: int,
    bits_per_channel: int,
    preset: ChromaSubsamplingPreset,
    luma_quant: np.ndarray,
    chroma_quant: np.ndarray,
    luma_dc: list[SymbolCodeLength],
    luma_ac: list[SymbolCodeLength],
    chroma_dc: list[SymbolCodeLength],
    chroma_ac: list[SymbolCodeLength],
    scan_bytes: bytes,
) -> bytes:
    """Concatenate the full JFIF file (reference: encoder.rs:125-135)."""
    parts = [
        SOI,
        app0_jfif(),
        dqt(0, luma_quant),
        dqt(1, chroma_quant),
        sof0(width, height, bits_per_channel, preset),
        dht(TABLE_LUMA_AC, luma_ac),
        dht(TABLE_LUMA_DC, luma_dc),
        dht(TABLE_CHROMA_AC, chroma_ac),
        dht(TABLE_CHROMA_DC, chroma_dc),
        sos(),
        scan_bytes,
        EOI,
    ]
    return b"".join(parts)

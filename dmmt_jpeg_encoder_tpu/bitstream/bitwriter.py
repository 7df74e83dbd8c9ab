"""MSB-first bit accumulator and JPEG byte stuffing.

Same behavior as the reference's BitWriter (reference: src/binary_stream.rs:6-97):
bits are accumulated most-significant-first; on flush, a partial final byte
is padded with 1-bits when `flush_with_ones` (the JPEG entropy-scan mode,
reference: src/image/writer/jpeg/encoder.rs:267) or 0-bits otherwise.

byte_stuff() is the SegmentMarkerInjector equivalent
(reference: src/image/writer/jpeg/segment_marker_injector.rs:14-30):
every 0xFF byte in the entropy stream is followed by 0x00.
"""

from __future__ import annotations


class BitWriter:
    def __init__(self, flush_with_ones: bool = False):
        self._out = bytearray()
        self._acc = 0  # bit accumulator, MSB side first
        self._nbits = 0
        self._flush_ones = flush_with_ones

    def write_bits(self, value: int, count: int) -> None:
        """Append the low `count` bits of `value`, MSB first."""
        if count == 0:
            return
        self._acc = (self._acc << count) | (value & ((1 << count) - 1))
        self._nbits += count
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_bytes(self, data: bytes) -> None:
        for b in data:
            self.write_bits(b, 8)

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            fill = (1 << pad) - 1 if self._flush_ones else 0
            self._out.append(((self._acc << pad) | fill) & 0xFF)
            self._acc = 0
            self._nbits = 0

    def getvalue(self) -> bytes:
        return bytes(self._out)

    @property
    def bit_length(self) -> int:
        return len(self._out) * 8 + self._nbits


def byte_stuff(data: bytes) -> bytes:
    """Insert 0x00 after every 0xFF (entropy-scan marker escaping)."""
    return data.replace(b"\xff", b"\xff\x00")

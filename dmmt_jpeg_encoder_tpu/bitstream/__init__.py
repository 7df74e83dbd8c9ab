"""Bitstream assembly: MSB-first bit writing, byte stuffing, scan packing.

The device pipeline produces fixed-shape coefficient tensors; turning them
into the variable-length entropy-coded scan is inherently serial byte
emission, which runs on host — in native C when available
(bitstream/csrc/scan_encoder.c via ctypes), with a pure-Python/numpy
fallback that is bit-identical.
"""

from .bitwriter import BitWriter, byte_stuff
from .packer import encode_scan

__all__ = ["BitWriter", "byte_stuff", "encode_scan"]

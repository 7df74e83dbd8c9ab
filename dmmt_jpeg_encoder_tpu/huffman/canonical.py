"""Canonical codeword assignment and DHT payload layout.

Matches the reference translator (reference: src/huffman/encoder.rs:33-157):

- Input: SymbolCodeLength list sorted DESCENDING by length (the output order
  of spec.code_lengths_from_histogram). Validated like encoder.rs:75-103.
- Assignment walks the list in REVERSE (shortest code first): the shortest
  code gets the all-zero pattern; each following codeword is
  `previous_pattern + (1 << (16 - previous_length))` in MSB-aligned u16
  space (encoder.rs:97-119). This is canonical Huffman built from 0 upward,
  and combined with the +1 bump it leaves the all-ones pattern unused.
- DHT payload: 16 per-length counts followed by the symbols in REVERSED
  list order == ascending code length (encoder.rs:170-181), which is the
  same order the canonical assignment used, so standard JPEG decoders
  reconstruct identical codes.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..errors import (
    HuffmanCodeTooLong,
    HuffmanDuplicateSymbol,
    HuffmanError,
    HuffmanUnsortedInput,
)
from .spec import SymbolCodeLength

MAX_CODE_BITS = 16


@dataclass(frozen=True)
class CodeWord:
    """An MSB-aligned 16-bit codeword (reference: src/huffman/encoder.rs:8-30)."""

    pattern: int  # MSB-aligned in 16 bits
    length: int

    @property
    def bits(self) -> int:
        """Right-aligned codeword value (the `length` top bits of pattern)."""
        return self.pattern >> (MAX_CODE_BITS - self.length) if self.length else 0


def _validate(code_lengths: list[SymbolCodeLength]) -> None:
    if not code_lengths:
        raise HuffmanError("the set of input symbols must not be empty")
    if len(code_lengths) > 256:
        raise HuffmanError("can't encode more than 256 different symbols")
    lengths = [c.length for c in code_lengths]
    if any(lengths[i] < lengths[i + 1] for i in range(len(lengths) - 1)):
        raise HuffmanUnsortedInput(
            "symbols-array needs to be sorted by descending code word length"
        )
    if lengths[0] > MAX_CODE_BITS:
        raise HuffmanCodeTooLong(
            f"maximum code word length allowed in input is {MAX_CODE_BITS} bits"
        )


def canonical_codes(code_lengths: list[SymbolCodeLength]) -> dict[int, CodeWord]:
    """Symbol -> CodeWord lookup for a descending-length code list."""
    _validate(code_lengths)
    table: dict[int, CodeWord] = {}
    pattern = 0
    prev_length = None
    for entry in reversed(code_lengths):
        if entry.symbol in table:
            raise HuffmanDuplicateSymbol(
                f"symbol {entry.symbol} is encountered for the second time "
                "in the set of input symbols"
            )
        if prev_length is not None:
            pattern += 1 << (MAX_CODE_BITS - prev_length)
            if pattern > 0xFFFF:
                raise HuffmanError("canonical code space exhausted")
        table[entry.symbol] = CodeWord(pattern=pattern, length=entry.length)
        prev_length = entry.length
    return table


def dht_payload(table_class_and_id: int, code_lengths: list[SymbolCodeLength]) -> bytes:
    """DHT segment content: class/id byte, 16 length counts, symbols
    (reference: src/image/writer/jpeg/encoder.rs:92-98 + 169-181)."""
    counts = [0] * MAX_CODE_BITS
    for entry in code_lengths:
        if not (1 <= entry.length <= MAX_CODE_BITS):
            raise HuffmanCodeTooLong(
                f"code length {entry.length} outside 1..=16 for symbol {entry.symbol}"
            )
        counts[entry.length - 1] += 1
    symbols = [entry.symbol for entry in reversed(code_lengths)]
    return bytes([table_class_and_id, *counts, *symbols])


def flat_code_arrays(
    code_lengths: list[SymbolCodeLength],
) -> tuple[list[int], list[int]]:
    """(codes[256], lengths[256]) right-aligned lookup arrays for fast packing.

    Symbols without a codeword get length 0 (an encode-time error to use).
    """
    codes = [0] * 256
    lens = [0] * 256
    for sym, cw in canonical_codes(code_lengths).items():
        codes[sym] = cw.bits
        lens[sym] = cw.length
    return codes, lens

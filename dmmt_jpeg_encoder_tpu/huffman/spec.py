"""From symbol histograms to JPEG code-length lists.

Replicates the reference's table-construction pipeline exactly
(reference: src/image/writer/jpeg/transformer/symbol_counting.rs:25-94):

1. Histogram -> (symbol, frequency) pairs in ascending symbol order,
   frequencies == 0 dropped (symbol_counting.rs:25-32).
2. Stable sort ascending by frequency (ties keep symbol order;
   symbol_counting.rs:92-94 uses Rust's stable sort_by_key).
3. Package-merge with limit 15 (symbol_counting.rs:85-90).
4. `lengths[0] += 1`: the longest code is extended by one bit, which
   reserves the all-ones codeword (the JPEG convention that no codeword is
   all 1-bits, so 1-padding can never form a valid symbol).

The result list is ordered ascending by frequency == descending by code
length, which is exactly the order the canonical assigner and the DHT
emitter consume.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .package_merge import package_merge_lengths


@dataclass
class SymbolCodeLength:
    """A (symbol, code length) pair (reference: src/huffman.rs:9-36)."""

    symbol: int
    length: int


def symbol_frequencies(histogram: np.ndarray) -> list[tuple[int, int]]:
    """Histogram -> (symbol, freq) pairs, freq>0, stable-sorted by freq ascending."""
    pairs = [(int(s), int(f)) for s, f in enumerate(histogram) if f > 0]
    pairs.sort(key=lambda p: p[1])  # python sort is stable, like Rust's
    return pairs


def code_lengths_from_histogram(histogram: np.ndarray) -> list[SymbolCodeLength]:
    """Build the final code-length list (with the +1 all-ones bump applied)."""
    pairs = symbol_frequencies(histogram)
    if not pairs:
        return []
    lengths = package_merge_lengths([f for _, f in pairs], 15)
    out = [SymbolCodeLength(sym, ln) for (sym, _), ln in zip(pairs, lengths)]
    out[0].length += 1
    return out

"""Length-limited Huffman code lengths via package-merge (Larmore-Hirschberg).

Behavioral contract matches the reference generator
(reference: src/huffman/length_limited.rs:33-134) including its tie-breaking:

- Input frequencies must be sorted ascending; output lengths align with the
  input order (lengths[0] belongs to the least frequent symbol and is the
  longest code).
- Nodes order as (frequency, kind) with Leaf < Package on equal frequency
  (length_limited.rs:7-27 derives Ord on (frequency, kind) with Leaf first).
- Each level merges the previous level pairwise (dropping an odd trailing
  node, chunks_exact(2)) and re-sorts together with the original leaves
  (length_limited.rs:96-109).
- The solution walk starts from `code_length - 1` packages at the deepest
  level and counts leaves among the first 2*packages nodes of each level
  (length_limited.rs:75-89, 111-133).
"""

from __future__ import annotations

from ..errors import HuffmanDepthOverflow, HuffmanUnsortedInput

_LEAF = 0
_PACKAGE = 1


def package_merge_lengths(sorted_frequencies: list[int], limit: int) -> list[int]:
    """Compute code lengths (<= limit) for frequencies sorted ascending.

    Returns a list of lengths aligned with the input: index 0 = least
    frequent symbol = longest code.
    """
    n = len(sorted_frequencies)
    if n == 0:
        return []
    if any(
        sorted_frequencies[i] > sorted_frequencies[i + 1] for i in range(n - 1)
    ):
        raise HuffmanUnsortedInput("Frequencies must be sorted in ascending order")
    if n > (1 << limit):
        raise HuffmanDepthOverflow(
            f"Tree of depth limit {limit} can not hold {n} code words"
        )

    leaves = [(f, _LEAF) for f in sorted_frequencies]

    # Level 0 is the plain leaf list; levels 1..limit-1 fold in pairwise
    # packages of the level before (length_limited.rs:63-73).
    levels: list[list[tuple[int, int]]] = [list(leaves)]
    for _ in range(1, limit):
        prev = levels[-1]
        merged = [
            (prev[i][0] + prev[i + 1][0], _PACKAGE)
            for i in range(0, len(prev) - 1, 2)
        ]
        levels.append(sorted(merged + leaves))

    lengths = [0] * n
    num_packages = n - 1
    for level in reversed(levels):
        taken = level[: 2 * num_packages]
        leaves_taken = sum(1 for _, kind in taken if kind == _LEAF)
        num_packages = len(taken) - leaves_taken
        for i in range(leaves_taken):
            lengths[i] += 1
    return lengths

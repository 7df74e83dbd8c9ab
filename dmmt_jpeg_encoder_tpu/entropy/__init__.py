"""Device-side entropy analysis: DC DPCM, magnitude categories, AC
run-length structure, and symbol histograms."""

from .categorize import (
    ac_symbols_and_structure,
    dc_dpcm,
    magnitude_category,
    symbol_histograms,
)

__all__ = [
    "ac_symbols_and_structure",
    "dc_dpcm",
    "magnitude_category",
    "symbol_histograms",
]

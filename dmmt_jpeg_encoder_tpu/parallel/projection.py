"""Projected multi-chip scaling model (real-TPU, from measured slab fits).

Real multi-chip hardware is not reachable in this environment (one
tunneled chip), so the honest scaling statement is a MODEL with measured
inputs, not a virtual-CPU-mesh wall clock (which measures XLA:CPU
collective emulation and nothing else — round 3's MULTICHIP artifact
recorded a misleading 5% headline that way).

Model: an n-chip encode runs the one-dispatch program on a 1/n MCU-row
slab per shard. Measured single-chip program floors fit

    T(rows) ~= FIXED_MS + PER_ROW_US * rows / 1000

where FIXED_MS is the per-PROGRAM fixed slice (device table build's
fixed-size sorts, pack-kernel sweeps, dispatch) and the linear term is
the row-proportional work. Collectives are noise at this scale (~2.2 KB
histogram psum + 12 B DC ppermute + stream/n all_gather, ~0.02 ms on ICI
— PERF.md "Projected multi-chip scaling" itemizes them), so the model
adds a flat COLLECTIVE_MS.

SLAB BATCHING (onedispatch.start_one_dispatch_slab) stacks B
same-geometry images' rows in ONE program, so the fixed slice is paid
once per B images:

    T_per_image(n, B) = (FIXED_MS + PER_ROW_US * B * rows_per_shard
                         / 1000) / B + COLLECTIVE_MS

Efficiency(n, B) = T_per_image(1, 1) / (n * T_per_image(n, B)).

Constants below are the round-4 measured fit (driver bench + ab_round4
slab floors at 4K, plane+fused-hist parity mode); refresh them when the
floors move. The fit quality and raw points live in PERF.md.
"""

from __future__ import annotations

# Measured on the real chip (pipelined floors, 4K width 3840, P420,
# spec tables; PERF.md "Projected multi-chip scaling").
FIXED_MS = 3.2        # per-program fixed slice
PER_ROW_US = 5.05     # per input row (width 3840)
COLLECTIVE_MS = 0.02  # psum + ppermute + segment all_gather on ICI


def projected_time_per_image_ms(
    rows: int, n_chips: int, slab_b: int = 1,
    fixed_ms: float = FIXED_MS, per_row_us: float = PER_ROW_US,
) -> float:
    """Projected per-image program time with the image's rows split over
    n_chips and slab_b same-geometry images batched per shard program."""
    rows_per_shard = -(-rows // n_chips)
    t_program = fixed_ms + per_row_us * slab_b * rows_per_shard / 1000.0
    per_image = t_program / slab_b
    if n_chips > 1:
        per_image += COLLECTIVE_MS
    return per_image


def projected_scaling_table(
    rows: int = 2160,
    width: int = 3840,
    slab_b: int = 1,
    chips: tuple = (1, 2, 4, 8),
    fixed_ms: float = FIXED_MS,
    per_row_us: float = PER_ROW_US,
) -> list[dict]:
    """One row per mesh size: projected per-image ms, Mpix/s, and
    efficiency vs n * single-chip-single-image."""
    t1 = projected_time_per_image_ms(rows, 1, 1, fixed_ms, per_row_us)
    out = []
    for n in chips:
        t = projected_time_per_image_ms(
            rows, n, slab_b, fixed_ms, per_row_us
        )
        out.append(
            {
                "chips": n,
                "slab_b": slab_b,
                "proj_ms_per_image": round(t, 2),
                "proj_mpix_per_s": round(rows * width / 1e6 * 1e3 / t, 1),
                "proj_efficiency": round(t1 / (n * t), 3),
            }
        )
    return out

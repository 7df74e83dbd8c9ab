"""Projected multi-chip scaling model (real-TPU, from measured floors).

Real multi-chip hardware is not reachable in this environment (one
tunneled chip), so the honest scaling statement is a MODEL with measured
inputs, not a virtual-CPU-mesh wall clock (which measures XLA:CPU
collective emulation and nothing else — round 3's MULTICHIP artifact
recorded a misleading 5% headline that way).

Model: an n-chip encode runs the one-dispatch program on a 1/n MCU-row
slab per shard; SLAB BATCHING (onedispatch.start_one_dispatch_slab /
parallel/sharding.start_sharded_encode_slab) row-stacks B same-geometry
images per shard program, so per-shard fixed costs are paid once per B
images:

    T_per_image(n, B) = T_program(B * rows / n) / B + COLLECTIVE_MS

with T_program taken from MEASURED single-chip one-dispatch floors by
piecewise-linear interpolation — NOT a parametric fit. Round 3 fit
T(h) ~= 3.2 ms + 5.05 us/row to the h <= 2160 points and extrapolated;
round 4's 4320-row measurement broke it (T(4320) == 2 * T(2160): the
marginal per-row cost RISES past ~2160 rows, eating exactly the fixed
slice the fit promised back — PERF.md "Round 4: the slab A/B"). The
interpolation reproduces every measured point by construction; meshes we
project stay inside or within a few rows of the measured range (n=8 at
B=1 evaluates 270 rows, 2 rows below the smallest measured point — the
edge segment's slope extrapolates there).

Collectives are noise at this scale (~2.2 KB histogram psum + 12 B DC
ppermute + stream/n all_gather, ~0.02 ms on ICI — PERF.md "Projected
multi-chip scaling" itemizes them), so the model adds a flat
COLLECTIVE_MS.

Efficiency(n, B) = T_per_image(1, 1) / (n * T_per_image(n, B)).

The measured points below are the round-3 job-103 height sweep plus the
round-4 idle-host 4K/8K floors (width 3840, P420, spec tables, parity
plane+fused-hist mode, pipelined floors per PERF.md measurement
discipline); refresh them when the floors move.
"""

from __future__ import annotations

# (rows, ms) one-dispatch program floors measured on the real chip,
# IDLE host, parity plane mode (round-4 jobs 210/211/213 + ab_round4
# job 201; PERF.md "Round 4"). Round 3's job-103 points were taken
# under CPU-suite load and sat 0.15-0.7 ms lower at the small heights.
MEASURED_T_MS: tuple[tuple[int, float], ...] = (
    (272, 5.27),
    (544, 5.99),
    (1088, 8.81),
    (2160, 14.47),
    (4320, 29.98),
)
COLLECTIVE_MS = 0.02  # psum + ppermute + segment all_gather on ICI


def t_program_ms(rows: int) -> float:
    """Measured one-dispatch program time for a `rows`-row slab
    (piecewise-linear between measured points; extrapolates the edge
    segments' slopes outside the measured range)."""
    pts = MEASURED_T_MS
    if rows <= pts[0][0]:
        (r0, t0), (r1, t1) = pts[0], pts[1]
    elif rows >= pts[-1][0]:
        (r0, t0), (r1, t1) = pts[-2], pts[-1]
    else:
        for (r0, t0), (r1, t1) in zip(pts, pts[1:]):
            if r0 <= rows <= r1:
                break
    return t0 + (t1 - t0) * (rows - r0) / (r1 - r0)


def projected_time_per_image_ms(
    rows: int, n_chips: int, slab_b: int = 1
) -> float:
    """Projected per-image program time with the image's rows split over
    n_chips and slab_b same-geometry images row-stacked per shard
    program."""
    rows_per_shard = -(-rows // n_chips)
    per_image = t_program_ms(slab_b * rows_per_shard) / slab_b
    if n_chips > 1:
        per_image += COLLECTIVE_MS
    return per_image


def best_slab_b(
    rows: int, n_chips: int, max_b: int = 8, width: int = 3840
) -> int:
    """The slab batch the encode_batch gate would pick: largest B with
    B * rows/n within the measured-win region, floor 1. Reads the SAME
    env knobs as encoder.py's gate (DMMT_SLAB_MAX_ROWS rows cap,
    DMMT_SLAB_MAX_BLOCKS per-shard-program compile cap) so the
    projection can't silently diverge from what encode_batch dispatches
    when the knobs differ from their defaults."""
    import os

    rows_cap = int(os.environ.get("DMMT_SLAB_MAX_ROWS", "2176"))
    blocks_cap = int(os.environ.get("DMMT_SLAB_MAX_BLOCKS", "800000"))
    rows_per_shard = -(-rows // n_chips)
    # P420 padded block count of one image's shard slice (luma + 2 chroma
    # at quarter size = 1.5x luma blocks).
    blocks_per_shard = (
        -(-rows_per_shard // 16) * 16 // 8 * (-(-width // 16) * 16 // 8) * 3
    ) // 2
    return max(
        1,
        min(
            max_b,
            rows_cap // max(rows_per_shard, 1),
            blocks_cap // max(blocks_per_shard, 1),
        ),
    )


def projected_scaling_table(
    rows: int = 2160,
    width: int = 3840,
    slab_b: int | None = 1,
    chips: tuple = (1, 2, 4, 8),
) -> list[dict]:
    """One row per mesh size: projected per-image ms, Mpix/s, and
    efficiency vs n * single-chip-single-image. slab_b=None picks the
    encode_batch gate's B per mesh size (best_slab_b)."""
    t1 = projected_time_per_image_ms(rows, 1, 1)
    out = []
    for n in chips:
        b = best_slab_b(rows, n, width=width) if slab_b is None else slab_b
        t = projected_time_per_image_ms(rows, n, b)
        out.append(
            {
                "chips": n,
                "slab_b": b,
                "proj_ms_per_image": round(t, 2),
                "proj_mpix_per_s": round(rows * width / 1e6 * 1e3 / t, 1),
                "proj_efficiency": round(t1 / (n * t), 3),
            }
        )
    return out

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
# parity plane mode — round-5 job 301 session (ab_round5b, one process,
# drift control within 0.06 ms). The single-image curve and the slab
# grid below come from the SAME session so efficiency ratios are not
# polluted by the documented +-1.5 ms cross-process variance. (Round-4
# idle points sat 0.3-2.2 ms lower at the small heights; the 544-row
# point here reads high against both neighbors — treated as measured.)
MEASURED_T_MS: tuple[tuple[int, float], ...] = (
    (272, 6.02),
    (544, 8.21),
    (1088, 9.84),
    (2176, 14.64),
    (4320, 26.84),  # round-5 job 310 refresh (round 4 read 29.98)
)

# (slab_b, rows_per_image) -> measured ms per PROGRAM for a B-image
# row-stacked slab (plane parity mode, round-5 jobs 301/306/307, PERF.md
# "Round 5"). These are the REAL shard-program floors: round 4 modeled
# a B-image slab as T(B*rows) — a single image's floor — and this grid
# shows that model missed a per-extra-image slice (NOT pack invocations
# — the one-pack A/B ruled those out — and NOT mainly hist/table builds
# — TABLE-ABLATE recovered only 0.74 ms of B=8x272's +10.7; it behaves
# as a fixed ~1.6-1.9 ms marginal cost per image that AMORTIZES with
# depth: B=32x272 reaches 2.16 ms/image where B=8 paid 3.16). The
# single-image 2176-total-rows superlinearity does NOT bind stacked
# small images — deep stacks (up to B=64 x 272 = 17408 total rows /
# 1.57M blocks, job 310) keep winning. All values are the DEFAULT
# (per-image-pack) path; job 310 re-measured the three points first
# taken on the one-pack arm and found the default arm SLOWER at B=2
# ((2,272) 15.91 vs one-pack's 10.07; (2,544) 19.95 vs 12.73 — B=2 is
# the one depth where one-pack's merged dispatch wins, but the gate
# demotes auto B=2 below 1088 rows anyway because BOTH arms lose to
# per-image pipelining there).
MEASURED_T_SLAB_MS: dict[tuple[int, int], float] = {
    (2, 272): 15.91,    # job 310 default arm (one-pack arm: 10.07)
    (4, 272): 19.07,    # job 310 default arm (one-pack arm: 19.09)
    (8, 272): 25.30,
    (12, 272): 31.77,   # job 307
    (16, 272): 38.18,   # job 306
    (32, 272): 69.10,   # job 307 (783K-block program; compiles fine)
    (48, 272): 102.90,  # job 310 (1.18M blocks)
    (64, 272): 129.03,  # job 310 (1.57M blocks, ~160 s compile; best
                        # per-image floor measured: 2.016 ms)
    (2, 544): 19.95,    # job 310 default arm (one-pack arm: 12.73)
    (4, 544): 24.70,
    (8, 544): 36.99,    # job 306
    (16, 544): 68.16,   # job 307
    (32, 544): 122.02,  # job 311 (1.57M blocks; slow-host session —
                        # its 2176 anchor read 16.2 vs 14.6 same-day)
    (2, 1088): 18.35,
    (4, 1088): 36.93,   # job 307
    (8, 1088): 69.53,   # job 307 (late-session; anchor had drifted +1.2)
    (16, 1088): 122.03,  # job 312 (7.63 ms/image -> n=2 efficiency 0.96)
    (17, 1088): 137.60,  # job 312: deeper but SLOWER than 16 — the one
                         # measured break in depth monotonicity; every
                         # measured optimum is a power of two, so the
                         # auto gate rounds depth down to one
}

# Measured per-extra-image overhead inside one slab program (ms/image
# beyond T(B*rows)/B), used ONLY for (B, rows) points absent from the
# grid: job 301's B=8x272 program ran 10.7 ms over the equal-height
# single image — ~1.5 ms per extra image (taller-image configs measured
# up to 3.7; this constant is the optimistic end, the grid carries the
# real points).
SLAB_OVERHEAD_MS_PER_IMAGE = 1.5

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


def t_slab_program_ms(slab_b: int, rows_per_image: int) -> float:
    """Program time for a slab_b-image row-stacked slab program.

    Prefers the MEASURED 2-D grid point (exact (B, rows) match, then
    B-interpolation between measured B values at the same rows); falls
    back to the single-image curve at the stacked height plus the
    measured per-extra-image overhead."""
    if slab_b == 1:
        return t_program_ms(rows_per_image)
    exact = MEASURED_T_SLAB_MS.get((slab_b, rows_per_image))
    if exact is not None:
        return exact
    same_rows = sorted(
        (b, ms) for (b, r), ms in MEASURED_T_SLAB_MS.items()
        if r == rows_per_image
    )
    if len(same_rows) >= 2:
        bs = [b for b, _ in same_rows]
        if bs[0] <= slab_b <= bs[-1]:
            for (b0, m0), (b1, m1) in zip(same_rows, same_rows[1:]):
                if b0 <= slab_b <= b1:
                    return m0 + (m1 - m0) * (slab_b - b0) / (b1 - b0)
        # extrapolate the marginal per-image cost of the last segment
        (b0, m0), (b1, m1) = same_rows[-2], same_rows[-1]
        return m1 + (m1 - m0) / (b1 - b0) * (slab_b - b1)
    return (
        t_program_ms(slab_b * rows_per_image)
        + SLAB_OVERHEAD_MS_PER_IMAGE * (slab_b - 1)
    )


def projected_time_per_image_ms(
    rows: int, n_chips: int, slab_b: int = 1
) -> float:
    """Projected per-image program time with the image's rows split over
    n_chips and slab_b same-geometry images row-stacked per shard
    program. Shard heights are MCU-aligned (16-row multiples for P420),
    matching what the sharded program actually runs — and the measured
    grid's keys (272, not 270, for 4K over 8 chips)."""
    mcu_rows = -(-rows // 16)
    rows_per_shard = -(-mcu_rows // n_chips) * 16
    per_image = t_slab_program_ms(slab_b, rows_per_shard) / slab_b
    if n_chips > 1:
        per_image += COLLECTIVE_MS
    return per_image


def best_slab_b(
    rows: int, n_chips: int, max_b: int = 64, width: int = 3840
) -> int:
    """The slab batch the encode_batch gate would pick: deepest B whose
    per-shard program stays under the compile cap, provided each image's
    shard slice is inside the measured slab-win region, else 1. Reads
    the SAME env knobs as encoder.py's gate (DMMT_SLAB_MAX_ROWS
    per-image rows bound, DMMT_SLAB_MAX_BLOCKS per-shard-program compile
    cap) so the projection can't silently diverge from what encode_batch
    dispatches when the knobs differ from their defaults.

    Round-5 jobs 306/307 changed the policy: the old 2176-TOTAL-rows cap
    came from single-image superlinearity that does not bind stacked
    small images (B=32x272 = 8704 total rows runs 2.16 ms/image where
    B=8 paid 3.16) — the per-image fixed slice amortizes with depth, so
    deeper is monotonically better up to the compile cap. What remains
    is the WIN-REGION bound: slabs beat the single-image path only when
    each stacked slice is <= ~1088 rows (at 2160+ rows/image round 4
    measured the stack dead). Job 310 extended the measured depth to
    B=64 (2.016 ms/272-row image; 1.57M-block program) — max_b matches —
    and showed auto B=2 must demote below 1088-row slices."""
    import os

    rows_cap = int(os.environ.get("DMMT_SLAB_MAX_ROWS", "1088"))
    blocks_cap = int(os.environ.get("DMMT_SLAB_MAX_BLOCKS", "1700000"))
    mcu_rows = -(-rows // 16)
    rows_per_shard = -(-mcu_rows // n_chips) * 16  # MCU-aligned
    if rows_per_shard > rows_cap:
        return 1
    # P420 padded block count of one image's shard slice (luma + 2 chroma
    # at quarter size = 1.5x luma blocks).
    blocks_per_shard = (
        -(-rows_per_shard // 16) * 16 // 8 * (-(-width // 16) * 16 // 8) * 3
    ) // 2
    b = max(1, min(max_b, blocks_cap // max(blocks_per_shard, 1)))
    # every measured depth optimum is a power of two and job 312 caught
    # B=17 running SLOWER than B=16 at the same rows — round auto depth
    # down to a power of two (encoder.py's gate mirrors this)
    if b >= 2:
        b = 1 << (b.bit_length() - 1)
    # job 310: B=2 slabs below 1088-row slices lose to per-image
    # pipelining on the default arm — the gate demotes auto picks of
    # exactly 2 there (encoder.py mirrors this).
    if b == 2 and rows_per_shard < 1088:
        return 1
    return b


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

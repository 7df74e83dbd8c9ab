"""Multi-chip scaling projection model (parallel/projection.py).

Round 5 reworked the model to prefer MEASURED (slab_b, rows) slab-program
floors (VERDICT r4 #1a: the round-4 model assumed a B-image slab costs
T(B*rows) — a single image's floor — which round 4's own slab A/B
contradicted). These tests pin the lookup/interpolation/fallback
semantics independent of the measured values."""

import pytest

from dmmt_jpeg_encoder_tpu.parallel import projection as pj


@pytest.fixture()
def grid(monkeypatch):
    monkeypatch.setattr(
        pj, "MEASURED_T_SLAB_MS",
        {(2, 272): 6.0, (4, 272): 9.0, (8, 272): 16.0, (4, 544): 12.0},
    )
    monkeypatch.setattr(pj, "SLAB_OVERHEAD_MS_PER_IMAGE", 0.5)
    return pj


def test_exact_grid_point_preferred(grid):
    assert grid.t_slab_program_ms(4, 272) == 9.0


def test_b_interpolation_between_measured(grid):
    # B=3 at 272 rows: between (2, 6.0) and (4, 9.0) -> 7.5
    assert grid.t_slab_program_ms(3, 272) == pytest.approx(7.5)


def test_b_extrapolation_uses_last_marginal_cost(grid):
    # beyond B=8 at 272 rows: marginal (16-9)/4 per image
    assert grid.t_slab_program_ms(10, 272) == pytest.approx(
        16.0 + (16.0 - 9.0) / 4 * 2
    )


def test_fallback_uses_single_curve_plus_overhead(grid):
    # no 1088-row slab points: single-image curve + per-extra overhead
    want = grid.t_program_ms(2 * 1088) + 0.5
    assert grid.t_slab_program_ms(2, 1088) == pytest.approx(want)


def test_single_image_is_the_1d_curve(grid):
    assert grid.t_slab_program_ms(1, 2176) == grid.t_program_ms(2176)


def test_shard_rows_mcu_aligned():
    # 4K over 8 chips runs 272-row shards (17 MCU rows), not 270
    t8 = pj.projected_time_per_image_ms(2160, 8, 1)
    assert t8 == pytest.approx(
        pj.t_program_ms(272) + pj.COLLECTIVE_MS
    )


def test_best_slab_b_respects_env_caps(monkeypatch):
    # DMMT_SLAB_MAX_ROWS bounds rows per IMAGE SLICE (win-region gate,
    # round 5): a 272-row shard above the cap disables slabs entirely
    monkeypatch.setenv("DMMT_SLAB_MAX_ROWS", "256")
    assert pj.best_slab_b(2160, 8) == 1
    # inside the win region, B is bounded by the compile cap only;
    # a cap that only allows B=2 demotes to 1 below 1088-row slices
    # (job 310: both slab arms lose to per-image pipelining there)
    monkeypatch.setenv("DMMT_SLAB_MAX_ROWS", "1088")
    monkeypatch.setenv("DMMT_SLAB_MAX_BLOCKS", "50000")
    # 272-row 3840-wide shard = 24480 blocks -> cap allows only B=2
    assert pj.best_slab_b(2160, 8) == 1
    # ...but B=2 survives at 1088-row slices (measured win)
    monkeypatch.setenv("DMMT_SLAB_MAX_BLOCKS", "200000")
    assert pj.best_slab_b(2176, 2) == 2
    monkeypatch.setenv("DMMT_SLAB_MAX_BLOCKS", "800000")
    assert pj.best_slab_b(2160, 8) == 32
    monkeypatch.delenv("DMMT_SLAB_MAX_BLOCKS")
    assert pj.best_slab_b(2160, 8) == 64  # default cap reaches job 310's depth


def test_scaling_table_carries_slab_b():
    rows = pj.projected_scaling_table(slab_b=None)
    assert all("slab_b" in r and "proj_efficiency" in r for r in rows)

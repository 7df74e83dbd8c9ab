"""Two-tier present-symbol sweep (DMMT_SWEEP=2tier, VERDICT r4 #2).

The pack kernel's AC Huffman lookup sweeps the present-symbol tables;
round 4's ablation showed the sweep is the superlinear term at slab/8K
scale (PERF.md "ab_round4d"). The two-tier mode orders tables hot-first
(ascending code length) and sweeps only DMMT_SWEEP_HEAD entries, with a
data-dependent tail that collapses to zero when every live lane
resolved. Bytes must be IDENTICAL in every combination — table order
cannot change which entry a lane ORs in."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dmmt_jpeg_encoder_tpu.config import EncoderConfig
from dmmt_jpeg_encoder_tpu.encoder import encode_array
from dmmt_jpeg_encoder_tpu.huffman.device_tables import (
    device_code_tables_batched,
    device_sweep_tables,
    device_sweep_tables_freq,
)


def _rand_image(h=40, w=56, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 90 + 70 * np.sin(xx / 7.0) + 50 * np.cos(yy / 5.0)
    px = np.stack([base, base * 0.8 + 20, base * 1.1 - 10], axis=-1)
    px = px + rng.normal(0, 14, px.shape)
    return np.clip(px, 0, 255).astype(np.uint8)


def test_freq_tables_same_entries_hot_first():
    """device_sweep_tables_freq is a permutation of device_sweep_tables
    with non-decreasing effective code length."""
    rng = np.random.default_rng(11)
    hist_a = jnp.asarray(rng.integers(0, 900, 256).astype(np.int32))
    hist_b = jnp.asarray(rng.integers(0, 900, 256).astype(np.int32))
    # sparsify so some symbols are absent
    hist_a = jnp.where(hist_a % 3 == 0, 0, hist_a)
    hist_b = jnp.where(hist_b % 4 == 0, 0, hist_b)
    t = device_code_tables_batched(jnp.stack([hist_a, hist_b]))
    ta = {k: v[0] for k, v in t.items()}
    tb = {k: v[1] for k, v in t.items()}
    s0, a0, b0, k0 = map(np.asarray, device_sweep_tables(ta, tb, 256))
    s1, a1, b1, k1 = map(np.asarray, device_sweep_tables_freq(ta, tb, 256))
    assert int(k0) == int(k1)
    k = int(k0)
    # same (sym -> entries) mapping
    m0 = {int(s0[i]): (int(a0[i]), int(b0[i])) for i in range(k)}
    m1 = {int(s1[i]): (int(a1[i]), int(b1[i])) for i in range(k)}
    assert m0 == m1
    assert all(int(s) == -1 for s in s1[k:])
    # hot-first: effective (min available) code length non-decreasing
    def eff(i):
        la, ca = int(a1[i]) & 0xFF, int(b1[i]) & 0xFF
        return min(x for x in (la, ca) if x > 0)
    effs = [eff(i) for i in range(k)]
    assert effs == sorted(effs)


@pytest.mark.parametrize("head", ["4", "32"])
def test_encode_bytes_identical_2tier(monkeypatch, head):
    """head=4 forces the tail loop to run (few symbols fit 4 entries);
    head=32 typically resolves everything in the head. Bytes must equal
    the default-sweep encode either way."""
    monkeypatch.setenv("DMMT_PALLAS_INTERPRET", "1")
    px = _rand_image()
    config = EncoderConfig(scan_backend="device")
    want = encode_array(px, 255, config)
    monkeypatch.setenv("DMMT_SWEEP", "2tier")
    monkeypatch.setenv("DMMT_SWEEP_HEAD", head)
    got = encode_array(px, 255, config)
    assert got == want


def test_2tier_tables_actually_used(monkeypatch):
    """Dispatch-reached guard: with DMMT_SWEEP=2tier the freq table
    builder must be the one called (the round-3 gate-bug lesson)."""
    monkeypatch.setenv("DMMT_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("DMMT_SWEEP", "2tier")
    import dmmt_jpeg_encoder_tpu.huffman.device_tables as dt
    import dmmt_jpeg_encoder_tpu.onedispatch as od

    calls = {"freq": 0}
    real = dt.device_sweep_tables_freq

    def counted(*a, **k):
        calls["freq"] += 1
        return real(*a, **k)

    monkeypatch.setattr(dt, "device_sweep_tables_freq", counted)
    od._compiled_onedispatch.cache_clear()
    config = EncoderConfig(scan_backend="device")
    encode_array(_rand_image(seed=5), 255, config)
    assert calls["freq"] >= 2  # dc + ac table builds traced
    od._compiled_onedispatch.cache_clear()

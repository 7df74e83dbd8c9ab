"""Tests for the Pallas capability probe (utils/capability.py).

VERDICT r2 #7: hot-path gating must be a real capability probe, not a
backend-name string compare, and the fallback must not be silent on
non-CPU backends.
"""

import jax

from dmmt_jpeg_encoder_tpu.utils import capability


def test_probe_is_false_on_cpu_backend():
    assert jax.default_backend() == "cpu"  # conftest forces this
    assert capability._probe_lowering() is False


def test_interpret_env_wins(monkeypatch):
    monkeypatch.setenv("DMMT_PALLAS_INTERPRET", "1")
    assert capability.pallas_capable() is True
    monkeypatch.delenv("DMMT_PALLAS_INTERPRET")
    assert capability.pallas_capable() is False


def test_force_override(monkeypatch):
    monkeypatch.delenv("DMMT_PALLAS_INTERPRET", raising=False)
    monkeypatch.setenv("DMMT_FORCE_PALLAS", "1")
    assert capability.pallas_capable() is True
    monkeypatch.setenv("DMMT_FORCE_PALLAS", "0")
    assert capability.pallas_capable() is False


def test_env_flags_read_fresh_despite_probe_cache(monkeypatch):
    # The lowering probe is cached; the env gates must NOT be.
    monkeypatch.delenv("DMMT_FORCE_PALLAS", raising=False)
    monkeypatch.setenv("DMMT_PALLAS_INTERPRET", "1")
    assert capability.pallas_capable() is True
    monkeypatch.delenv("DMMT_PALLAS_INTERPRET")
    assert capability.pallas_capable() is False
    monkeypatch.setenv("DMMT_PALLAS_INTERPRET", "1")
    assert capability.pallas_capable() is True


def test_gated_paths_follow_probe(monkeypatch):
    """The pack/lookup/histogram/fused gates all resolve through the
    probe now; on CPU without interpret they take XLA fallbacks and stay
    numerically correct (covered elsewhere) — here just check routing."""
    from dmmt_jpeg_encoder_tpu.bitstream.device_pack import _use_pallas_pack

    monkeypatch.delenv("DMMT_PALLAS_INTERPRET", raising=False)
    monkeypatch.delenv("DMMT_FORCE_PALLAS", raising=False)
    assert _use_pallas_pack() is False
    monkeypatch.setenv("DMMT_PALLAS_INTERPRET", "1")
    assert _use_pallas_pack() is True

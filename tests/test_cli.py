"""CLI tests (reference test strategy: src/cli.rs:182-296)."""

import numpy as np
import pytest

from dmmt_jpeg_encoder_tpu.cli import main, parse_args
from dmmt_jpeg_encoder_tpu.config import (
    ChromaSubsamplingPreset,
    QuantizationTablePreset,
)


def test_defaults():
    args, cfg = parse_args(["in.ppm", "out.jpg"])
    assert args.input_file == "in.ppm"
    assert args.output_file == "out.jpg"
    assert cfg.bits_per_channel == 8
    assert cfg.chroma_subsampling is ChromaSubsamplingPreset.P420
    assert cfg.quantization_preset is QuantizationTablePreset.SPECIFICATION
    assert args.threads >= 1


def test_short_flags():
    _, cfg = parse_args(["a", "b", "-b", "16", "-p", "P444", "-q", "Flat", "-t", "4"])
    assert cfg.bits_per_channel == 16
    assert cfg.chroma_subsampling is ChromaSubsamplingPreset.P444
    assert cfg.quantization_preset is QuantizationTablePreset.FLAT


def test_quant_aliases():
    for alias, expected in [
        ("Spec", QuantizationTablePreset.SPECIFICATION),
        ("default", QuantizationTablePreset.SPECIFICATION),
        ("0", QuantizationTablePreset.SPECIFICATION),
        ("1", QuantizationTablePreset.FLAT),
        ("2", QuantizationTablePreset.MSSIM_KODAK_TUNED),
    ]:
        _, cfg = parse_args(["a", "b", "-q", alias])
        assert cfg.quantization_preset is expected, alias


def test_invalid_bits_rejected():
    with pytest.raises(SystemExit):
        parse_args(["a", "b", "-b", "12"])


def test_invalid_preset_rejected():
    with pytest.raises(SystemExit):
        parse_args(["a", "b", "-p", "P411"])


def test_invalid_quant_table_rejected():
    with pytest.raises(SystemExit):
        parse_args(["a", "b", "-q", "nonsense"])


def test_missing_positional_rejected():
    with pytest.raises(SystemExit):
        parse_args(["only_one"])


def test_main_end_to_end(tmp_path, fixtures_dir):
    out = tmp_path / "out.jpg"
    rc = main([str(fixtures_dir / "8x8.ppm"), str(out), "-p", "P444"])
    assert rc == 0
    data = out.read_bytes()
    assert data[:2] == b"\xff\xd8"


def test_main_missing_input(tmp_path):
    rc = main([str(tmp_path / "nope.ppm"), str(tmp_path / "out.jpg")])
    assert rc == 1


def test_threads_flag_reaches_parser(tmp_path, fixtures_dir, monkeypatch):
    """-t/--threads must set the C PPM parser's worker count (reference
    pool-size semantics, cli.rs:178-180) — round-3 VERDICT item #7."""
    import dmmt_jpeg_encoder_tpu.io.ppm as ppm_mod

    seen: list[int | None] = []
    real = ppm_mod._parse_native_mt

    def spy(data, threads=None):
        seen.append(threads)
        return real(data, threads=threads)

    monkeypatch.setattr(ppm_mod, "_parse_native_mt", spy)
    out = tmp_path / "out.jpg"
    rc = main([str(fixtures_dir / "8x8.ppm"), str(out), "-t", "1"])
    assert rc == 0
    assert seen == [1]


def test_read_ppm_threads_param(fixtures_dir):
    from dmmt_jpeg_encoder_tpu.io.ppm import read_ppm

    a = read_ppm(fixtures_dir / "8x8.ppm", threads=1)
    b = read_ppm(fixtures_dir / "8x8.ppm", threads=4)
    assert (a.pixels == b.pixels).all() and a.maxval == b.maxval

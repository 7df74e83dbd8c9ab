"""Supervisor-layer tests for bench.py (VERDICT r2 #1: the bench must be
un-killable — retry backend-init failures, survive hangs, keep partial
metrics, and always end with the device-program metric line).

These run stub children (no jax, no TPU) to exercise the harvesting,
timeout-kill, and canonical-ordering logic.
"""

import json
import subprocess
import sys
import textwrap
from pathlib import Path

import bench


def _stub(tmp_path: Path, body: str) -> list:
    p = tmp_path / "stub_child.py"
    p.write_text(textwrap.dedent(body))
    return [sys.executable, str(p)]


def test_harvests_json_lines_and_streams(tmp_path, capsys):
    cmd = _stub(
        tmp_path,
        """
        import json
        print("devices: stub")  # non-JSON noise must go to stderr
        print(json.dumps({"metric": "4k_rgb_to_jpeg_throughput",
                          "value": 1.0, "unit": "Mpix/s", "vs_baseline": 0.001}))
        print(json.dumps({"metric": "4k_device_program_throughput",
                          "value": 2.0, "unit": "Mpix/s", "vs_baseline": 0.002}))
        """,
    )
    metrics = {}
    rc = bench._run_attempt(cmd, timeout_s=60, metrics=metrics)
    assert rc == 0
    assert set(metrics) == {
        "4k_rgb_to_jpeg_throughput",
        "4k_device_program_throughput",
    }
    out = capsys.readouterr()
    # JSON lines streamed to stdout; noise diverted to stderr.
    assert "devices: stub" not in out.out
    assert '"4k_device_program_throughput"' in out.out


def test_partial_metrics_survive_child_crash(tmp_path):
    cmd = _stub(
        tmp_path,
        """
        import json, sys
        print(json.dumps({"metric": "4k_rgb_to_jpeg_throughput",
                          "value": 3.0, "unit": "Mpix/s", "vs_baseline": 0.003}),
              flush=True)
        sys.exit(7)  # crash after the first stage
        """,
    )
    metrics = {}
    rc = bench._run_attempt(cmd, timeout_s=60, metrics=metrics)
    assert rc == 7
    assert metrics["4k_rgb_to_jpeg_throughput"]["value"] == 3.0


def test_timeout_kills_hung_child(tmp_path):
    cmd = _stub(
        tmp_path,
        """
        import json, time
        print(json.dumps({"metric": "4k_rgb_to_jpeg_throughput",
                          "value": 4.0, "unit": "Mpix/s", "vs_baseline": 0.004}),
              flush=True)
        time.sleep(3600)  # the wedged-tunnel symptom: block forever
        """,
    )
    metrics = {}
    rc = bench._run_attempt(cmd, timeout_s=3, metrics=metrics)
    assert rc is None  # timed out, child killed by exact PID
    assert metrics["4k_rgb_to_jpeg_throughput"]["value"] == 4.0


def test_metric_order_puts_program_floor_last():
    assert bench.METRIC_ORDER[-1] == "4k_device_program_throughput"


def test_end_to_end_supervisor_retries_and_orders(tmp_path, monkeypatch):
    """Drive bench.main() with a scripted flaky child: attempt 1 dies at
    backend init (the round-2 failure mode), attempt 2 completes. The
    final stdout line must be the device-program metric."""
    marker = tmp_path / "attempt_count"
    stub = tmp_path / "flaky_child.py"
    stub.write_text(
        textwrap.dedent(
            f"""
            import json, pathlib, sys
            m = pathlib.Path({str(marker)!r})
            n = int(m.read_text()) if m.exists() else 0
            m.write_text(str(n + 1))
            if n == 0:
                sys.stderr.write("Unable to initialize backend 'axon': UNAVAILABLE\\n")
                sys.exit(1)
            for metric, v in [("4k_rgb_to_jpeg_throughput", 10.0),
                              ("4k_device_program_throughput", 20.0)]:
                print(json.dumps({{"metric": metric, "value": v,
                                   "unit": "Mpix/s", "vs_baseline": v / 1000}}),
                      flush=True)
            """
        )
    )
    # Patch the supervisor to spawn the stub instead of bench.py --child,
    # and shrink the backoff so the test is fast.
    real_run = bench._run_attempt
    monkeypatch.setattr(
        bench,
        "_run_attempt",
        lambda cmd, t, m: real_run([sys.executable, str(stub)], t, m),
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        sys, "argv",
        ["bench.py", "--attempts", "3", "--attempt-timeout", "30",
         "--tunnel-wait", "0"],
    )
    proc_out = []
    monkeypatch.setattr(
        "builtins.print",
        lambda *a, **kw: proc_out.append((a, kw))
        if kw.get("file") is None
        else None,
    )
    rc = bench.main()
    assert rc == 0
    json_lines = []
    for a, kw in proc_out:
        try:
            json_lines.append(json.loads(a[0]))
        except (ValueError, TypeError, IndexError):
            pass
    assert json_lines, "no JSON lines captured"
    assert json_lines[-1]["metric"] == "4k_device_program_throughput"
    assert json_lines[-1]["value"] == 20.0
    assert marker.read_text() == "2"  # exactly one retry


def test_all_attempts_failing_returns_rc1(tmp_path, monkeypatch):
    stub = tmp_path / "dead_child.py"
    stub.write_text("import sys; sys.exit(1)\n")
    real_run = bench._run_attempt
    monkeypatch.setattr(
        bench,
        "_run_attempt",
        lambda cmd, t, m: real_run([sys.executable, str(stub)], t, m),
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        sys, "argv",
        ["bench.py", "--attempts", "2", "--attempt-timeout", "30",
         "--tunnel-wait", "0"],
    )
    assert bench.main() == 1

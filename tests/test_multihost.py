"""Multi-host wiring: initialize_distributed, global mesh, scaling report.

Real multi-host cannot run here; this exercises the wiring end to end in
single-process form — the no-op path in-process (jax is already
initialized by conftest) and a REAL jax.distributed service in a
subprocess where initialization happens before the backend comes up.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np

from dmmt_jpeg_encoder_tpu.parallel.multihost import (
    global_mesh_shards,
    initialize_distributed,
    is_coordinator,
    scaling_report,
)

REPO = Path(__file__).resolve().parent.parent


def test_initialize_is_noop_after_backend_init():
    # jax is already live (conftest): initialize must swallow the failure
    # and leave the process usable.
    initialize_distributed()
    assert global_mesh_shards() == len(jax.devices()) == 8
    assert is_coordinator()


def test_scaling_report_values():
    rep = scaling_report(100.0, 640.0, 8)
    assert rep["chips"] == 8
    assert rep["ideal_mpix_s"] == 800.0
    assert rep["scaling_efficiency"] == 0.8
    assert scaling_report(0.0, 10.0, 2)["scaling_efficiency"] == 0.0


def test_real_distributed_init_single_process_encode():
    """Subprocess: real jax.distributed service, global mesh over 8 virtual
    devices, sharded encode through global_mesh_shards() — byte-identical
    to the single-shard encode."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from dmmt_jpeg_encoder_tpu.parallel.multihost import (
    initialize_distributed, global_mesh_shards, is_coordinator,
)
initialize_distributed("localhost:{port}", 1, 0)
assert jax.process_count() == 1
assert is_coordinator()
n = global_mesh_shards()
assert n == 8, n
import numpy as np
from dmmt_jpeg_encoder_tpu import encode_array
from dmmt_jpeg_encoder_tpu.config import EncoderConfig, ChromaSubsamplingPreset
rng = np.random.default_rng(3)
px = rng.integers(0, 256, (44, 28, 3), dtype=np.uint16)
preset = ChromaSubsamplingPreset.P420
sharded = encode_array(px, 255, EncoderConfig(
    chroma_subsampling=preset, num_shards=n, scan_backend="device"))
single = encode_array(px, 255, EncoderConfig(chroma_subsampling=preset))
assert sharded == single, "sharded bytes diverge under jax.distributed"
print("DISTRIBUTED_OK", len(sharded))
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["DMMT_CHECK_BITS"] = "1"
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DISTRIBUTED_OK" in proc.stdout

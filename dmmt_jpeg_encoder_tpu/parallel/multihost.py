"""Multi-host encode entry points.

The reference is strictly single-process (SURVEY.md §2: no MPI/NCCL/
sockets). This framework scales the same shard_map program from one chip to
a multi-host slice: the mesh simply spans all processes' devices, XLA
routes the psum'd histograms and the ppermute DC hand-off over ICI within a
host and DCN across hosts — nothing else crosses chips (parallel/
sharding.py). These helpers wire up the process group and build the global
mesh.

Typical multi-host driver (same script on every host):

    from dmmt_jpeg_encoder_tpu.parallel.multihost import (
        initialize_distributed, global_mesh_shards,
    )
    initialize_distributed(coordinator, num_processes, process_id)
    config = EncoderConfig(num_shards=global_mesh_shards())
    jpeg = encode_array(pixels, 255, config)   # identical bytes on host 0
"""

from __future__ import annotations

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize with explicit or env-provided topology.

    No-op when already initialized (or single-process)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized — keep going
        pass
    except ValueError:
        # no coordinator given and no cluster autodetection available:
        # plain single-process run, nothing to wire up
        if coordinator_address is not None:
            raise


def global_mesh_shards() -> int:
    """Number of shards for a whole-slice mesh (= all global devices)."""
    return len(jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0


def scaling_report(mpix_per_s_one_chip: float, mpix_per_s_n_chips: float,
                   n_chips: int) -> dict:
    """Scaling-efficiency summary for the >=80% multi-host target
    (BASELINE.md)."""
    ideal = mpix_per_s_one_chip * n_chips
    eff = mpix_per_s_n_chips / ideal if ideal else 0.0
    return {
        "chips": n_chips,
        "throughput_mpix_s": round(mpix_per_s_n_chips, 2),
        "ideal_mpix_s": round(ideal, 2),
        "scaling_efficiency": round(eff, 4),
    }

"""Multi-host distributed runtime: jax.distributed + global batch assembly.

The reference has no distributed backend (SURVEY §2.4/§5.8: single GPU, no
torch.distributed).  Here multi-host scale-out is first-class: each host
runs the same program, `initialize()` joins the jax.distributed runtime,
the mesh spans every chip in the slice (gradient psum rides ICI), and each
host feeds only its local shard of the global batch.

Usage (same script on every host):

    from xna_basecaller_tpu.parallel import distributed as dist
    dist.initialize()                       # no-op single-process
    mesh = mesh_lib.make_mesh()             # spans all processes' devices
    ...
    global_batch = dist.global_batch(mesh, local_chunks)   # per-host shard

Inference fan-out follows the reference eval topology (SURVEY §5.8): each
host basecalls its share of reads (`shard_reads`), and process 0 runs the
single merged evaluation.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from xna_basecaller_tpu.parallel.mesh import DATA_AXIS


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the jax.distributed runtime; safe no-op for single-process runs
    (auto-detects cloud TPU environments when args are None)."""
    if num_processes is None and coordinator_address is None:
        # single-process unless a TPU pod environment provides topology
        try:
            import os
            if "COORDINATOR_ADDRESS" not in os.environ and \
                    os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") in (
                        "localhost", ""):
                return
        except Exception:
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def global_batch(mesh, *local_arrays):
    """Assemble globally-sharded arrays from per-host local shards.

    Each host passes its local rows; the result is a global jax.Array
    sharded on the batch axis across the whole mesh.  Local batch sizes
    must be equal across hosts (pad the tail batch).
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    out = tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in local_arrays)
    return out if len(out) > 1 else out[0]


def shard_reads(reads, process_id: int | None = None,
                n_processes: int | None = None):
    """Deterministically deal reads round-robin to hosts (inference
    fan-out; SURVEY §5.8)."""
    pid = process_id if process_id is not None else jax.process_index()
    n = n_processes if n_processes is not None else jax.process_count()
    for i, read in enumerate(reads):
        if i % n == pid:
            yield read


def all_gather_metrics(values: dict[str, float], mesh) -> dict[str, float]:
    """Mean-reduce scalar metrics across hosts (eval fan-in).

    Each host replicates its metric row over its local devices, so the
    global [n_devices, K] array is evenly device-sharded regardless of the
    process/device ratio; the device-axis mean then equals the process mean
    (every process contributes local_device_count equal rows).
    """
    if jax.process_count() == 1:
        return dict(values)
    import jax.numpy as jnp

    keys = sorted(values)
    local = np.tile(
        np.asarray([[values[k] for k in keys]], np.float32),
        (jax.local_device_count(), 1))
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    arr = jax.make_array_from_process_local_data(sharding, local)
    mean = jax.jit(
        lambda x: jnp.mean(x, axis=0),
        out_shardings=NamedSharding(mesh, P()))(arr)
    out = np.asarray(mean)
    return {k: float(v) for k, v in zip(keys, out)}

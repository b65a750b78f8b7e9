"""Device mesh and sharding helpers: data-parallel scale-out.

The reference is single-GPU (SURVEY §2.4; vestigial DataParallel only).
Here data parallelism is first-class: a 1-D ``data`` mesh axis spans all
devices (ICI within a slice); parameters are replicated, batches sharded on
axis 0, and XLA inserts the psum gradient all-reduce when the jitted train
step consumes sharded batches with replicated params.  Multi-host extends
the same mesh over jax.distributed process groups.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays on the mesh with batch-axis sharding."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, ...] step-stacks: steps on axis 0 (scanned in-jit, every
    device sees every step), batch sharded on axis 1."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_stacked_batch(mesh: Mesh, *arrays):
    """Place [K, B, ...] host stacks on the mesh, batch axis sharded."""
    sh = stacked_batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def pad_to_multiple(batch: np.ndarray, multiple: int):
    """Pad axis 0 to a multiple of the mesh size; returns (padded, n_real)."""
    n = batch.shape[0]
    rem = n % multiple
    if rem == 0:
        return batch, n
    pad = multiple - rem
    padding = np.zeros((pad,) + batch.shape[1:], batch.dtype)
    return np.concatenate([batch, padding], axis=0), n

"""Mesh/sharding and distributed-helper tests on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from xna_basecaller_tpu.parallel import distributed as dist
from xna_basecaller_tpu.parallel import mesh as mesh_lib


def test_mesh_spans_devices():
    mesh = mesh_lib.make_mesh()
    assert mesh.shape["data"] == len(jax.devices())


def test_batch_sharding_places_rows():
    mesh = mesh_lib.make_mesh()
    n = len(jax.devices())
    x = np.arange(n * 4 * 3, dtype=np.float32).reshape(n * 4, 3)
    xs = mesh_lib.shard_batch(mesh, x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_replicate_tree():
    mesh = mesh_lib.make_mesh()
    tree = {"a": np.ones((4, 4), np.float32)}
    rep = mesh_lib.replicate(mesh, tree)
    assert rep["a"].sharding.spec == jax.sharding.PartitionSpec()


def test_pad_to_multiple():
    x = np.ones((5, 3))
    padded, n = mesh_lib.pad_to_multiple(x, 8)
    assert padded.shape == (8, 3) and n == 5
    np.testing.assert_array_equal(padded[5:], 0)
    same, n2 = mesh_lib.pad_to_multiple(np.ones((8, 3)), 8)
    assert same.shape == (8, 3) and n2 == 8


def test_sharded_psum_matches_local():
    """Gradient-style reduction across the mesh equals the local sum."""
    mesh = mesh_lib.make_mesh()
    n = len(jax.devices())
    x = np.random.default_rng(0).normal(size=(n * 2, 16)).astype(np.float32)
    xs = mesh_lib.shard_batch(mesh, x)

    @jax.jit
    def mean_grad(x):
        return jax.grad(lambda y: jnp.sum(y ** 2) / y.shape[0])(x).mean()

    np.testing.assert_allclose(
        float(mean_grad(xs)), float(mean_grad(jnp.asarray(x))), rtol=1e-4)


def test_initialize_single_process_noop():
    dist.initialize()  # must not raise in single-process mode
    assert dist.process_count() == 1
    assert dist.process_index() == 0


def test_shard_reads_partitions():
    reads = list(range(10))
    shards = [list(dist.shard_reads(reads, process_id=p, n_processes=3))
              for p in range(3)]
    assert sorted(sum(shards, [])) == reads
    assert all(len(s) >= 3 for s in shards)


def test_global_batch_single_process():
    mesh = mesh_lib.make_mesh()
    n = len(jax.devices())
    x = np.arange(n * 2 * 4, dtype=np.float32).reshape(n * 2, 4)
    g = dist.global_batch(mesh, x)
    np.testing.assert_array_equal(np.asarray(g), x)


def test_all_gather_metrics_single_process():
    mesh = mesh_lib.make_mesh()
    out = dist.all_gather_metrics({"acc": 0.5, "loss": 1.0}, mesh)
    assert out == {"acc": 0.5, "loss": 1.0}

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


def test_two_process_distributed_train_step(tmp_path):
    """REAL multi-process jax.distributed: 2 CPU processes x 4 virtual
    devices run one DP train step over an 8-device global mesh; loss,
    grad-norm, updated params and gathered metrics must match the
    single-process 8-device run (VERDICT round-1 item #6)."""
    import json
    import socket
    import subprocess
    import sys
    import os

    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), "2", str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out
    result = json.load(open(tmp_path / "result.json"))
    assert result["process_count"] == 2

    # single-process oracle on this process's own 8-device mesh
    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.models.crf_model import Model
    from xna_basecaller_tpu.train import loop as train_loop

    cfg = ModelConfig(state_len=2, labels=tuple("NACGT"),
                      encoder=EncoderConfig(features=16, num_rnn_layers=2,
                                            winlen=9, second_conv_size=8))
    model = Model(cfg)
    mesh = mesh_lib.make_mesh()
    params = mesh_lib.replicate(mesh, model.init(jax.random.key(0)))
    rng = np.random.default_rng(0)
    B, T, L = 16, 400, 30
    chunks = rng.normal(size=(B, T)).astype(np.float32)
    targets = rng.integers(1, 5, size=(B, L)).astype(np.int32)
    lengths = np.full((B,), L, np.int32)
    c, t, l = mesh_lib.shard_batch(mesh, chunks, targets, lengths)
    optimizer = train_loop.make_optimizer(lambda _: 1e-3)
    opt_state = mesh_lib.replicate(mesh,
                                   optimizer.init(jax.device_get(params)))
    params, opt_state, loss, grad_norm = train_loop.train_step(
        params, opt_state, c, t, l, cfg, optimizer,
        compute_dtype=np.float32)
    param_sum = float(sum(np.abs(p).sum()
                          for p in jax.tree.leaves(jax.device_get(params))))

    assert np.isclose(result["loss"], float(loss), rtol=1e-5), outs
    assert np.isclose(result["grad_norm"], float(grad_norm), rtol=1e-4)
    assert np.isclose(result["param_sum"], param_sum, rtol=1e-5)
    assert np.isclose(result["metrics"]["loss"], float(loss), rtol=1e-5)
    assert result["metrics"]["pid"] == 0.5  # mean of pids 0,1 across hosts


def test_sharded_inference_matches_single_device():
    """Mesh-sharded score+decode == single-device result (8 CPU devices)."""
    import numpy as np
    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.infer.basecall import compute_scores
    from xna_basecaller_tpu.infer.sharded import (
        make_sharded_scorer, sharded_compute_scores,
    )
    from xna_basecaller_tpu.models.crf_model import Model
    from xna_basecaller_tpu.parallel import mesh as mesh_lib

    cfg = ModelConfig(encoder=EncoderConfig(features=32, num_rnn_layers=2))
    model = Model(cfg)
    params = model.init(jax.random.key(0))
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8
    batch = np.random.default_rng(0).normal(
        size=(16, 1000)).astype(np.float32)

    want = compute_scores(model, params, batch)["path"]
    got = sharded_compute_scores(model, params, batch, mesh)["path"]
    np.testing.assert_array_equal(got, want)

    # padding path: 13 rows over 8 devices
    got13 = sharded_compute_scores(model, params, batch[:13], mesh)["path"]
    np.testing.assert_array_equal(got13, want[:13])

    # qscores variant returns per-frame confidences too
    scorer = make_sharded_scorer(model, params, mesh, qscores=True)
    paths, probs = scorer(batch)
    np.testing.assert_array_equal(paths, want)
    assert probs.shape == paths.shape

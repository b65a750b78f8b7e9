"""Worker for the real 2-process jax.distributed test (not pytest-collected).

Each process owns 4 virtual CPU devices; together they form an 8-device
global mesh.  The worker joins the distributed runtime, assembles its half
of a deterministic global batch, runs ONE data-parallel train step of the
real train loop (replicated params, sharded batch, psum gradients over the
process boundary), all-gathers metrics, and process 0 dumps the results
for the parent test to compare against a single-process run.

Usage: python dist_worker.py <port> <process_id> <num_processes> <out_dir>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

port, pid, nproc, out_dir = (sys.argv[1], int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["XNACALL_NO_COMPILE_CACHE"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig  # noqa: E402
from xna_basecaller_tpu.models.crf_model import Model  # noqa: E402
from xna_basecaller_tpu.parallel import distributed as dist  # noqa: E402
from xna_basecaller_tpu.parallel import mesh as mesh_lib  # noqa: E402
from xna_basecaller_tpu.train import loop  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc

mesh = mesh_lib.make_mesh()

cfg = ModelConfig(state_len=2, labels=tuple("NACGT"),
                  encoder=EncoderConfig(features=16, num_rnn_layers=2,
                                        winlen=9, second_conv_size=8))
model = Model(cfg)
params = mesh_lib.replicate(mesh, model.init(jax.random.key(0)))

# deterministic GLOBAL batch; this host keeps its contiguous half
rng = np.random.default_rng(0)
B, T, L = 4 * nproc * 2, 400, 30
chunks = rng.normal(size=(B, T)).astype(np.float32)
targets = rng.integers(1, 5, size=(B, L)).astype(np.int32)
lengths = np.full((B,), L, np.int32)
lo, hi = pid * B // nproc, (pid + 1) * B // nproc
c, t, l = dist.global_batch(mesh, chunks[lo:hi], targets[lo:hi],
                            lengths[lo:hi])

optimizer = loop.make_optimizer(lambda _: 1e-3)
opt_state = mesh_lib.replicate(mesh, optimizer.init(jax.device_get(params)))

params, opt_state, loss, grad_norm = loop.train_step(
    params, opt_state, c, t, l, cfg, optimizer, compute_dtype=np.float32)

metrics = dist.all_gather_metrics(
    {"loss": float(loss), "pid": float(pid)}, mesh)

if pid == 0:
    leaves = jax.tree.leaves(jax.device_get(params))
    result = {
        "loss": float(loss),
        "grad_norm": float(grad_norm),
        "param_sum": float(sum(np.abs(p).sum() for p in leaves)),
        "metrics": metrics,
        "process_count": jax.process_count(),
    }
    with open(os.path.join(out_dir, "result.json"), "w") as fh:
        json.dump(result, fh)
print(f"worker {pid} done", flush=True)

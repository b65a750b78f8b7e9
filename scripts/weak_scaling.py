#!/usr/bin/env python
"""Weak-scaling measurement: samples/s at N devices with per-device batch
held constant (BASELINE north star: >=80% weak-scaling efficiency at 2+
hosts; SURVEY §2.4/§5.8).

Measures the two SPMD programs on a growing device mesh:

  infer: replicated params, chunk batch sharded on the 'data' axis,
         jitted score + fused posterior/Viterbi decode (no collectives —
         per-chunk decode is embarrassingly parallel)
  train: same mesh, full DP train step (psum gradient reduction)

On TPU pod hardware run it bare (`python scripts/weak_scaling.py`) and the
mesh takes real chips over ICI. In this single-chip environment it runs on
XLA's virtual CPU devices (--force-cpu-devices), which validates the
sharding programs and the measurement harness; virtual devices share one
host's cores, so CPU efficiency numbers UNDERSTATE hardware scaling — the
committed artifact is the methodology, re-runnable on a pod.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(args):
    import jax

    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.models.crf_model import Model

    cfg = ModelConfig(encoder=EncoderConfig(
        features=args.features, num_rnn_layers=args.layers))
    model = Model(cfg)
    # keep the reference tree on host: the jitted train step donates its
    # device copies, and on a 1-device mesh replicate() would alias them
    params = jax.device_get(model.init(jax.random.key(0)))
    return cfg, model, params


def measure_infer(cfg, model, params, n_dev, batch_per_dev, chunksize,
                  iters, devices):
    import numpy as np

    from xna_basecaller_tpu.infer.sharded import make_sharded_scorer
    from xna_basecaller_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(devices=devices[:n_dev])
    scorer = make_sharded_scorer(model, params, mesh)
    batch = np.random.default_rng(0).normal(
        size=(batch_per_dev * n_dev, chunksize)).astype(np.float32)
    scorer(batch)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        scorer(batch)
    dt = time.perf_counter() - t0
    return batch.size * iters / dt


def measure_train(cfg, model, params, n_dev, batch_per_dev, chunksize,
                  iters, devices):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xna_basecaller_tpu.parallel import mesh as mesh_lib
    from xna_basecaller_tpu.train.loop import make_optimizer, train_step

    mesh = mesh_lib.make_mesh(devices=devices[:n_dev])
    optimizer = make_optimizer(lambda _: 1e-4)
    opt_state = optimizer.init(params)
    p = mesh_lib.replicate(mesh, params)
    s = mesh_lib.replicate(mesh, opt_state)
    n = batch_per_dev * n_dev
    rng = np.random.default_rng(0)
    chunks = rng.normal(size=(n, chunksize)).astype(np.float32)
    t_len = max(chunksize // 45, 8)
    targets = rng.integers(1, 7, size=(n, t_len)).astype(np.int32)
    lengths = np.full(n, t_len, np.int32)
    chunks, targets, lengths = mesh_lib.shard_batch(
        mesh, chunks, targets, lengths)

    def step(p_, s_, c, t, L):
        return train_step(p_, s_, c, t, L, cfg, optimizer, jnp.float32)

    p2, s2, loss, gn = step(p, s, chunks, targets, lengths)
    jax.block_until_ready(loss)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        p2, s2, loss, gn = step(p2, s2, chunks, targets, lengths)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return n * chunksize * iters / dt


def measure_ceiling(n_dev, devices, iters=8):
    """CPU-emulation ceiling: aggregate throughput of an embarrassingly
    parallel matmul workload (no collectives, no model) at this mesh
    size.  On real chips this is ~flat per device; on N virtual devices
    sharing this host's cores it falls off with oversubscription — the
    train/infer efficiency divided by THIS curve isolates what the
    *program* (collectives included) costs vs what the emulation costs."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from xna_basecaller_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(devices=devices[:n_dev])
    sh = NamedSharding(mesh, P("data", None))
    n, k = 64 * n_dev, 512
    x = jax.device_put(
        np.random.default_rng(0).normal(size=(n, k)).astype(np.float32), sh)
    w = jax.device_put(
        np.random.default_rng(1).normal(size=(k, k)).astype(np.float32),
        NamedSharding(mesh, P(None, None)))

    @jax.jit
    def f(x_):
        for _ in range(16):
            x_ = jnp.tanh(x_ @ w)
        return x_

    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = f(y)
    jax.block_until_ready(y)
    return n * iters / (time.perf_counter() - t0)


def run_worker(args):
    """One process of the multi-process (jax.distributed) measurement:
    NPROC CPU processes x K local virtual devices = the honest
    single-host analog of multi-host training (each process runs its own
    runtime and reaches the others through real cross-process
    collectives, as hosts in a pod would over DCN/ICI)."""
    import time

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    os.environ["XNACALL_NO_COMPILE_CACHE"] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.nproc, process_id=args.worker_id)

    import jax.numpy as jnp
    import numpy as np

    from xna_basecaller_tpu.parallel import distributed as dist
    from xna_basecaller_tpu.parallel import mesh as mesh_lib
    from xna_basecaller_tpu.train.loop import make_optimizer, train_step

    cfg, model, params = build(args)
    mesh = mesh_lib.make_mesh()
    n_dev = args.nproc * args.local_devices
    assert len(jax.devices()) == n_dev
    optimizer = make_optimizer(lambda _: 1e-4)
    opt_state = optimizer.init(params)
    p = mesh_lib.replicate(mesh, params)
    s = mesh_lib.replicate(mesh, opt_state)

    n = args.batch_per_device * n_dev
    rng = np.random.default_rng(0)
    chunks = rng.normal(size=(n, args.chunksize)).astype(np.float32)
    t_len = max(args.chunksize // 45, 8)
    targets = rng.integers(1, 7, size=(n, t_len)).astype(np.int32)
    lengths = np.full(n, t_len, np.int32)
    lo, hi = (args.worker_id * n // args.nproc,
              (args.worker_id + 1) * n // args.nproc)
    c, t, L = dist.global_batch(mesh, chunks[lo:hi], targets[lo:hi],
                                lengths[lo:hi])

    def step(p_, s_, c_, t_, L_):
        return train_step(p_, s_, c_, t_, L_, cfg, optimizer, jnp.float32)

    p2, s2, loss, gn = step(p, s, c, t, L)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        p2, s2, loss, gn = step(p2, s2, c, t, L)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    if args.worker_id == 0:
        out = {"samples_per_s": n * args.chunksize * args.iters / dt,
               "n_devices": n_dev, "n_processes": args.nproc,
               "loss": float(loss)}
        with open(args.worker_out, "w") as fh:
            json.dump(out, fh)
    print(f"worker {args.worker_id} done", flush=True)


def run_multiprocess(args):
    """Launch NPROC copies of this script as jax.distributed workers and
    collect process 0's throughput."""
    import socket
    import subprocess
    import tempfile

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out_json = tempfile.mktemp(suffix=".json")
    procs = []
    for pid in range(args.multiprocess):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--worker-id", str(pid), "--nproc", str(args.multiprocess),
               "--port", str(port), "--local-devices",
               str(args.local_devices), "--worker-out", out_json,
               "--batch-per-device", str(args.batch_per_device),
               "--chunksize", str(args.chunksize),
               "--features", str(args.features),
               "--layers", str(args.layers), "--iters", str(args.iters)]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        if p.returncode != 0:
            raise SystemExit(f"worker failed:\n{out}")
    with open(out_json) as fh:
        return json.load(fh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8",
                    help="comma list of mesh sizes to measure")
    ap.add_argument("--batch-per-device", type=int, default=8)
    ap.add_argument("--chunksize", type=int, default=720)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--layers", type=int, default=5)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--mode", default="both",
                    choices=["infer", "train", "both"])
    ap.add_argument("--force-cpu-devices", type=int, default=0,
                    help="virtualise N CPU devices (single-chip env)")
    ap.add_argument("--out", default=None, help="write results JSON here")
    ap.add_argument("--multiprocess", type=int, default=0,
                    help="ALSO measure train over N jax.distributed "
                         "processes x --local-devices each")
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--ceiling", action="store_true",
                    help="measure the CPU-emulation ceiling per mesh size "
                         "and report ceiling-relative efficiencies")
    # internal worker plumbing (multiprocess mode)
    ap.add_argument("--worker-id", type=int, default=None)
    ap.add_argument("--nproc", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--worker-out", default=None)
    args = ap.parse_args()

    if args.worker_id is not None:
        run_worker(args)
        return

    sizes = [int(s) for s in args.devices.split(",")]
    if args.force_cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{args.force_cpu_devices}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    devices = jax.devices()
    sizes = [n for n in sizes if n <= len(devices)]
    cfg, model, params = build(args)

    results = {"chunksize": args.chunksize,
               "batch_per_device": args.batch_per_device,
               "features": args.features, "layers": args.layers,
               "platform": devices[0].platform, "modes": {}}
    ceiling = {}
    if args.ceiling:
        for n in sizes:
            ceiling[n] = measure_ceiling(n, devices)
            base = ceiling[sizes[0]] / sizes[0]
            print(f"[ceiling] n={n}: {ceiling[n]:.3e} rows/s "
                  f"eff={ceiling[n] / (n * base):.2f}", flush=True)
        results["ceiling"] = {
            n: {"rows_per_s": ceiling[n],
                "eff": ceiling[n] / (n * ceiling[sizes[0]] / sizes[0])}
            for n in sizes}
    for mode, fn in (("infer", measure_infer), ("train", measure_train)):
        if args.mode not in (mode, "both"):
            continue
        rows = {}
        for n in sizes:
            sps = fn(cfg, model, params, n, args.batch_per_device,
                     args.chunksize, args.iters, devices)
            rows[n] = {"samples_per_s": sps}
            base = rows[sizes[0]]["samples_per_s"] / sizes[0]
            rows[n]["weak_scaling_eff"] = sps / (n * base)
            if ceiling:
                ceff = ceiling[n] / (n * ceiling[sizes[0]] / sizes[0])
                rows[n]["eff_vs_ceiling"] = (
                    rows[n]["weak_scaling_eff"] / ceff)
            print(f"[{mode}] n={n}: {sps:.3e} samples/s "
                  f"eff={rows[n]['weak_scaling_eff']:.2f}"
                  + (f" vs-ceiling={rows[n]['eff_vs_ceiling']:.2f}"
                     if ceiling else ""), flush=True)
        results["modes"][mode] = rows
    if args.multiprocess:
        mp = run_multiprocess(args)
        # efficiency vs the single-process-per-device-count train base
        tr = results.get("modes", {}).get("train", {})
        if 1 in tr:
            base = tr[1]["samples_per_s"]
            mp["weak_scaling_eff"] = (
                mp["samples_per_s"] / (mp["n_devices"] * base))
        results["multiprocess_train"] = mp
        print(f"[mp-train] {mp['n_processes']}proc x "
              f"{args.local_devices}dev: {mp['samples_per_s']:.3e} "
              f"samples/s eff={mp.get('weak_scaling_eff', float('nan')):.2f}",
              flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()

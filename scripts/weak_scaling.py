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
    args = ap.parse_args()

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
            print(f"[{mode}] n={n}: {sps:.3e} samples/s "
                  f"eff={rows[n]['weak_scaling_eff']:.2f}", flush=True)
        results["modes"][mode] = rows
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""One-stop TPU measurement: train-step time (Pallas backward), int8 vs
f16 pure-device inference, and the per-stage step profile.

Run ONLY when the tunnel is otherwise idle (single-client relay).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xna_basecaller_tpu.utils.platform import (  # noqa: E402
    ensure_tunnel_journal_compact,
)

ensure_tunnel_journal_compact()


def measure_train(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.models.crf_model import Model
    from xna_basecaller_tpu.train.loop import make_optimizer, train_step

    cfg = ModelConfig(encoder=EncoderConfig(features=768, num_rnn_layers=5))
    model = Model(cfg)
    params = jax.device_get(model.init(jax.random.key(0)))
    optimizer = make_optimizer(lambda _: 1e-4)
    opt_state = optimizer.init(params)
    p = jax.device_put(params)
    s = jax.device_put(opt_state)
    rng = np.random.default_rng(time.time_ns() % 2**31)
    B, T = args.batch, 3600
    chunks = jax.device_put(
        rng.normal(size=(B, T)).astype(np.float32))
    targets = jax.device_put(
        rng.integers(1, 7, size=(B, 400)).astype(np.int32))
    lengths = jax.device_put(np.full(B, 400, np.int32))

    def step(p_, s_, c, t, L):
        return train_step(p_, s_, c, t, L, cfg, optimizer, jnp.bfloat16)

    p2, s2, loss, gn = step(p, s, chunks, targets, lengths)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    iters = args.iters
    for _ in range(iters):
        p2, s2, loss, gn = step(p2, s2, chunks, targets, lengths)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    sps = B * T / dt
    print(f"[train] {dt*1000:.0f} ms/step  {sps:.3e} samples/s "
          f"loss={float(loss):.3f}", flush=True)
    return {"ms_per_step": dt * 1000, "samples_per_s": sps}


def measure_infer_modes(args):
    """Pure-device inference: chained in-jit fori_loop over the full
    score+decode program, f16/bf16 vs int8 (honest methodology — host
    loops of identical dispatches get deduplicated by the relay)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.models.crf_model import Model, forward
    from xna_basecaller_tpu.ops.crf import decode_paths

    cfg = ModelConfig(encoder=EncoderConfig(features=768, num_rnn_layers=5))
    model = Model(cfg)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(time.time_ns() % 2**31)
    B, T = args.infer_batch, 3600
    sig = jax.device_put(rng.normal(size=(B, T)).astype(np.float32))

    out = {}
    for mode, int8 in (("bf16", False), ("int8", True)):
        @partial(jax.jit, static_argnames=("reps",))
        def loop(p, x, reps=args.inner):
            def body(_, carry):
                x_, acc = carry
                sc = forward(p, x_, cfg, compute_dtype=jnp.bfloat16,
                             inference=True, lstm_int8=int8)
                paths = decode_paths(sc, cfg.n_base, cfg.state_len)
                # chain: the decode output perturbs the next input so
                # the relay cannot deduplicate iterations
                x_ = x_ + (paths.sum() * 1e-12).astype(x_.dtype)
                return x_, acc + paths.sum()
            return jax.lax.fori_loop(0, reps, body, (x, jnp.int32(0)))

        r = loop(params, sig)
        jax.block_until_ready(r)
        # time a dispatch with FRESH input values: the relay's cassette
        # replays results for repeated (program, args) patterns, so both
        # identical args AND previously-seen outputs can serve from cache
        sig2 = jax.device_put(rng.normal(size=(B, T)).astype(np.float32))
        t0 = time.perf_counter()
        r = loop(params, sig2)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / args.inner
        sps = B * T / dt
        out[mode] = {"ms_per_batch": dt * 1000, "samples_per_s": sps}
        print(f"[infer-{mode}] {dt*1000:.1f} ms/batch  {sps:.3e} samples/s",
              flush=True)
    out["int8_speedup"] = (out["int8"]["samples_per_s"]
                           / out["bf16"]["samples_per_s"])
    print(f"[int8 speedup] {out['int8_speedup']:.2f}x", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--infer-batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--mode", default="both",
                    choices=["train", "infer", "both"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    res = {}
    if args.mode in ("train", "both"):
        res["train"] = measure_train(args)
    if args.mode in ("infer", "both"):
        res["infer"] = measure_infer_modes(args)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()

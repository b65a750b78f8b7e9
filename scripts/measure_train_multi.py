#!/usr/bin/env python
"""Measure flagship train throughput vs steps_per_dispatch (K batches
per device execution via train_step_multi's lax.scan).

Prints one JSON object mapping K -> train samples/s/chip.  Run only when
the chip is free (the tunnel admits one client).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from xna_basecaller_tpu.utils.platform import (  # noqa: E402
    ensure_tunnel_journal_compact,
)

ensure_tunnel_journal_compact()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xna_basecaller_tpu.core.config import ModelConfig
    from xna_basecaller_tpu.models.crf_model import Model
    from xna_basecaller_tpu.train import loop

    batch = 128
    cfg = ModelConfig()
    model = Model(cfg)
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    optimizer = loop.make_optimizer(lambda _: 5e-4)
    base_rng = jax.random.key(25)
    results = {}
    for K in (1, 2, 4, 8):
        params = jax.device_put(model.init(jax.random.key(0)), dev)
        opt_state = jax.device_put(
            optimizer.init(jax.device_get(params)), dev)
        cs = jax.device_put(rng.normal(
            size=(K, batch, 3600)).astype(np.float32), dev)
        ts = jax.device_put(rng.integers(
            1, 7, size=(K, batch, 400)).astype(np.int32), dev)
        ls = jax.device_put(np.full((K, batch), 400, np.int32), dev)
        sids = jnp.arange(K, dtype=jnp.int32)

        def dispatch(p, s, step0):
            if K == 1:
                return loop.train_step(
                    p, s, cs[0], ts[0], ls[0], cfg, optimizer,
                    dropout_rng=jax.random.fold_in(base_rng, step0))[:3]
            p, s, losses, _ = loop.train_step_multi(
                p, s, cs, ts, ls, sids + step0, base_rng, cfg, optimizer)
            return p, s, losses

        t0 = time.perf_counter()
        params, opt_state, loss = dispatch(params, opt_state, 0)
        jax.block_until_ready(loss)
        print(f"[K={K}] compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        best = 0.0
        for rep in range(3):
            n_disp = max(1, 8 // K)
            t0 = time.perf_counter()
            for d in range(n_disp):
                params, opt_state, loss = dispatch(
                    params, opt_state, (rep + 1) * 100 + d * K)
            jax.block_until_ready(loss)
            dt = time.perf_counter() - t0
            best = max(best, n_disp * K * batch * 3600 / dt)
        results[f"k{K}_b{batch}"] = best
        print(f"[K={K}] {best:.3e} train samples/s", file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

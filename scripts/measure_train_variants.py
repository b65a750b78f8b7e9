#!/usr/bin/env python
"""Measure flagship train-step throughput under the env-gated variants.

Each variant runs in a SUBPROCESS because the gates are read at import
time (ops/lstm_pallas._CELL_RESID_COMPUTE_DTYPE, ops/crf._pallas_log_path).
Prints one JSON object mapping variant -> train samples/s/chip.

Run only when the chip is free (the tunnel admits one client).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, time, sys
import numpy as np
import jax, jax.numpy as jnp
if os.environ.get("XNACALL_FORCE_CPU"):  # smoke mode: stay off the tunnel
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from xna_basecaller_tpu.core.config import ModelConfig
from xna_basecaller_tpu.models.crf_model import Model
from xna_basecaller_tpu.train import loop

batch = int(sys.argv[1])
cfg = ModelConfig()
model = Model(cfg)
params = model.init(jax.random.key(0))
rng = np.random.default_rng(0)
dev = jax.devices()[0]
c = jax.device_put(rng.normal(size=(batch, 3600)).astype(np.float32), dev)
t = jax.device_put(rng.integers(1, 7, size=(batch, 400)).astype(np.int32), dev)
lens = jax.device_put(np.full((batch,), 400, np.int32), dev)
optimizer = loop.make_optimizer(lambda _: 5e-4)
opt_state = jax.device_put(optimizer.init(jax.device_get(params)), dev)
params = jax.device_put(params, dev)
t0 = time.perf_counter()
params, opt_state, loss, _ = loop.train_step(
    params, opt_state, c, t, lens, cfg, optimizer)
print(f"compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
float(loss)
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        params, opt_state, loss, _ = loop.train_step(
            params, opt_state, c, t, lens, cfg, optimizer)
    float(loss)  # value fetch = honest completion clock
    best = max(best, n * batch * 3600 / (time.perf_counter() - t0))
print(best)
"""


def run_variant(name: str, env_extra: dict, batch: int) -> float | None:
    env = dict(os.environ)
    env.setdefault("AXON_JOURNAL_COMPACT", "1")
    env.update(env_extra)
    try:
        out = subprocess.run(
            [sys.executable, "-c", CHILD % {"repo": REPO}, str(batch)],
            env=env, capture_output=True, text=True, timeout=1800)
    except subprocess.TimeoutExpired:
        print(f"[{name}] TIMEOUT", file=sys.stderr)
        return None
    if out.returncode != 0:
        print(f"[{name}] rc={out.returncode}\n{out.stderr[-2000:]}",
              file=sys.stderr)
        return None
    val = float(out.stdout.strip().splitlines()[-1])
    print(f"[{name}] {val:.3e} train samples/s  "
          f"({out.stderr.strip().splitlines()[-1]})", file=sys.stderr)
    return val


def main():
    # both modes are the TPU defaults now (promoted on the r04
    # measurement, results/train_variants_r04.json) — the variants
    # explicitly pin every gate so the matrix stays meaningful
    variants = [
        ("baseline_b128", {"XNACALL_LSTM_CELL_RESID_BF16": "0",
                           "XNACALL_PALLAS_LOSS": "0"}, 128),
        ("cell_resid_bf16_b128", {"XNACALL_LSTM_CELL_RESID_BF16": "1",
                                  "XNACALL_PALLAS_LOSS": "0"}, 128),
        ("pallas_loss_b128", {"XNACALL_LSTM_CELL_RESID_BF16": "0",
                              "XNACALL_PALLAS_LOSS": "1"}, 128),
        ("both_b128", {"XNACALL_LSTM_CELL_RESID_BF16": "1",
                       "XNACALL_PALLAS_LOSS": "1"}, 128),
        ("baseline_b256", {"XNACALL_LSTM_CELL_RESID_BF16": "0",
                           "XNACALL_PALLAS_LOSS": "0"}, 256),
    ]
    results = {}
    for name, env_extra, batch in variants:
        results[name] = run_variant(name, env_extra, batch)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

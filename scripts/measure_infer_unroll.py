#!/usr/bin/env python
"""Pure-device inference throughput vs the LSTM recurrence unroll factor
(XNACALL_LSTM_UNROLL: U=2/BN<=256 default vs U=4/BN<=128).

Each variant runs in a SUBPROCESS (the gate is read at import time).
Prints one JSON object mapping variant -> samples/s/chip.  Run only when
the chip is free.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, %(repo)r)
from xna_basecaller_tpu.core.config import ModelConfig
from xna_basecaller_tpu.models.crf_model import Model, forward
from xna_basecaller_tpu.infer.basecall import _score_and_decode

batchsize, chunksize, n = 256, 3600, 8
cfg = ModelConfig()
model = Model(cfg)
params = jax.device_put(model.init(jax.random.key(0)))
batch = jax.device_put(np.random.default_rng(3).normal(
    size=(batchsize, chunksize)).astype(np.float16))
sd = model.seqdist

@jax.jit
def run(sig):
    def body(_, carry):
        s, acc = carry
        paths = _score_and_decode(
            forward(params, s, cfg, inference=True, lstm_int8=False),
            sd.n_base, sd.state_len, False)
        psum = jnp.sum(paths).astype(jnp.float32)
        return ((s.astype(jnp.float32) + 1e-6 * psum).astype(s.dtype), acc + psum)
    return jax.lax.fori_loop(0, n, body, (sig, 0.0))[1]

t0 = time.perf_counter()
float(run(batch))
print(f"compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    float(run(batch))
    best = max(best, n * batchsize * chunksize / (time.perf_counter() - t0))
print(best)
"""


def run_variant(name: str, env_extra: dict) -> float | None:
    env = dict(os.environ)
    env.setdefault("AXON_JOURNAL_COMPACT", "1")
    env.update(env_extra)
    try:
        out = subprocess.run(
            [sys.executable, "-c", CHILD % {"repo": REPO}],
            env=env, capture_output=True, text=True, timeout=1800)
    except subprocess.TimeoutExpired:
        print(f"[{name}] TIMEOUT", file=sys.stderr)
        return None
    if out.returncode != 0:
        print(f"[{name}] rc={out.returncode}\n{out.stderr[-2000:]}",
              file=sys.stderr)
        return None
    val = float(out.stdout.strip().splitlines()[-1])
    print(f"[{name}] {val:.3e} samples/s  "
          f"({out.stderr.strip().splitlines()[-1]})", file=sys.stderr)
    return val


def main():
    results = {}
    for name, env_extra in (
            ("unroll2", {"XNACALL_LSTM_UNROLL": "2"}),
            ("unroll4", {"XNACALL_LSTM_UNROLL": "4"}),
            ("unroll1", {"XNACALL_LSTM_UNROLL": "1"})):
        results[name] = run_variant(name, env_extra)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

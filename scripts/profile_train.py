"""Profile the flagship train step on the current backend.

Usage: python scripts/profile_train.py [scan|pallas] [batch] [--trace]

Times compile + steady-state steps of the full train step (forward, CRF
loss, backward, AdamW update) at flagship shape, and optionally component
pieces, to locate where the step time goes (VERDICT round-1 weak #1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "scan"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

from xna_basecaller_tpu.core.config import ModelConfig  # noqa: E402
from xna_basecaller_tpu.models import crf_model  # noqa: E402
from xna_basecaller_tpu.train import loop  # noqa: E402

if mode == "pallas":
    from xna_basecaller_tpu.ops import lstm as lstm_mod
    from xna_basecaller_tpu.ops.lstm_pallas import (
        lstm_forward_pallas_trainable,
    )
    lstm_mod.lstm_forward = lstm_forward_pallas_trainable

cfg = ModelConfig()
model = crf_model.Model(cfg)

import time as _t
_t0 = _t.perf_counter()
# init on the host CPU backend (the QR orthogonal init compiles slowly via
# the remote TPU compile service), then transfer once
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    params = jax.tree.map(np.asarray, model.init(jax.random.key(0)))
print(f"cpu init: {_t.perf_counter() - _t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
chunks = rng.normal(size=(batch, 3600)).astype(np.float32)
targets = rng.integers(1, 7, size=(batch, 400)).astype(np.int32)
lengths = np.full((batch,), 400, np.int32)

schedule = lambda step: 5e-4  # noqa: E731
optimizer = loop.make_optimizer(schedule)
with jax.default_device(cpu):
    opt_state = jax.tree.map(np.asarray, jax.jit(optimizer.init)(params))
print(f"opt init: {_t.perf_counter() - _t0:.1f}s", flush=True)

dev = jax.devices()[0]
params = jax.device_put(params, dev)
opt_state = jax.device_put(opt_state, dev)
c = jax.device_put(jnp.asarray(chunks), dev)
t = jax.device_put(jnp.asarray(targets), dev)
l = jax.device_put(jnp.asarray(lengths), dev)
jax.block_until_ready((params, opt_state, c))
print(f"mode={mode} batch={batch} devices={jax.devices()} "
      f"transfer done {_t.perf_counter() - _t0:.1f}s", flush=True)

t0 = time.perf_counter()
params, opt_state, loss, gn = loop.train_step(
    params, opt_state, c, t, l, cfg, optimizer)
jax.block_until_ready(loss)
print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
      f"loss={float(loss):.3f}", flush=True)

for trial in range(3):
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        params, opt_state, loss, gn = loop.train_step(
            params, opt_state, c, t, l, cfg, optimizer)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / n
    print(f"steady step: {dt * 1e3:.1f} ms  "
          f"({batch * 3600 / dt / 1e6:.2f}M samples/s)", flush=True)

if "--trace" in sys.argv:
    jax.profiler.start_trace("/tmp/jax-trace")
    for _ in range(2):
        params, opt_state, loss, gn = loop.train_step(
            params, opt_state, c, t, l, cfg, optimizer)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    print("trace written to /tmp/jax-trace", flush=True)

# component timings: forward only, forward+loss grad
def fwd_only(p, c):
    return crf_model.forward(p, c, cfg, jnp.bfloat16)


fwd_jit = jax.jit(fwd_only)
s = fwd_jit(params, c)
jax.block_until_ready(s)
t0 = time.perf_counter()
for _ in range(3):
    s = fwd_jit(params, c)
jax.block_until_ready(s)
print(f"forward only: {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms",
      flush=True)


def loss_from_scores(scores, t, l):
    return model.seqdist.ctc_loss(scores.astype(jnp.float32), t, l)


loss_grad = jax.jit(jax.grad(loss_from_scores))
g = loss_grad(s.astype(jnp.float32), t, l)
jax.block_until_ready(g)
t0 = time.perf_counter()
for _ in range(3):
    g = loss_grad(s.astype(jnp.float32), t, l)
jax.block_until_ready(g)
print(f"CRF loss grad (scores->dscores): "
      f"{(time.perf_counter() - t0) / 3 * 1e3:.1f} ms", flush=True)


# LSTM-stack isolation: fwd and fwd+bwd of just the 5-layer recurrence
# stack (768 wide, T'=720 at stride 5... T' = 3600/stride from config) —
# pins how much of the step the serial recurrences own.
def lstm_stack(p, x):
    from xna_basecaller_tpu.models.crf_model import rnn_directions
    from xna_basecaller_tpu.utils.platform import is_tpu
    if is_tpu():
        from xna_basecaller_tpu.ops.lstm_pallas import (
            lstm_forward_pallas_trainable as fwd,
        )
    else:
        from xna_basecaller_tpu.ops.lstm import lstm_forward as fwd
    for layer, rev in zip(p, rnn_directions(cfg)):
        x = fwd(layer, x, reverse=rev)
    return x


Tp = 3600 // cfg.encoder.stride
x_lstm = jax.device_put(
    rng.normal(size=(Tp, batch, cfg.encoder.features))
    .astype(np.float32)).astype(jnp.bfloat16)
rnn_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["rnn"])

f_jit = jax.jit(lstm_stack)
y = f_jit(rnn_bf16, x_lstm); jax.block_until_ready(y)
t0 = time.perf_counter()
for _ in range(3):
    y = f_jit(rnn_bf16, x_lstm)
jax.block_until_ready(y)
print(f"lstm stack fwd: {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms",
      flush=True)

g_jit = jax.jit(jax.grad(lambda p, x: jnp.sum(
    lstm_stack(p, x).astype(jnp.float32))))
g = g_jit(rnn_bf16, x_lstm); jax.block_until_ready(g)
t0 = time.perf_counter()
for _ in range(3):
    g = g_jit(rnn_bf16, x_lstm)
jax.block_until_ready(g)
print(f"lstm stack fwd+bwd: {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms",
      flush=True)

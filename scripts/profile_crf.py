"""Break down the CRF ctc_loss gradient cost on the current backend."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xna_basecaller_tpu.ops import crf

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
T, L, NB, SL = 720, 400, 6, 3

rng = np.random.default_rng(0)
cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
scores = jax.device_put(
    rng.normal(size=(T, N, 7 * NB ** SL)).astype(np.float32), dev)
targets = jax.device_put(
    rng.integers(1, 7, size=(N, L)).astype(np.int32), dev)
lengths = jax.device_put(np.full((N,), L, np.int32), dev)
jax.block_until_ready(scores)
print(f"N={N} dev={dev}", flush=True)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms",
          flush=True)
    return out


# full loss grad
full = jax.jit(jax.grad(
    lambda s: crf.ctc_loss(s, targets, lengths, NB, SL)))
timeit("ctc_loss grad (full)", full, scores)

# logZ (normalise) piece
lz_grad = jax.jit(jax.grad(lambda s: crf.logz_fwd(s, NB, SL).sum()))
timeit("logz_fwd grad", lz_grad, scores)

lz_fwd = jax.jit(lambda s: crf.logz_fwd(s, NB, SL))
timeit("logz_fwd fwd only", lz_fwd, scores)

# lattice piece
stay, move = jax.jit(
    lambda s: crf.prepare_ctc_scores(s, targets, NB, SL))(scores)
jax.block_until_ready((stay, move))
lat_grad = jax.jit(jax.grad(
    lambda st, mv: crf.ctc_lattice_logz_grad(st, mv,
                                             lengths + 1 - SL).sum(),
    argnums=(0, 1)))
timeit("lattice grad", lat_grad, stay, move)

lat_fwd = jax.jit(lambda st, mv: crf.ctc_lattice_logz(
    st, mv, lengths + 1 - SL))
timeit("lattice fwd only", lat_fwd, stay, move)

gather = jax.jit(jax.grad(
    lambda s: sum(x.sum() for x in crf.prepare_ctc_scores(
        s, targets, NB, SL))))
timeit("prepare_ctc_scores grad", gather, scores)

# Pallas decode-side scans for comparison
from xna_basecaller_tpu.ops import crf_pallas
fwdp = jax.jit(lambda s: crf_pallas.forward_scan_pallas(s, NB, SL))
timeit("pallas forward scan", fwdp, scores)
bwdp = jax.jit(lambda s: crf_pallas.backward_scan_pallas(s, NB, SL))
timeit("pallas backward scan", bwdp, scores)

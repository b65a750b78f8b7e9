"""Pallas fused LSTM recurrence kernel (TPU).

The LSTM stack dominates encoder time (SURVEY §7.4.3: 5 layers x 720 steps
x 768 hidden).  The input projection x @ W_ih is hoisted into one large MXU
matmul outside the kernel (ops/lstm.py does the same); this kernel runs the
sequential part — per step a [N, H] x [H, 4H] hidden matmul plus the gate
nonlinearities — with the recurrent state pinned in VMEM scratch across the
whole scan, and W_hh resident in VMEM, so each step touches HBM only for
its xp_t slice in and h_t out.

Grid: (T,) sequential.  VMEM budget at N=256, H=768 (bf16 weights, f32
state): W_hh 4.7MB + h/c 1.5MB + xp_t 1.5MB + y_t 0.4MB — comfortably
under the ~16MB/core limit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_scan_kernel(xp_ref, whh_ref, y_ref, h_ref, c_ref):
    """One timestep: gates = xp_t + h @ W_hh; LSTM cell update."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    h = h_ref[:]
    gates = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(whh_ref.dtype), whh_ref[:],
        preferred_element_type=jnp.float32)
    H = h.shape[1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c = f * c_ref[:] + i * g
    h_new = o * jnp.tanh(c)
    c_ref[:] = c
    h_ref[:] = h_new
    y_ref[0] = h_new.astype(y_ref.dtype)


@partial(jax.jit, static_argnames=())
def lstm_recurrence_pallas(xp, w_hh):
    """xp [T, N, 4H] (input projections + bias), w_hh [H, 4H] ->
    hidden states [T, N, H]."""
    T, N, H4 = xp.shape
    H = H4 // 4
    return pl.pallas_call(
        _lstm_scan_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, N, H4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, H), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N, H), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((N, H), jnp.float32),
            pltpu.VMEM((N, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(xp, w_hh)


def lstm_forward_pallas(params, x, reverse: bool = False):
    """Drop-in replacement for ops.lstm.lstm_forward using the fused
    kernel for the recurrence."""
    if reverse:
        x = jnp.flip(x, axis=0)
    xp = (jnp.einsum("tni,ih->tnh", x, params["w_ih"],
                     preferred_element_type=jnp.float32)
          + params["bias"]).astype(x.dtype)
    ys = lstm_recurrence_pallas(xp, params["w_hh"])
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return ys


def lstm_stack_forward_pallas(layers, directions, x):
    for params, rev in zip(layers, directions):
        x = lstm_forward_pallas(params, x, reverse=rev)
    return x

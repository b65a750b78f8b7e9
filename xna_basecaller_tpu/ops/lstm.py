"""LSTM layers as JAX scans, TPU-first.

Replaces the reference's torch.nn.LSTM stack (reference:
ub-bonito/bonito/nn.py:176-235).  Design choices for the MXU:

* The input projection ``x @ W_ih`` for ALL timesteps is hoisted out of the
  recurrence into one large [T*N, in] x [in, 4H] matmul; only the hidden
  projection [N, H] x [H, 4H] remains inside the sequential scan.
* Gate order is torch's (i, f, g, o) so torch checkpoints can be imported
  without reshuffling (reference nn.py:231-234 exports (iW, sW, b) blocks).
* ``bias_hh`` is disabled, matching RNNWrapper.disable_state_bias
  (reference nn.py:209-213): only ``bias_ih`` exists.
* Parameters are stored as [in, 4H] / [H, 4H] (already transposed for the
  right-multiply layout XLA prefers).

Weight init mirrors the reference exactly in distribution: per-gate
orthogonal for both weight matrices (reference nn.py:201-207) and
0.5 * truncated_normal(+-2) for bias_ih (reference nn.py:170-173, 195-199).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def init_lstm_params(key, insize: int, size: int, dtype=jnp.float32):
    """Orthogonal per-gate init + truncated-normal input bias."""
    k_ih, k_hh, k_b = jax.random.split(key, 3)
    kis = jax.random.split(k_ih, 4)
    khs = jax.random.split(k_hh, 4)
    # torch stores weight_ih as [4H, in] and orthogonalises each [H, in]
    # block; we store the transpose [in, 4H].
    w_ih = jnp.concatenate(
        [jax.random.orthogonal(k, max(insize, size))[:insize, :size]
         for k in kis], axis=1)
    w_hh = jnp.concatenate(
        [jax.random.orthogonal(k, size) for k in khs], axis=1)
    bias = 0.5 * jnp.clip(
        jax.random.truncated_normal(k_b, -2.0, 2.0, (4 * size,)), -2.0, 2.0)
    return {
        "w_ih": w_ih.astype(dtype),
        "w_hh": w_hh.astype(dtype),
        "bias": bias.astype(dtype),
    }


def lstm_cell_step(h, c, gates, hidden: int):
    """One LSTM cell update from pre-activation gates [N, 4H] (i,f,g,o)."""
    i, f, g, o = (gates[:, k * hidden:(k + 1) * hidden] for k in range(4))
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


@partial(jax.jit, static_argnames=("reverse",))
def lstm_forward(params, x, reverse: bool = False):
    """Run one LSTM over [T, N, in] -> [T, N, H].

    ``reverse=True`` flips time before and after, matching the reference's
    alternating-direction stack (reference nn.py:189-193).
    """
    if reverse:
        x = jnp.flip(x, axis=0)
    T, N, _ = x.shape
    hidden = params["w_hh"].shape[0]
    # Hoisted input projection: one big MXU matmul over all timesteps.
    xp = (
        jnp.einsum("tni,ih->tnh", x, params["w_ih"],
                   preferred_element_type=jnp.float32)
        + params["bias"]
    ).astype(x.dtype)

    w_hh = params["w_hh"]

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + jnp.dot(h, w_hh, preferred_element_type=jnp.float32
                               ).astype(xp_t.dtype)
        h, c = lstm_cell_step(h, c, gates, hidden)
        return (h, c), h

    h0 = jnp.zeros((N, hidden), x.dtype)
    c0 = jnp.zeros((N, hidden), x.dtype)
    _, ys = jax.lax.scan(step, (h0, c0), xp)
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return ys


def init_lstm_stack(key, num_layers: int, insize: int, size: int,
                    dtype=jnp.float32):
    """Alternating-direction LSTM stack (reverse first), as in the
    reference encoder (crf/model.py:152-154): directions are
    [True, False, True, False, True] for 5 layers."""
    keys = jax.random.split(key, num_layers)
    layers = []
    for i, k in enumerate(keys):
        layers.append(init_lstm_params(
            k, insize if i == 0 else size, size, dtype))
    directions = tuple((i % 2) == 0 for i in range(num_layers))
    return layers, directions


def lstm_stack_forward(layers, directions, x):
    for params, rev in zip(layers, directions):
        x = lstm_forward(params, x, reverse=rev)
    return x

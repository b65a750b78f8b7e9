"""Fit loop for the modified-base classifier.

The reference downloads pretrained remora models; with no model zoo in
this environment the classifier is trained locally instead — from any
source of labelled (signal window, sequence context, is_modified)
examples, e.g. chunk dumps of control vs modified libraries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xna_basecaller_tpu.mods.model import (
    ModsConfig, init_mods_params, mods_forward,
)


def fit(cfg: ModsConfig, sig: np.ndarray, ctx: np.ndarray,
        labels: np.ndarray, epochs: int = 5, batch: int = 256,
        lr: float = 1e-3, seed: int = 0, log=None):
    """Train from arrays sig [N, sig_window], ctx [N, 2*context+1],
    labels [N] in {0, 1}.  Returns (params, history)."""
    params = init_mods_params(jax.random.key(seed), cfg)
    opt = optax.adamw(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, s, c, y):
        def loss_fn(p):
            logits = mods_forward(p, s, c, cfg)
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = len(labels)
    sig = np.asarray(sig, np.float32)
    ctx = np.asarray(ctx, np.int32)
    y = np.asarray(labels, np.float32)
    history = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - batch + 1, batch):
            idx = order[i: i + batch]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(sig[idx]),
                jnp.asarray(ctx[idx]), jnp.asarray(y[idx]))
            losses.append(float(loss))
        history.append(float(np.mean(losses)) if losses else float("nan"))
        if log is not None:
            log(f"[mods epoch {epoch + 1}] loss={history[-1]:.4f}")
    return params, history


def accuracy(cfg: ModsConfig, params, sig, ctx, labels) -> float:
    logits = mods_forward(params, jnp.asarray(sig, jnp.float32),
                          jnp.asarray(ctx, jnp.int32), cfg)
    pred = np.asarray(logits) > 0
    return float((pred == np.asarray(labels, bool)).mean())

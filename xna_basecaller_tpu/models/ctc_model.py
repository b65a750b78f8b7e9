"""Legacy CTC model family: QuartzNet-style TCS-conv encoder + CTC head.

TPU-first re-design of the reference QuartzNet template (reference:
ub-bonito/bonito/ctc/model.py:14-204): config-driven blocks of
time-channel-separable convolutions with batchnorm, residual connections
and dropout, a 1x1-conv decoder, log-softmax output [T, N, C], and the
CTC + label-smoothing loss (ctc/model.py:48-54).

Design notes (how this maps to TPU, not a torch translation):
* Activations live in [N, T, C] (feature-minor) so XLA tiles channels onto
  lanes; every conv is ``lax.conv_general_dilated`` with ('NWC','WIO','NWC')
  dimension numbers which lower onto the MXU; the depthwise half of a
  separable conv uses ``feature_group_count``.
* BatchNorm keeps {scale, bias, mean, var} in the parameter pytree.
  Inference applies the folded affine (one fused multiply-add); training
  normalises with batch statistics and returns updated running stats as an
  aux output — the train step writes them back after the optimiser update
  and masks them out of the gradient (they are buffers, not weights).
* The whole forward is one jitted pure function over static config, so the
  basecall pipeline compiles exactly one executable per batch shape.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from xna_basecaller_tpu.core.config import BlockConfig, ModelConfig
from xna_basecaller_tpu.ops import ctc as ctc_ops
from xna_basecaller_tpu.ops.conv import ACTIVATIONS

_DN = ("NWC", "WIO", "NWC")
_BN_EPS = 1e-3
_BN_MOMENTUM = 0.1


def _init_conv(key, insize, size, winlen, groups: int = 1, bias: bool = False,
               dtype=jnp.float32):
    k_w, k_b = jax.random.split(key)
    fan_in = (insize // groups) * winlen
    bound = math.sqrt(6.0 / fan_in)
    w = jax.random.uniform(
        k_w, (winlen, insize // groups, size), minval=-bound, maxval=bound)
    out = {"w": w.astype(dtype)}
    if bias:
        bb = 1.0 / math.sqrt(fan_in)
        out["b"] = jax.random.uniform(
            k_b, (size,), minval=-bb, maxval=bb).astype(dtype)
    return out


def _init_bn(size, dtype=jnp.float32):
    return {"scale": jnp.ones((size,), dtype),
            "bias": jnp.zeros((size,), dtype),
            "mean": jnp.zeros((size,), jnp.float32),
            "var": jnp.ones((size,), jnp.float32)}


def _init_tcs(key, insize, size, kernel, separable, dtype):
    if separable:
        k1, k2 = jax.random.split(key)
        return {"depthwise": _init_conv(k1, insize, insize, kernel,
                                        groups=insize, dtype=dtype),
                "pointwise": _init_conv(k2, insize, size, 1, dtype=dtype)}
    return {"conv": _init_conv(key, insize, size, kernel, dtype=dtype)}


def init_params(key, cfg: ModelConfig, dtype=jnp.float32) -> dict[str, Any]:
    blocks = []
    insize = cfg.input_features
    keys = jax.random.split(key, len(cfg.blocks) + 1)
    for bk, blk in zip(keys[:-1], cfg.blocks):
        sub = jax.random.split(bk, blk.repeat + 1)
        convs = []
        _in = insize
        for i in range(blk.repeat):
            convs.append({
                "tcs": _init_tcs(sub[i], _in, blk.filters, blk.kernel[0],
                                 blk.separable, dtype),
                "bn": _init_bn(blk.filters, dtype),
            })
            _in = blk.filters
        entry: dict[str, Any] = {"convs": convs}
        if blk.residual:
            entry["residual"] = {
                "tcs": _init_tcs(sub[-1], insize, blk.filters, 1, False,
                                 dtype),
                "bn": _init_bn(blk.filters, dtype),
            }
        blocks.append(entry)
        insize = blk.filters
    decoder = _init_conv(keys[-1], insize, len(cfg.labels), 1, bias=True,
                         dtype=dtype)
    return {"blocks": blocks, "decoder": decoder}


def _tcs_forward(p, x, stride: int, dilation: int, padding: int):
    if "depthwise" in p:
        cin = x.shape[-1]
        y = jax.lax.conv_general_dilated(
            x, p["depthwise"]["w"], window_strides=(stride,),
            padding=[(padding, padding)], rhs_dilation=(dilation,),
            dimension_numbers=_DN, feature_group_count=cin,
            preferred_element_type=jnp.float32).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            y, p["pointwise"]["w"], window_strides=(1,), padding=[(0, 0)],
            dimension_numbers=_DN,
            preferred_element_type=jnp.float32).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, p["conv"]["w"], window_strides=(stride,),
        padding=[(padding, padding)], rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32).astype(x.dtype)


def _bn_forward(p, x, train: bool):
    """Returns (y, new_stats).  Inference folds running stats into one
    scale/shift; training normalises by batch statistics over (N, T)."""
    if train:
        mean = jnp.mean(x, axis=(0, 1))
        var = jnp.var(x, axis=(0, 1))
        new = {"mean": (1 - _BN_MOMENTUM) * p["mean"]
               + _BN_MOMENTUM * mean.astype(jnp.float32),
               "var": (1 - _BN_MOMENTUM) * p["var"]
               + _BN_MOMENTUM * var.astype(jnp.float32)}
    else:
        mean, var = p["mean"], p["var"]
        new = None
    scale = p["scale"] * jax.lax.rsqrt(var.astype(jnp.float32) + _BN_EPS)
    y = (x - mean) * scale + p["bias"]
    return y.astype(x.dtype), new


def _block_forward(p, blk: BlockConfig, x, act, train: bool, dropout):
    pad = (blk.kernel[0] // 2) * blk.dilation[0]
    new_stats: dict[str, Any] = {"convs": []}
    y = x
    for i, conv in enumerate(p["convs"]):
        y = _tcs_forward(conv["tcs"], y, blk.stride[0], blk.dilation[0], pad)
        y, ns = _bn_forward(conv["bn"], y, train)
        new_stats["convs"].append(ns)
        if i < blk.repeat - 1:          # last conv: bn only, act after res
            y = dropout(act(y))
    if blk.residual:
        r = _tcs_forward(p["residual"]["tcs"], x, 1, 1, 0)
        r, ns = _bn_forward(p["residual"]["bn"], r, train)
        new_stats["residual"] = ns
        y = y + r
    return dropout(act(y)), new_stats


@partial(jax.jit, static_argnames=("cfg", "train", "compute_dtype"))
def forward(params, signal, cfg: ModelConfig, train: bool = False,
            dropout_rng=None, compute_dtype=jnp.float32):
    """Raw signal [N, T_sig] -> log-probs [T, N, C] float32.

    With ``train=True`` also returns the updated batchnorm running-stats
    pytree (same structure as params["blocks"], stats leaves only).
    """
    if signal.ndim == 2:
        signal = signal[..., None]
    act = ACTIVATIONS[cfg.encoder.activation]
    x = signal.astype(compute_dtype)
    rngs = (jax.random.split(dropout_rng, len(cfg.blocks))
            if dropout_rng is not None else [None] * len(cfg.blocks))
    all_stats = []
    for p, blk, rng in zip(params["blocks"], cfg.blocks, rngs):
        if rng is not None and blk.dropout > 0:
            def dropout(y, rng=rng, rate=blk.dropout):
                keep = jax.random.bernoulli(rng, 1.0 - rate, y.shape)
                return jnp.where(keep, y / (1.0 - rate), 0.0).astype(y.dtype)
        else:
            def dropout(y):
                return y
        x, stats = _block_forward(p, blk, x, act, train, dropout)
        all_stats.append(stats)
    logits = jax.lax.conv_general_dilated(
        x, params["decoder"]["w"].astype(compute_dtype), window_strides=(1,),
        padding=[(0, 0)], dimension_numbers=_DN,
        preferred_element_type=jnp.float32) + params["decoder"]["b"]
    logits = jnp.transpose(logits, (1, 0, 2)).astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    if train:
        return log_probs, all_stats
    return log_probs


def merge_bn_stats(params, all_stats):
    """Write updated running stats back into the parameter pytree."""
    out = dict(params)
    blocks = []
    for p, stats in zip(params["blocks"], all_stats):
        entry = {"convs": [
            {**c, "bn": {**c["bn"], **ns}} if ns else c
            for c, ns in zip(p["convs"], stats["convs"])]}
        if "residual" in p:
            ns = stats.get("residual")
            entry["residual"] = ({**p["residual"],
                                  "bn": {**p["residual"]["bn"], **ns}}
                                 if ns else p["residual"])
        blocks.append(entry)
    out["blocks"] = blocks
    return out


def bn_stat_mask(params):
    """Pytree of bools: True for trainable leaves, False for bn buffers —
    feed to optax.masked so running stats get no weight decay/updates."""
    def mask_entry(path_is_stat, leaf):
        return not path_is_stat

    def walk(tree, in_bn=False):
        if isinstance(tree, dict):
            return {k: walk(v, in_bn or k == "bn") for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, in_bn) for v in tree]
        return True

    mask = walk(params)

    # bn mean/var are buffers
    def fix(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k == "bn" and isinstance(v, dict):
                    out[k] = {kk: kk in ("scale", "bias") for kk in v}
                else:
                    out[k] = fix(v)
            return out
        if isinstance(tree, list):
            return [fix(v) for v in tree]
        return tree
    return fix(mask)


@partial(jax.jit, static_argnames=("cfg", "optimizer"),
         donate_argnames=("params", "opt_state"))
def train_step(params, opt_state, chunks, targets, lengths, cfg: ModelConfig,
               optimizer, dropout_rng=None):
    """One CTC optimisation step (forward, masked CTC+label-smoothing loss,
    backward, optimiser update, batchnorm running-stat writeback).

    The caller's optax chain is expected to include gradient clipping
    (train/loop.py::make_optimizer does); batchnorm buffers get zero
    gradient so weight decay cannot drift them."""
    import optax

    def loss_fn(p):
        log_probs, stats = forward(p, chunks, cfg, train=True,
                                   dropout_rng=dropout_rng)
        nll = -ctc_ops.ctc_loss_logz(
            log_probs, targets, jnp.maximum(lengths, 1))
        per = nll / jnp.maximum(lengths.astype(nll.dtype), 1.0)
        valid = (lengths > 0).astype(nll.dtype)  # mesh-padding rows
        ctc = jnp.sum(per * valid) / jnp.maximum(valid.sum(), 1.0)
        C = log_probs.shape[2]
        weights = jnp.concatenate([
            jnp.array([0.4], log_probs.dtype),
            jnp.full((C - 1,), 0.1 / (C - 1), log_probs.dtype)])
        smooth = -jnp.mean(log_probs * weights)
        return ctc + smooth, stats

    (loss, stats), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    mask = bn_stat_mask(params)
    grads = jax.tree.map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
    grad_norm = optax.global_norm(grads)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = merge_bn_stats(optax.apply_updates(params, updates), stats)
    return params, opt_state, loss, grad_norm


@dataclass(frozen=True)
class CtcModel:
    """Functional bundle mirroring the reference Model surface
    (ctc/model.py:14-54): forward, decode, loss."""

    cfg: ModelConfig

    @property
    def stride(self) -> int:
        s = 1
        for blk in self.cfg.blocks:
            s *= blk.stride[0]
        return s

    @property
    def alphabet(self) -> str:
        return self.cfg.alphabet

    def init(self, key, dtype=jnp.float32):
        return init_params(key, self.cfg, dtype)

    def apply(self, params, signal, compute_dtype=jnp.float32,
              inference: bool = True):
        return forward(params, signal, self.cfg,
                       compute_dtype=compute_dtype)

    def decode_batch(self, log_probs) -> list[str]:
        """Greedy (viterbi) decode of a [T, N, C] batch on device, collapse
        on host."""
        paths, _ = ctc_ops.greedy_paths(log_probs)
        paths = np.asarray(paths)
        return [ctc_ops.collapse_path(p, alphabet=self.alphabet)[0]
                for p in paths]

    def decode(self, log_probs_single, beamsize: int = 5,
               threshold: float = 1e-3, qscores: bool = False,
               return_path: bool = False):
        """Reference Model.decode contract (ctc/model.py:39-46) over one
        read's [T', C] log-probs."""
        lp = np.asarray(log_probs_single, np.float32)
        if beamsize == 1 or qscores:
            path, prob = (np.argmax(lp, axis=1),
                          np.exp(np.max(lp, axis=1)))
            seq, qstring, moves = ctc_ops.collapse_path(
                path, prob, self.alphabet,
                qscale=self.cfg.qscore.scale, qbias=self.cfg.qscore.bias)
            out_seq = seq + qstring if qscores else seq
            if return_path:
                return out_seq, np.where(moves)[0]
            return out_seq
        seq, path = ctc_ops.beam_search(
            np.exp(lp), self.alphabet, beamsize, threshold)
        if return_path:
            return seq, path
        return seq

    def loss(self, log_probs, targets, lengths, **kw):
        return ctc_ops.ctc_label_smoothing_loss(
            log_probs, targets, lengths)["loss"]

    def n_params(self, params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def quartznet5x5_config(labels: str = "NACGT") -> ModelConfig:
    """The QuartzNet 5x5 shape the reference CTC family trains
    (https://arxiv.org/pdf/1910.10261.pdf; reference ctc/model.py:56-84
    builds it from [[block]] config sections)."""
    blocks = (
        BlockConfig(filters=256, repeat=1, kernel=(33,), stride=(3,),
                    separable=False),                        # C1
        BlockConfig(filters=256, repeat=5, kernel=(33,), residual=True,
                    separable=True, dropout=0.05),
        BlockConfig(filters=256, repeat=5, kernel=(39,), residual=True,
                    separable=True, dropout=0.05),
        BlockConfig(filters=512, repeat=5, kernel=(51,), residual=True,
                    separable=True, dropout=0.05),
        BlockConfig(filters=512, repeat=5, kernel=(63,), residual=True,
                    separable=True, dropout=0.05),
        BlockConfig(filters=512, repeat=5, kernel=(75,), residual=True,
                    separable=True, dropout=0.05),
        BlockConfig(filters=512, repeat=1, kernel=(87,),
                    separable=True),                         # C2
        BlockConfig(filters=1024, repeat=1, kernel=(1,),
                    separable=False),                        # C3
    )
    from xna_basecaller_tpu.core.config import ModelConfig as MC
    return MC(labels=tuple(labels), blocks=blocks,
              package="xna_basecaller_tpu.models.ctc_model")

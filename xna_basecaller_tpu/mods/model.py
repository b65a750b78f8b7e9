"""Modified-base classifier model.

Remora-equivalent architecture (reference mod_util.py loads remora's
conv models), sized for the same job: given a fixed window of raw signal
centred on a candidate site plus the basecalled sequence context, emit
the probability that the canonical base is modified.

Kept deliberately small and static-shaped: sites are gathered host-side
into [N, sig_window] / [N, 2*context+1] batches, so the whole classifier
is one jitted dense pipeline (conv -> conv -> concat one-hot context ->
MLP) that XLA fuses into a couple of MXU calls.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import asdict, dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xna_basecaller_tpu.core.alphabet import BASES

ALPHABET = BASES  # NACGTXY, matches the basecaller codes


@dataclass(frozen=True)
class ModsConfig:
    motif: str = "CG"        # canonical motif to screen
    motif_offset: int = 0    # index of the modifiable base within motif
    canonical: str = "C"     # canonical base letter (SAM MM base)
    mod_code: str = "m"      # SAM base-mod code (m = 5mC, a = 6mA, ...)
    mod_long_name: str = "5mC"
    sig_window: int = 64     # raw-signal samples centred on the site
    context: int = 4         # sequence context bases either side
    conv1: int = 16
    conv2: int = 32
    hidden: int = 64
    kernel: int = 5


def init_mods_params(key, cfg: ModsConfig, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def _conv(key, cin, cout, k):
        bound = math.sqrt(6.0 / (cin * k))
        return {
            "w": jax.random.uniform(
                key, (k, cin, cout), minval=-bound, maxval=bound,
                dtype=dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    def _dense(key, cin, cout):
        bound = math.sqrt(6.0 / cin)
        return {
            "w": jax.random.uniform(
                key, (cin, cout), minval=-bound, maxval=bound, dtype=dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    w = cfg.sig_window
    for _ in range(2):
        w = (w + 1) // 2  # two stride-2 convs (SAME)
    flat = w * cfg.conv2
    ctx_feats = (2 * cfg.context + 1) * len(ALPHABET)
    return {
        "c1": _conv(k1, 1, cfg.conv1, cfg.kernel),
        "c2": _conv(k2, cfg.conv1, cfg.conv2, cfg.kernel),
        "d1": _dense(k3, flat + ctx_feats, cfg.hidden),
        "d2": _dense(k4, cfg.hidden, 1),
    }


@partial(jax.jit, static_argnames=("cfg",))
def mods_forward(params, sig, ctx_codes, cfg: ModsConfig):
    """sig [N, sig_window] float32, ctx_codes [N, 2*context+1] int32
    (ALPHABET codes) -> mod logits [N]."""
    x = sig[:, :, None]  # [N, W, 1]
    for name in ("c1", "c2"):
        x = jax.lax.conv_general_dilated(
            x, params[name]["w"], window_strides=(2,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC")) + params[name]["b"]
        x = jax.nn.relu(x)
    x = x.reshape(x.shape[0], -1)
    onehot = jax.nn.one_hot(ctx_codes, len(ALPHABET), dtype=x.dtype)
    x = jnp.concatenate([x, onehot.reshape(x.shape[0], -1)], axis=-1)
    x = jax.nn.relu(jnp.dot(x, params["d1"]["w"]) + params["d1"]["b"])
    return (jnp.dot(x, params["d2"]["w"]) + params["d2"]["b"])[:, 0]


def save_mods_model(dirname: str, cfg: ModsConfig, params) -> None:
    os.makedirs(dirname, exist_ok=True)
    with open(os.path.join(dirname, "mods_config.json"), "w") as fh:
        json.dump(asdict(cfg), fh, indent=2)
    flat = {}
    for layer, tree in params.items():
        for k, v in tree.items():
            flat[f"{layer}.{k}"] = np.asarray(v)
    np.savez(os.path.join(dirname, "mods_weights.npz"), **flat)


def load_mods_model(dirname: str):
    with open(os.path.join(dirname, "mods_config.json")) as fh:
        cfg = ModsConfig(**json.load(fh))
    data = np.load(os.path.join(dirname, "mods_weights.npz"))
    params: dict = {}
    for key in data.files:
        layer, name = key.split(".")
        params.setdefault(layer, {})[name] = jnp.asarray(data[key])
    return cfg, params

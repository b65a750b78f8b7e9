"""1-D convolution stack for the signal encoder.

Replaces the reference conv front-end (reference: ub-bonito/bonito/crf/
model.py:138-151, nn.py:57-84): conv(1->4, k5) -> conv(4->16, k5) ->
conv(16->features, k19, stride) with 'same'-style padding ks//2 and swish.

TPU-first layout: activations are [N, T, C] (feature-minor) so XLA tiles the
channel axis onto lanes; convolutions use lax.conv_general_dilated with
('NWC', 'WIO', 'NWC') dimension numbers which lower onto the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_DN = ("NWC", "WIO", "NWC")


def init_conv_params(key, insize: int, size: int, winlen: int,
                     dtype=jnp.float32):
    """Kaiming-uniform weight + uniform bias, matching torch Conv1d defaults
    (the distribution the reference trains from)."""
    k_w, k_b = jax.random.split(key)
    fan_in = insize * winlen
    bound_w = math.sqrt(6.0 / fan_in)  # kaiming_uniform(a=sqrt(5))
    w = jax.random.uniform(
        k_w, (winlen, insize, size), minval=-bound_w, maxval=bound_w)
    bound_b = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(k_b, (size,), minval=-bound_b, maxval=bound_b)
    return {"w": w.astype(dtype), "b": b.astype(dtype)}


def conv1d(params, x, stride: int = 1, padding: int | None = None):
    """x: [N, T, Cin] -> [N, T', Cout]."""
    winlen = params["w"].shape[0]
    if padding is None:
        padding = winlen // 2
    y = jax.lax.conv_general_dilated(
        x, params["w"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    return (y + params["b"]).astype(x.dtype)


ACTIVATIONS = {
    "swish": jax.nn.silu,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    None: lambda x: x,
}


def init_conv_stack(key, insize: int, first: int, second: int,
                    features: int, winlen: int, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return [
        init_conv_params(k1, insize, first, 5, dtype),
        init_conv_params(k2, first, second, 5, dtype),
        init_conv_params(k3, second, features, winlen, dtype),
    ]


def conv_stack_forward(layers, x, stride: int, activation: str = "swish"):
    """[N, T, insize] -> [N, T // stride, features]."""
    act = ACTIVATIONS[activation]
    x = act(conv1d(layers[0], x, stride=1))
    x = act(conv1d(layers[1], x, stride=1))
    x = act(conv1d(layers[2], x, stride=stride))
    return x

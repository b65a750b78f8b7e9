"""Torch checkpoint import: numeric parity against a torch-built oracle.

Builds a reference-format state_dict with torch primitives, computes the
encoder forward with torch ops directly (the documented architecture:
3 convs pad ks//2 + swish, alternating-direction LSTMs, linear head with
tanh*scale and blank expansion), imports the checkpoint, and checks this
framework's forward matches to float tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig  # noqa: E402
from xna_basecaller_tpu.models import crf_model  # noqa: E402
from xna_basecaller_tpu.utils.torch_import import import_state_dict  # noqa: E402

F = 16  # features
NB, SL = 4, 2  # 4-base, state_len 2 for a small head


def build_torch_state(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def rand(*shape):
        return torch.randn(*shape, generator=g) * 0.2

    # Serial indices mirror the reference encoder layout
    # (crf/model.py:147-160): convs at 0,1,2; Permute at 3; LSTMs 4..8;
    # head at 9.  Here: 2 LSTMs at 4,5 and head at 6 for a small model.
    sd["encoder.0.conv.weight"] = rand(4, 1, 5)
    sd["encoder.0.conv.bias"] = rand(4)
    sd["encoder.1.conv.weight"] = rand(8, 4, 5)
    sd["encoder.1.conv.bias"] = rand(8)
    sd["encoder.2.conv.weight"] = rand(F, 8, 9)
    sd["encoder.2.conv.bias"] = rand(F)
    for i in (4, 5):
        sd[f"encoder.{i}.rnn.weight_ih_l0"] = rand(4 * F, F)
        sd[f"encoder.{i}.rnn.weight_hh_l0"] = rand(4 * F, F)
        sd[f"encoder.{i}.rnn.bias_ih_l0"] = rand(4 * F)
        sd[f"encoder.{i}.rnn.bias_hh_l0"] = torch.zeros(4 * F)
    head_size = NB ** (SL + 1)
    sd["encoder.6.linear.weight"] = rand(head_size, F)
    sd["encoder.6.linear.bias"] = rand(head_size)
    return sd


def torch_forward(sd, x):
    """Oracle: the documented reference encoder math in raw torch ops."""
    import torch.nn.functional as tf

    h = x  # [N, 1, T]
    h = tf.silu(tf.conv1d(h, sd["encoder.0.conv.weight"],
                          sd["encoder.0.conv.bias"], padding=2))
    h = tf.silu(tf.conv1d(h, sd["encoder.1.conv.weight"],
                          sd["encoder.1.conv.bias"], padding=2))
    h = tf.silu(tf.conv1d(h, sd["encoder.2.conv.weight"],
                          sd["encoder.2.conv.bias"], stride=5, padding=4))
    h = h.permute(2, 0, 1)  # [T, N, C]

    for i, reverse in ((4, True), (5, False)):
        lstm = torch.nn.LSTM(F, F)
        with torch.no_grad():
            lstm.weight_ih_l0.copy_(sd[f"encoder.{i}.rnn.weight_ih_l0"])
            lstm.weight_hh_l0.copy_(sd[f"encoder.{i}.rnn.weight_hh_l0"])
            lstm.bias_ih_l0.copy_(sd[f"encoder.{i}.rnn.bias_ih_l0"])
            lstm.bias_hh_l0.copy_(sd[f"encoder.{i}.rnn.bias_hh_l0"])
        if reverse:
            h = lstm(h.flip(0))[0].flip(0)
        else:
            h = lstm(h)[0]

    scores = h @ sd["encoder.6.linear.weight"].T + sd["encoder.6.linear.bias"]
    scores = torch.tanh(scores) * 5.0
    T, N, C = scores.shape
    scores = torch.nn.functional.pad(
        scores.view(T, N, C // NB, NB), (1, 0), value=2.0).view(T, N, -1)
    return scores


def test_torch_checkpoint_forward_parity():
    cfg = ModelConfig(
        state_len=SL, labels=tuple("NACGT"),
        encoder=EncoderConfig(features=F, num_rnn_layers=2, winlen=9,
                              second_conv_size=8))
    sd = build_torch_state()
    params = import_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    sig = rng.normal(size=(3, 200)).astype(np.float32)

    with torch.no_grad():
        want = torch_forward(sd, torch.from_numpy(sig)[:, None, :]).numpy()
    got = np.asarray(crf_model.forward(
        params, sig, cfg, compute_dtype=jnp.float32))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_import_rejects_wrong_layer_count():
    cfg = ModelConfig(
        state_len=SL, labels=tuple("NACGT"),
        encoder=EncoderConfig(features=F, num_rnn_layers=5, winlen=9,
                              second_conv_size=8))
    with pytest.raises(ValueError):
        import_state_dict(build_torch_state(), cfg)


def test_import_strips_module_prefix():
    cfg = ModelConfig(
        state_len=SL, labels=tuple("NACGT"),
        encoder=EncoderConfig(features=F, num_rnn_layers=2, winlen=9,
                              second_conv_size=8))
    sd = {f"module.{k}": v for k, v in build_torch_state().items()}
    params = import_state_dict(sd, cfg)
    assert len(params["rnn"]) == 2


def test_load_model_reads_torch_tar(tmp_path):
    """load_model falls back to reference-format weights_N.tar files."""
    from xna_basecaller_tpu.core import config as config_lib
    from xna_basecaller_tpu.utils.model_io import load_model

    cfg = ModelConfig(
        state_len=SL, labels=tuple("NACGT"),
        encoder=EncoderConfig(features=F, num_rnn_layers=2, winlen=9,
                              second_conv_size=8))
    config_lib.save(cfg, str(tmp_path))
    torch.save(build_torch_state(), tmp_path / "weights_1.tar")
    model, params, cfg2 = load_model(str(tmp_path))
    assert len(params["rnn"]) == 2
    # imported params produce the torch-oracle scores
    rng = np.random.default_rng(1)
    sig = rng.normal(size=(2, 120)).astype(np.float32)
    got = np.asarray(model.apply(params, sig, compute_dtype=jnp.float32,
                                 inference=False))
    with torch.no_grad():
        want = torch_forward(build_torch_state(),
                             torch.from_numpy(sig)[:, None, :]).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

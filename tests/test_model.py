"""Model forward shape/semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from xna_basecaller_tpu.core.config import (
    EncoderConfig, ModelConfig, dumps, from_dict, load, to_dict,
)
from xna_basecaller_tpu.models.crf_model import Model
from xna_basecaller_tpu.ops.lstm import init_lstm_params, lstm_forward


def tiny_cfg(**kw):
    enc = EncoderConfig(features=64, num_rnn_layers=2, **kw)
    return ModelConfig(encoder=enc)


def test_forward_shapes_and_dtype():
    cfg = tiny_cfg()
    m = Model(cfg)
    p = m.init(jax.random.key(0))
    sig = np.random.default_rng(0).normal(size=(3, 500)).astype(np.float32)
    scores = m.apply(p, sig, compute_dtype=jnp.float32)
    assert scores.shape == (100, 3, cfg.n_score)
    assert scores.dtype == jnp.float32


def test_blank_score_expansion():
    """With a fixed blank_score, every state's stay column equals it
    (reference nn.py:122-129)."""
    cfg = tiny_cfg()
    m = Model(cfg)
    p = m.init(jax.random.key(0))
    sig = np.random.default_rng(0).normal(size=(2, 200)).astype(np.float32)
    scores = np.asarray(m.apply(p, sig, compute_dtype=jnp.float32))
    Ms = scores.reshape(scores.shape[0], 2, cfg.n_state, cfg.n_base + 1)
    np.testing.assert_allclose(Ms[..., 0], cfg.encoder.blank_score)
    # move columns bounded by tanh * scale
    assert np.abs(Ms[..., 1:]).max() <= cfg.encoder.scale + 1e-5


def test_lstm_reverse_is_flip_run_flip():
    p = init_lstm_params(jax.random.key(0), 16, 16)
    x = np.random.default_rng(1).normal(size=(12, 3, 16)).astype(np.float32)
    fwd_flip = np.asarray(
        lstm_forward(p, jnp.flip(jnp.asarray(x), 0), reverse=False))[::-1]
    rev = np.asarray(lstm_forward(p, jnp.asarray(x), reverse=True))
    np.testing.assert_allclose(rev, fwd_flip, rtol=1e-5, atol=1e-6)


def test_lstm_matches_manual_cell():
    """Scan LSTM equals a hand-rolled per-step cell in float32."""
    H = 8
    p = init_lstm_params(jax.random.key(2), H, H)
    x = np.random.default_rng(2).normal(size=(5, 2, H)).astype(np.float32)
    y = np.asarray(lstm_forward(p, jnp.asarray(x)))
    w_ih, w_hh, b = (np.asarray(p[k]) for k in ("w_ih", "w_hh", "bias"))

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    h = np.zeros((2, H)); c = np.zeros((2, H))
    for t in range(5):
        g = x[t] @ w_ih + b + h @ w_hh
        i, f, gg, o = np.split(g, 4, axis=1)
        c = sigmoid(f) * c + sigmoid(i) * np.tanh(gg)
        h = sigmoid(o) * np.tanh(c)
        np.testing.assert_allclose(y[t], h, rtol=1e-4, atol=1e-5)


def test_param_count_flagship():
    """Flagship 768x5 config lands at the reference's ~24.85M params
    (torch counts an extra 15,360 frozen-zero bias_hh entries)."""
    cfg = ModelConfig()
    m = Model(cfg)
    p = m.init(jax.random.key(0))
    n = m.n_params(p)
    assert abs(n - 24_839_544) < 1e5, n


def test_config_toml_roundtrip(tmp_path):
    cfg = ModelConfig()
    path = tmp_path / "config.toml"
    path.write_text(dumps(cfg))
    cfg2 = load(str(path))
    assert cfg2 == cfg
    assert to_dict(cfg2) == to_dict(cfg)
    assert from_dict(to_dict(cfg)) == cfg


def test_config_reads_reference_schema(tmp_path):
    """Parses a config.toml in the reference's exact schema/key set."""
    (tmp_path / "config.toml").write_text("""
[global_norm]
state_len = 3

[qscore]
bias = 0.3498
scale = 0.9722

[input]
features = 1

[model]
package = "bonito.crf"

[labels]
labels = [ "N", "A", "C", "G", "T", "X", "Y",]

[encoder]
stride = 5
activation = "swish"
features = 768
winlen = 19
scale = 5.0
rnn_type = "lstm"
blank_score = 2.0

[basecaller]
batchsize = 384
chunksize = 3600
overlap = 500
""")
    cfg = load(str(tmp_path))
    assert cfg.state_len == 3
    assert cfg.alphabet == "NACGTXY"
    assert cfg.n_score == 1512
    assert cfg.encoder.blank_score == 2.0
    assert cfg.basecaller.chunksize == 3600
    assert cfg.qscore.bias == 0.3498

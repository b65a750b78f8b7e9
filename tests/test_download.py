"""download CLI install tests."""
import os

import jax
import numpy as np
import pytest

from xna_basecaller_tpu.cli import main as cli_main
from xna_basecaller_tpu.cli.download import install_model
from xna_basecaller_tpu.core import config as config_lib
from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
from xna_basecaller_tpu.models.crf_model import Model
from xna_basecaller_tpu.train import checkpoint as ckpt
from xna_basecaller_tpu.utils.model_io import load_model


def test_install_npz_model(tmp_path, capsys):
    cfg = ModelConfig(encoder=EncoderConfig(features=32, num_rnn_layers=2))
    model = Model(cfg)
    params = model.init(jax.random.key(0))
    src = tmp_path / "mymodel"
    src.mkdir()
    config_lib.save(cfg, str(src))
    ckpt.save_checkpoint(str(src), 3, params)
    reg = tmp_path / "registry"
    dst = install_model(str(src), str(reg), log=lambda *a: None)
    m2, p2, _ = load_model(dst)
    np.testing.assert_array_equal(
        np.asarray(params["head"]["w"]), np.asarray(p2["head"]["w"]))
    # registry listing shows it
    cli_main(["download", "--list", "--directory", str(reg)])
    assert "mymodel" in capsys.readouterr().out


def test_install_torch_model(tmp_path):
    torch = pytest.importorskip("torch")
    from xna_basecaller_tpu.utils.torch_import import load_torch_checkpoint

    cfg = ModelConfig(encoder=EncoderConfig(features=32, num_rnn_layers=2))
    src = tmp_path / "refmodel"
    src.mkdir()
    config_lib.save(cfg, str(src))
    # build a reference-layout state dict via our importer's inverse: just
    # use random torch tensors with the reference's key names
    enc = cfg.encoder
    sd = {}
    f = enc.features
    for i, (cin, k) in enumerate(
            [(1, 5), (enc.first_conv_size, 5), (enc.second_conv_size, 19)]):
        cout = [enc.first_conv_size, enc.second_conv_size, f][i]
        sd[f"encoder.{i}.conv.weight"] = torch.randn(cout, cin, k)
        sd[f"encoder.{i}.conv.bias"] = torch.randn(cout)
    for i in range(enc.num_rnn_layers):
        insize = f
        sd[f"encoder.{3 + i}.rnn.weight_ih_l0"] = torch.randn(4 * f, insize)
        sd[f"encoder.{3 + i}.rnn.weight_hh_l0"] = torch.randn(4 * f, f)
        sd[f"encoder.{3 + i}.rnn.bias_ih_l0"] = torch.randn(4 * f)
        sd[f"encoder.{3 + i}.rnn.bias_hh_l0"] = torch.zeros(4 * f)
    head = cfg.n_base ** (cfg.state_len + 1)
    sd[f"encoder.{3 + enc.num_rnn_layers}.linear.weight"] = \
        torch.randn(head, f)
    sd[f"encoder.{3 + enc.num_rnn_layers}.linear.bias"] = torch.randn(head)
    torch.save(sd, str(src / "weights_1.tar"))
    reg = tmp_path / "registry"
    dst = install_model(str(src), str(reg), log=lambda *a: None)
    want = load_torch_checkpoint(str(src / "weights_1.tar"), cfg)
    _, got, _ = load_model(dst)
    np.testing.assert_allclose(
        np.asarray(want["head"]["w"]), np.asarray(got["head"]["w"]),
        rtol=1e-6)

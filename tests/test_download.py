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


def _make_model_zip(tmp_path, name="zipmodel"):
    import zipfile
    cfg = ModelConfig(encoder=EncoderConfig(features=32, num_rnn_layers=2))
    model = Model(cfg)
    params = model.init(jax.random.key(1))
    src = tmp_path / name
    src.mkdir()
    config_lib.save(cfg, str(src))
    ckpt.save_checkpoint(str(src), 1, params)
    zpath = tmp_path / f"{name}.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for f in os.listdir(src):
            zf.write(src / f, arcname=f"{name}/{f}")
    return zpath


def test_file_fetch_zip_extract_skip_force(tmp_path, capsys):
    """File fetcher: file:// zip download, extraction, archive removal,
    skip-if-exists, --force re-fetch (reference download.py:36-66)."""
    from xna_basecaller_tpu.cli.download import File

    zpath = _make_model_zip(tmp_path)
    dest = tmp_path / "models"
    logs = []
    f = File(str(dest), zpath.as_uri(), log=logs.append)
    out = f.download()
    assert os.path.isdir(out) and out.endswith("zipmodel")
    assert os.path.exists(os.path.join(out, "config.toml"))
    assert not os.path.exists(dest / "zipmodel.zip")  # archive removed
    # model actually loads
    _, p, _ = load_model(out)
    assert "head" in p
    # second fetch skips
    File(str(dest), zpath.as_uri(), log=logs.append).download()
    assert any("skipping" in l for l in logs)
    # force re-fetches
    logs.clear()
    File(str(dest), zpath.as_uri(), force=True, log=logs.append).download()
    assert any("downloaded" in l for l in logs)


def test_file_fetch_sha256(tmp_path):
    from xna_basecaller_tpu.cli.download import File
    import hashlib
    zpath = _make_model_zip(tmp_path, "shamodel")
    good = hashlib.sha256(zpath.read_bytes()).hexdigest()
    dest = tmp_path / "m1"
    File(str(dest), zpath.as_uri(), sha256=good,
         log=lambda *a: None).download()
    assert os.path.isdir(dest / "shamodel")
    with pytest.raises(SystemExit, match="sha256 mismatch"):
        File(str(tmp_path / "m2"), zpath.as_uri(), sha256="0" * 64,
             log=lambda *a: None).download()
    assert not os.path.exists(tmp_path / "m2" / "shamodel.zip")


def test_file_fetch_http_content_disposition(tmp_path):
    """localhost HTTP fetch honouring Content-Disposition naming."""
    import http.server
    import threading
    from xna_basecaller_tpu.cli.download import File

    zpath = _make_model_zip(tmp_path, "httpmodel")
    payload = zpath.read_bytes()

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.send_header("Content-Disposition",
                             'attachment; filename="httpmodel.zip"')
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/opaque-fragment"
        dest = tmp_path / "reg"
        out = File(str(dest), url, log=lambda *a: None).download()
        assert out.endswith("httpmodel")
        assert os.path.exists(os.path.join(out, "config.toml"))
    finally:
        srv.shutdown()


def test_download_cli_with_mirror(tmp_path, monkeypatch, capsys):
    """The CLI end-to-end against a file:// mirror (registry semantics)."""
    from xna_basecaller_tpu.cli import download as dl

    zpath = _make_model_zip(tmp_path, "mirrormodel")
    mirror = tmp_path / "mirror"
    mirror.mkdir()
    (mirror / "xna_r9.4.1_e8_sup@v3.3.zip").write_bytes(zpath.read_bytes())
    monkeypatch.setenv("XNACALL_MODEL_BASE_URL", mirror.as_uri())
    reg = tmp_path / "registry"
    cli_main(["download", "--models", "--directory", str(reg)])
    # zip contained "mirrormodel/"; registry extraction landed it there
    assert os.path.exists(reg / "mirrormodel" / "config.toml")
    out = capsys.readouterr().out
    assert "downloading models" in out


def test_download_cli_no_mirror_errors(tmp_path, monkeypatch):
    monkeypatch.delenv("XNACALL_MODEL_BASE_URL", raising=False)
    with pytest.raises(SystemExit, match="no model mirror"):
        cli_main(["download", "--models", "--directory", str(tmp_path)])

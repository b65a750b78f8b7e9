"""CLI surface smoke tests (tiny model, CPU)."""

import io
import sys

import jax
import numpy as np
import pytest

from xna_basecaller_tpu.cli import main as cli_main
from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
from xna_basecaller_tpu.core import config as config_lib
from xna_basecaller_tpu.data.ctc_data import save_ctc_data
from xna_basecaller_tpu.data.simulate import simulate_ctc_dataset
from xna_basecaller_tpu.models.crf_model import Model
from xna_basecaller_tpu.train import checkpoint as ckpt
from xna_basecaller_tpu.utils.model_io import load_model


@pytest.fixture()
def model_dir(tmp_path):
    cfg = ModelConfig(encoder=EncoderConfig(features=32, num_rnn_layers=2))
    model = Model(cfg)
    params = model.init(jax.random.key(0))
    d = tmp_path / "model"
    d.mkdir()
    config_lib.save(cfg, str(d))
    ckpt.save_checkpoint(str(d), 1, params)
    return str(d)


def test_load_model_latest_and_overrides(model_dir):
    model, params, cfg = load_model(model_dir, chunksize=999, batchsize=7)
    assert cfg.basecaller.chunksize == 999
    assert cfg.basecaller.batchsize == 7
    # overlap untouched from config default
    assert cfg.basecaller.overlap == 500


def test_load_model_skip_top(model_dir):
    """skip_top reinitialises the head but keeps the trunk."""
    model, p_full, _ = load_model(model_dir)
    model, p_skip, _ = load_model(model_dir, skip_top=True, seed=123)
    np.testing.assert_array_equal(
        np.asarray(p_full["conv"][0]["w"]), np.asarray(p_skip["conv"][0]["w"]))
    assert not np.array_equal(
        np.asarray(p_full["head"]["w"]), np.asarray(p_skip["head"]["w"]))


def test_cli_view(model_dir, capsys):
    cli_main(["view", model_dir])
    out = capsys.readouterr().out
    assert "alphabet: NACGTXY" in out
    assert "parameters:" in out


def test_cli_evaluate(model_dir, tmp_path, capsys):
    data_dir = tmp_path / "data"
    chunks, refs, lens, bkps = simulate_ctc_dataset(
        8, chunk_len=400, target_len=50)
    save_ctc_data(str(data_dir), chunks, refs, lens, bkps)
    cli_main(["evaluate", model_dir, "--directory", str(data_dir),
              "--batchsize", "4", "--chunks", "8"])
    out = capsys.readouterr().out
    assert "* mean" in out and "* samples/s" in out


def test_cli_export(model_dir, tmp_path):
    out_path = tmp_path / "model.json"
    cli_main(["export", model_dir, "--output", str(out_path)])
    import json
    with open(out_path) as fh:
        d = json.load(fh)
    assert d["alphabet"] == "NACGTXY"
    assert any(l["type"] == "lstm" for l in d["layers"])
    assert d["layers"][-1]["type"] == "global_norm"


def test_cli_train_and_basecaller_roundtrip(model_dir, tmp_path, capsys,
                                            monkeypatch):
    # train 1 epoch from scratch-config on simulated data
    data_dir = tmp_path / "data"
    chunks, refs, lens, bkps = simulate_ctc_dataset(
        12, chunk_len=400, target_len=50)
    save_ctc_data(str(data_dir), chunks, refs, lens, bkps)
    workdir = tmp_path / "run"
    cli_main(["train", str(workdir), "--config", model_dir,
              "--directory", str(data_dir), "--epochs", "1",
              "--batch", "4", "-f"])
    assert (workdir / "weights_1.npz").exists()
    assert (workdir / "config.toml").exists()
    assert (workdir / "training.csv").exists()


def test_cli_version(capsys):
    with pytest.raises(SystemExit):
        cli_main(["--version"])
    assert "xnacall" in capsys.readouterr().out


def test_cli_convert_chunkify(tmp_path):
    """convert: Taiyaki-chunkify-style HDF5 -> ctc-data npy."""
    import h5py
    h5path = tmp_path / "chunkify.hdf5"
    rng = np.random.default_rng(0)
    with h5py.File(h5path, "w") as fh:
        reads = fh.create_group("Reads")
        for i in range(3):
            g = reads.create_group(f"read_{i}")
            n_bases = 300
            ref = rng.integers(0, 4, size=n_bases)
            r2s = np.sort(rng.integers(0, 2400, size=n_bases)).astype(int)
            g.create_dataset("Dacs", data=rng.integers(
                0, 2000, size=2400).astype(np.int16))
            g.create_dataset("Reference", data=ref)
            g.create_dataset("Ref_to_signal", data=r2s)
            g.attrs["offset"] = 0.0
            g.attrs["range"] = 1400.0
            g.attrs["digitisation"] = 8192.0
            g.attrs["shift_frompA"] = 90.0
            g.attrs["scale_frompA"] = 10.0
    out = tmp_path / "ctc"
    cli_main(["convert", str(h5path), str(out), "--chunksize", "800"])
    chunks = np.load(out / "chunks.npy")
    refs = np.load(out / "references.npy")
    lens = np.load(out / "reference_lengths.npy")
    assert chunks.shape[1] == 800 and chunks.dtype == np.float16
    assert len(chunks) == len(refs) == len(lens) > 0
    assert refs.max() <= 4 and refs.min() >= 0


def test_cli_evaluate_multi_weights_poa(model_dir, tmp_path, capsys):
    """Comma-separated --weights sweep + --poa ensemble consensus
    (the reference's intended evaluate.py:84 behaviour)."""
    model, params, cfg = load_model(model_dir)
    ckpt.save_checkpoint(model_dir, 2, params)  # second checkpoint
    data_dir = tmp_path / "data"
    chunks, refs, lens, bkps = simulate_ctc_dataset(
        8, chunk_len=400, target_len=50)
    save_ctc_data(str(data_dir), chunks, refs, lens, bkps)
    cli_main(["evaluate", model_dir, "--directory", str(data_dir),
              "--batchsize", "4", "--chunks", "8",
              "--weights", "1,2", "--poa"])
    out = capsys.readouterr().out
    assert out.count("* mean") == 2        # one sweep line per checkpoint
    assert "* poa mean" in out

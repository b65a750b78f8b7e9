"""Atomic-output invariants: resume markers must never exist truncated,
and tmp leftovers must never confuse the resume globs."""

import os

import numpy as np
import pytest

from xna_basecaller_tpu.data.ctc_data import atomic_np_save
from xna_basecaller_tpu.train import checkpoint as ckpt
from xna_basecaller_tpu.utils.fileio import atomic_output


def test_atomic_output_success(tmp_path):
    p = tmp_path / "out.fastq"
    with atomic_output(str(p)) as fh:
        fh.write("@r1\nACGT\n+\n!!!!\n")
    assert p.read_text().startswith("@r1")
    assert os.listdir(tmp_path) == ["out.fastq"]  # no tmp leftover


def test_atomic_output_failure_leaves_nothing(tmp_path):
    p = tmp_path / "out.fastq"
    with pytest.raises(RuntimeError):
        with atomic_output(str(p)) as fh:
            fh.write("partial")
            raise RuntimeError("simulated kill")
    assert not p.exists()
    assert os.listdir(tmp_path) == []


def test_atomic_output_failure_keeps_previous_version(tmp_path):
    p = tmp_path / "out.txt"
    p.write_text("complete v1")
    with pytest.raises(RuntimeError):
        with atomic_output(str(p)) as fh:
            fh.write("half of v2")
            raise RuntimeError("simulated kill")
    assert p.read_text() == "complete v1"


def test_atomic_np_save_no_suffix_tmp(tmp_path):
    p = str(tmp_path / "chunks.npy")
    atomic_np_save(p, np.arange(5))
    assert np.load(p).tolist() == [0, 1, 2, 3, 4]
    # prefixed tmp name: nothing "*.npy"-glob-shaped may be left behind
    assert os.listdir(tmp_path) == ["chunks.npy"]


def test_checkpoint_tmp_leftover_does_not_break_resume(tmp_path):
    tree = {"w": np.ones((2, 2), np.float32)}
    ckpt.save_tree(tree, str(tmp_path / "weights_1.npz"))
    ckpt.save_tree(tree, str(tmp_path / "weights_2.npz"))
    # simulate a kill mid-save of epoch 3: only the tmp file exists
    (tmp_path / ".tmp-weights_3.npz").write_bytes(b"truncated")
    # the resume glob must not match the leftover (a suffixed tmp name
    # like weights_3.npz.tmp.npz would crash int() parsing here)
    assert ckpt.latest_epoch(str(tmp_path)) == 2
    loaded = ckpt.load_tree(tree, str(tmp_path / "weights_2.npz"))
    assert np.array_equal(loaded["w"], tree["w"])

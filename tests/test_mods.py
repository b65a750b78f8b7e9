"""Modified-base subsystem tests (reference mod_util.py redesigned)."""

import numpy as np
import pytest

from xna_basecaller_tpu.mods import (
    ModsConfig, call_mods, init_mods_params, load_mods_model, mods_forward,
    save_mods_model,
)
from xna_basecaller_tpu.mods.infer import (
    extract_features, find_motif_sites, mm_ml_tags, seq_to_sig_map,
)
from xna_basecaller_tpu.mods.train import accuracy, fit

CFG = ModsConfig(sig_window=32, context=2, conv1=8, conv2=8, hidden=16)


def test_find_motif_sites():
    sites = find_motif_sites("ACGTCGCGAA", "CG", 0)
    np.testing.assert_array_equal(sites, [1, 4, 6])
    # offset selects the modifiable base inside the motif
    sites = find_motif_sites("ACGTCGCGAA", "CG", 1)
    np.testing.assert_array_equal(sites, [2, 5, 7])
    assert len(find_motif_sites("TTTT", "CG", 0)) == 0


def test_seq_to_sig_map():
    moves = np.array([1, 0, 0, 1, 0, 1, 0, 0], bool)
    m = seq_to_sig_map(moves, stride=5, sig_len=41)
    np.testing.assert_array_equal(m, [0, 15, 25, 41])


def test_extract_features_windows():
    seq = "ACGCG"
    moves = np.zeros(25, bool)
    moves[[0, 5, 10, 15, 20]] = True  # one base per 5 frames, stride 2
    sig = np.arange(50, dtype=np.float32)
    sites = np.array([2, 4])
    sw, ctx = extract_features(sig, seq, moves, 2, sites, CFG)
    assert sw.shape == (2, 32) and ctx.shape == (2, 5)
    # site 2's event spans signal [20, 30) -> centre 25
    centre_val = sw[0][16]
    assert centre_val == 25.0
    # context codes: padded with 0 (N); A=1 C=2 G=3 T=4
    np.testing.assert_array_equal(ctx[0], [1, 2, 3, 2, 3])  # A C G C G
    np.testing.assert_array_equal(ctx[1], [3, 2, 3, 0, 0])  # G C G pad pad


def test_mm_ml_tags_deltas():
    # canonical C positions: 1, 4, 6 -> screening CG sites 1 and 6 means
    # delta 0 (first C) then 1 (skip one C)
    seq = "ACGTCACGAA"
    sites = np.array([1, 6])
    mm, ml = mm_ml_tags(seq, sites, np.array([0.9, 0.1]), CFG)
    assert mm == "C+m?,0,1;"
    assert ml == [230, 25]


def test_classifier_learns_and_roundtrips(tmp_path):
    rng = np.random.default_rng(0)
    n = 1024
    labels = rng.integers(0, 2, n)
    # modified sites carry a +1.5 level shift in the window centre
    sig = rng.normal(0, 1, (n, CFG.sig_window)).astype(np.float32)
    sig[labels == 1, 12:20] += 1.5
    ctx = rng.integers(0, 7, (n, 2 * CFG.context + 1)).astype(np.int32)
    params, hist = fit(CFG, sig[:768], ctx[:768], labels[:768],
                       epochs=8, batch=128)
    assert hist[-1] < hist[0]
    acc = accuracy(CFG, params, sig[768:], ctx[768:], labels[768:])
    assert acc > 0.85, acc

    d = str(tmp_path / "mods")
    save_mods_model(d, CFG, params)
    cfg2, params2 = load_mods_model(d)
    assert cfg2 == CFG
    out1 = mods_forward(params, sig[:4], ctx[:4], CFG)
    out2 = mods_forward(params2, sig[:4], ctx[:4], cfg2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6)


def test_call_mods_end_to_end():
    params = init_mods_params(__import__("jax").random.key(0), CFG)

    class FakeRead:
        read_id = "r1"
        signal = np.random.default_rng(1).normal(
            0, 1, 400).astype(np.float32)

    seq = "ACGTCGACGTACGCGT"
    moves = np.zeros(80, bool)
    moves[np.arange(len(seq)) * 5] = True  # stride 5 frames per base
    attrs = {"sequence": seq, "moves": moves, "stride": 5}
    out = call_mods((CFG, params), FakeRead(), attrs)
    assert "mods" in out
    mm, ml = out["mods"]
    assert mm.startswith("MM:Z:C+m?,")
    n_sites = len(find_motif_sites(seq, "CG", 0))
    assert ml.count(",") == n_sites  # ML:B:C + one value per site
    # empty sequence and motif-free reads are no-ops
    assert "mods" not in call_mods((CFG, params), FakeRead(),
                                   {"sequence": ""})
    assert "mods" not in call_mods(
        (CFG, params), FakeRead(),
        {"sequence": "TTTT", "moves": moves, "stride": 5})

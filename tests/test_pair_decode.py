"""Duplex pair decode: NW columns, envelope (golden vs the reference's
own construction), exact banded pair Viterbi (native vs oracle), and
sequence recovery on planted CRF paths."""

import os

import numpy as np
import pytest

from xna_basecaller_tpu.infer import pair_decode as pd
from xna_basecaller_tpu.utils import native

# Checked-in outputs of the reference's own build_envelope
# (duplex.py:138-181) on the deterministic cases generated below — golden
# data is pinned rather than exec()ing code out of the untrusted
# reference tree at test time.
ENVELOPE_GOLDEN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data",
    "envelope_golden.npz")

ALPHA4 = "NACGT"
ALPHA6 = "NACGTXY"


def _rand_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet), size=n))


# ---------------------------------------------------------------------------
# NW trace
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_nw_trace_native_vs_oracle():
    rng = np.random.default_rng(0)
    for i in range(8):
        a = _rand_seq(rng, int(rng.integers(5, 120)))
        b = _rand_seq(rng, int(rng.integers(5, 120)))
        got = native.nw_trace(a, b)
        want = pd.nw_trace_np(a, b)
        np.testing.assert_array_equal(got, want, err_msg=f"case {i}")


def test_nw_trace_identical_sequences():
    s = "ACGTACGTAA"
    pairs = pd.nw_trace_np(s, s)
    np.testing.assert_array_equal(pairs[:, 0], np.arange(len(s)))
    np.testing.assert_array_equal(pairs[:, 1], np.arange(len(s)))


def test_nw_trace_monotone_and_complete():
    rng = np.random.default_rng(1)
    a = _rand_seq(rng, 50)
    b = a[:20] + "TTTT" + a[24:]
    pairs = pd.nw_columns(a, b)
    assert pairs[-1, 0] == len(a) - 1 and pairs[-1, 1] == len(b) - 1
    assert (np.diff(pairs[:, 0]) >= 0).all()
    assert (np.diff(pairs[:, 1]) >= 0).all()
    assert (np.diff(pairs, axis=0).sum(1) > 0).all()  # every column consumes


# ---------------------------------------------------------------------------
# envelope: golden against the reference's own build_envelope
# ---------------------------------------------------------------------------

def test_envelope_golden_vs_reference():
    """Deterministic cases vs pinned outputs of the reference's own
    build_envelope (captured once via an AST-extracted run with a
    parasail shim replaying our alignment columns; see module comment)."""
    golden = np.load(ENVELOPE_GOLDEN)
    rng = np.random.default_rng(2)
    for i in range(6):
        L1 = int(rng.integers(8, 40))
        seq1 = _rand_seq(rng, L1)
        # strand2: a noisy copy (sub/del/ins) so the alignment has gaps
        chars = []
        for c in seq1:
            r = rng.random()
            if r < 0.08:
                continue
            if r < 0.16:
                chars.append(rng.choice(list("ACGT")))
            else:
                chars.append(c)
            if rng.random() < 0.08:
                chars.append(rng.choice(list("ACGT")))
        seq2 = "".join(chars)
        if len(seq2) < 4:
            continue
        T1 = int(rng.integers(3 * L1, 5 * L1))
        T2 = int(rng.integers(3 * len(seq2), 5 * len(seq2)))
        path1 = np.sort(rng.choice(T1, size=L1, replace=False))
        path2 = np.sort(rng.choice(T2, size=len(seq2), replace=False))
        pad = int(rng.integers(2, 20))
        want = golden[f"want_{i}"]
        got = pd.build_envelope(T1, path1, T2, path2,
                                pd.nw_columns(seq1, seq2), padding=pad)
        np.testing.assert_array_equal(got, want, err_msg=f"case {i}")


# ---------------------------------------------------------------------------
# pair Viterbi: native vs oracle
# ---------------------------------------------------------------------------

def _rand_trans(rng, T, ns, nb):
    x = rng.normal(size=(T, ns, nb + 1)).astype(np.float64)
    x -= np.log(np.exp(x).sum(-1, keepdims=True))
    return x


def _full_env(T1, T2):
    env = np.zeros((T1, 2), np.int64)
    env[:, 1] = T2
    return env


@pytest.mark.skipif(not native.available(), reason="no native lib")
@pytest.mark.parametrize("nb,sl", [(4, 2), (6, 2)])
def test_pair_viterbi_native_vs_oracle(nb, sl):
    rng = np.random.default_rng(3)
    ns = nb ** sl
    for i in range(4):
        T1 = int(rng.integers(6, 16))
        T2 = int(rng.integers(6, 16))
        t1 = _rand_trans(rng, T1, ns, nb)
        t2 = _rand_trans(rng, T2, ns, nb)
        i1 = np.log(np.full(ns, 1.0 / ns))
        i2 = np.log(np.full(ns, 1.0 / ns))
        if i % 2:
            env = _full_env(T1, T2)
        else:  # a diagonal-ish band
            c = np.linspace(0, T2, T1)
            env = np.stack([np.maximum(0, c.astype(int) - 3),
                            np.minimum(T2, c.astype(int) + 3)], 1)
            env = pd.build_envelope(
                T1, np.arange(0, T1, 2), T2, np.arange(0, T2, 2),
                pd.nw_trace_np("A" * (T1 // 2 + 1), "A" * (T2 // 2 + 1)),
                padding=3)
        codes_n, frames_n = native.pair_viterbi(
            t1.astype(np.float32), i1.astype(np.float32),
            t2.astype(np.float32), i2.astype(np.float32), env, nb)
        codes_o, frames_o = pd.pair_viterbi_np(
            t1.astype(np.float32), i1.astype(np.float32),
            t2.astype(np.float32), i2.astype(np.float32), env, nb)
        np.testing.assert_array_equal(codes_n, codes_o, err_msg=f"case {i}")
        np.testing.assert_array_equal(frames_n, frames_o,
                                      err_msg=f"case {i}")


# ---------------------------------------------------------------------------
# planted-path recovery through the full decode
# ---------------------------------------------------------------------------

def _plant_scores(rng, true_codes, nb, sl, dwell=3, boost=9.0, noise=1.0):
    """Scores [T, 1, ns*(nb+1)] with the planted path's transitions
    boosted: start in state 0, emit each base with `dwell` stay frames
    between emissions."""
    ns = nb ** sl
    nsd = ns // nb
    events = []  # (state_after, k_index)
    s = 0
    for b in true_codes:  # b in 0..nb-1
        for _ in range(int(rng.integers(1, dwell + 1))):
            events.append((s, 0))
        dropped = s // nsd
        s = (s % nsd) * nb + b
        events.append((s, 1 + dropped))
    for _ in range(2):
        events.append((s, 0))
    T = len(events)
    scores = rng.normal(scale=noise, size=(T, 1, ns * (nb + 1)))
    for t, (st, k) in enumerate(events):
        scores[t, 0, st * (nb + 1) + k] += boost
    return scores.astype(np.float32)


@pytest.mark.skipif(not native.available(), reason="no native lib")
@pytest.mark.parametrize("alphabet,sl", [(ALPHA4, 2), (ALPHA6, 3)])
def test_decode_pair_recovers_planted_sequence(alphabet, sl):
    from xna_basecaller_tpu.ops.crf import compute_transition_probs

    rng = np.random.default_rng(7)
    nb = len(alphabet) - 1
    true_codes = rng.integers(0, nb, size=30)
    truth = "".join(alphabet[c + 1] for c in true_codes)
    out = []
    for seed in (1, 2):
        r2 = np.random.default_rng(seed)
        sc = _plant_scores(r2, true_codes, nb, sl, noise=1.0)
        t, i = compute_transition_probs(sc, nb, sl)
        out.append((np.log(np.asarray(t)[:, 0] + 1e-30),
                    np.log(np.asarray(i)[0] + 1e-30)))
    (t1, i1), (t2, i2) = out
    got = pd.decode_pair(t1, i1, t2, i2, alphabet)
    assert got is not None
    seq, qstring = got
    assert seq == truth
    assert len(qstring) == len(seq)


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_decode_pair_beats_or_matches_simplex_under_noise():
    from xna_basecaller_tpu.eval.accuracy import accuracy
    from xna_basecaller_tpu.ops.crf import compute_transition_probs

    alphabet, sl = ALPHA4, 2
    nb = len(alphabet) - 1
    rng = np.random.default_rng(11)
    true_codes = rng.integers(0, nb, size=40)
    truth = "".join(alphabet[c + 1] for c in true_codes)
    gains = []
    for trial in range(3):
        out = []
        for seed in (trial * 2 + 1, trial * 2 + 2):
            r2 = np.random.default_rng(100 + seed)
            sc = _plant_scores(r2, true_codes, nb, sl, boost=6.0, noise=2.2)
            t, i = compute_transition_probs(sc, nb, sl)
            out.append((np.log(np.asarray(t)[:, 0] + 1e-30),
                        np.log(np.asarray(i)[0] + 1e-30)))
        (t1, i1), (t2, i2) = out
        c1, _ = pd.simplex_from_trans(t1, i1, nb)
        s1 = "".join(alphabet[c] for c in c1)
        got = pd.decode_pair(t1, i1, t2, i2, alphabet, min_match=0.5)
        if got is None:
            continue
        gains.append(accuracy(truth, got[0]) - accuracy(truth, s1))
    assert gains, "pair decode never ran"
    assert np.mean(gains) >= 0.0


def test_decode_pair_rejects_mismatched_strands():
    from xna_basecaller_tpu.ops.crf import compute_transition_probs

    alphabet, sl = ALPHA4, 2
    nb = len(alphabet) - 1
    rng = np.random.default_rng(13)
    out = []
    for seed in (1, 2):
        codes = np.random.default_rng(seed * 77).integers(0, nb, size=30)
        sc = _plant_scores(rng, codes, nb, sl)
        t, i = compute_transition_probs(sc, nb, sl)
        out.append((np.log(np.asarray(t)[:, 0] + 1e-30),
                    np.log(np.asarray(i)[0] + 1e-30)))
    (t1, i1), (t2, i2) = out
    assert pd.decode_pair(t1, i1, t2, i2, alphabet) is None


# ---------------------------------------------------------------------------
# model integration
# ---------------------------------------------------------------------------

def test_read_transition_probs_shapes_and_duplex_integration():
    """read_transition_probs stitches full-read trans tensors; duplex_pairs
    with pair_decode=True runs end-to-end on a tiny model (random weights
    fail the simplex match gate -> consensus-merge fallback still yields)."""
    import jax

    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.infer.duplex import duplex_pairs
    from xna_basecaller_tpu.models.crf_model import Model

    cfg = ModelConfig(encoder=EncoderConfig(features=64, num_rnn_layers=2))
    model = Model(cfg)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(5)
    sig = rng.normal(size=1500).astype(np.float32)

    t, i = pd.read_transition_probs(model, params, sig, chunksize=1000,
                                    overlap=200)
    ns = model.seqdist.n_base ** model.seqdist.state_len
    assert t.shape == (len(sig) // model.stride, ns,
                       model.seqdist.n_base + 1)
    assert i.shape == (ns,)
    # log posteriors: normalised per old state
    np.testing.assert_allclose(np.exp(t).sum(-1), 1.0, atol=1e-4)

    class R:
        def __init__(self, rid, s):
            self.read_id, self.signal = rid, s

    reads = [R("t1", sig), R("c1", rng.normal(size=1400).astype(np.float32))]
    out = list(duplex_pairs(model, params, [("t1", "c1")], iter(reads),
                            chunksize=1000, overlap=200, batchsize=4,
                            pair_decode=True))
    assert len(out) <= 1  # random-weight calls may be empty; no crash

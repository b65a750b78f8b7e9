"""Beam-search decode vs brute-force sequence-posterior enumeration.

The beam decoder (ops/crf.py::decode_beam) is the TPU-native equivalent of
koi's CUDA beam search (reference crf/basecall.py:43-46, unavailable for
6-base models).  On a tiny CRF we can enumerate every path, group paths by
their emitted base sequence, log-sum-exp within each group, and check that
a wide beam returns the max-posterior sequence (which Viterbi need not).
"""

import itertools
import math

import numpy as np
import pytest

import jax.numpy as jnp

from xna_basecaller_tpu.ops import crf


def _edge_log_posteriors(scores, n_base, state_len):
    """[T,N,C] -> [T,N,ns,nb+1] log edge posteriors (alpha+score+beta-logZ)."""
    post = np.asarray(crf.posteriors(jnp.asarray(scores), n_base, state_len))
    T, N, C = scores.shape
    ns = n_base ** state_len
    return np.log(np.maximum(post.reshape(T, N, ns, n_base + 1), 1e-300))


def _brute_force_best_sequence(e, n_base, state_len):
    """e: [T, ns, nb+1] edge log-posteriors for ONE read.

    Enumerate all transition paths, group by emitted nonzero-label tuple,
    logsumexp within groups (across stay/move timings AND final states),
    return (best sequence tuple, its log posterior).
    """
    T, ns, nb1 = e.shape
    nsd = ns // n_base
    groups = {}

    # path = ((state_0, col_0), ..., (state_{T-1}, col_{T-1}))
    def extend(t, state, logp, seq):
        if t == T:
            groups[seq] = np.logaddexp(groups.get(seq, -np.inf), logp)
            return
        if t == 0:
            for j in range(ns):
                for k in range(nb1):
                    s = seq + ((k,) if k else ())
                    extend(1, j, logp + e[0, j, k], s)
            return
        # stay
        extend(t + 1, state, logp + e[t, state, 0], seq)
        # moves: from `state`, drop its leading base, append each b2
        dropped = state // nsd
        lab = dropped + 1
        for b2 in range(n_base):
            j = (state % nsd) * n_base + b2
            extend(t + 1, j, logp + e[t, j, 1 + dropped], seq + (lab,))

    extend(0, -1, 0.0, ())
    best = max(groups, key=groups.get)
    return best, groups[best]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam_matches_brute_force(seed):
    n_base, state_len, T, N = 2, 1, 5, 2
    rng = np.random.default_rng(seed)
    C = (n_base ** state_len) * (n_base + 1)
    scores = rng.normal(0, 1.5, (T, N, C)).astype(np.float32)

    e = _edge_log_posteriors(scores, n_base, state_len)
    labels, beam_score = crf.decode_beam(
        jnp.asarray(scores), n_base, state_len, beam_width=128)
    labels = np.asarray(labels)

    for n in range(N):
        want_seq, want_lp = _brute_force_best_sequence(
            e[:, n], n_base, state_len)
        got_seq = tuple(int(x) for x in labels[n] if x != 0)
        assert got_seq == want_seq, (got_seq, want_seq)
        assert math.isclose(float(beam_score[n]), want_lp,
                            rel_tol=0, abs_tol=2e-4)


def test_beam_can_beat_viterbi_on_sequence_posterior():
    """On random scores there exist reads where the beam's sequence has a
    higher total posterior than the Viterbi path's sequence (that is the
    whole point of path collapsing); on every read it is at least equal."""
    n_base, state_len, T, N = 2, 1, 6, 8
    rng = np.random.default_rng(7)
    C = (n_base ** state_len) * (n_base + 1)
    scores = rng.normal(0, 1.0, (T, N, C)).astype(np.float32)
    e = _edge_log_posteriors(scores, n_base, state_len)

    beam_labels, _ = crf.decode_beam(
        jnp.asarray(scores), n_base, state_len, beam_width=128)
    vit_labels = np.asarray(crf.decode_paths(
        jnp.asarray(scores), n_base, state_len))

    def seq_lp(n, labels_n):
        want = tuple(int(x) for x in labels_n if x != 0)
        best, lp = None, -np.inf
        # reuse the enumerator's grouping by asking for this seq's mass
        groups = {}
        T_, ns, nb1 = e[:, n].shape
        nsd = ns // n_base

        def extend(t, state, logp, seq):
            if len(seq) > len(want):
                return
            if t == T_:
                groups[seq] = np.logaddexp(groups.get(seq, -np.inf), logp)
                return
            if t == 0:
                for j in range(ns):
                    for k in range(nb1):
                        extend(1, j, logp + e[0, n, j, k],
                               seq + ((k,) if k else ()))
                return
            extend(t + 1, state, logp + e[t, n, state, 0], seq)
            dropped = state // nsd
            for b2 in range(n_base):
                j = (state % nsd) * n_base + b2
                extend(t + 1, j, logp + e[t, n, j, 1 + dropped],
                       seq + (dropped + 1,))

        extend(0, -1, 0.0, ())
        return groups.get(want, -np.inf)

    beam_better = 0
    for n in range(N):
        lp_beam = seq_lp(n, np.asarray(beam_labels[n]))
        lp_vit = seq_lp(n, vit_labels[n])
        assert lp_beam >= lp_vit - 1e-6
        if lp_beam > lp_vit + 1e-6:
            beam_better += 1
    assert beam_better >= 1


def test_beam_flagship_alphabet_smoke():
    """6-base / state_len-3 shapes (216 states) run and produce valid
    labels; with a strongly peaked score tensor beam and Viterbi agree."""
    n_base, state_len, T, N = 6, 3, 12, 2
    ns = n_base ** state_len
    C = ns * (n_base + 1)
    rng = np.random.default_rng(3)
    scores = rng.normal(0, 0.1, (T, N, C)).astype(np.float32)
    # carve a dominant path: random walk of stays/moves
    for nidx in range(N):
        state = int(rng.integers(ns))
        for t in range(T):
            if rng.random() < 0.5:
                scores[t, nidx, state * (n_base + 1)] += 12.0
            else:
                b2 = int(rng.integers(n_base))
                dropped = state // (ns // n_base)
                new = (state % (ns // n_base)) * n_base + b2
                scores[t, nidx, new * (n_base + 1) + 1 + dropped] += 12.0
                state = new

    beam_labels, _ = crf.decode_beam(
        jnp.asarray(scores), n_base, state_len, beam_width=8)
    vit = np.asarray(crf.decode_paths(jnp.asarray(scores), n_base,
                                      state_len))
    beam_labels = np.asarray(beam_labels)
    assert beam_labels.shape == (N, T)
    assert beam_labels.min() >= 0 and beam_labels.max() <= n_base
    for n in range(N):
        got = [x for x in beam_labels[n] if x]
        want = [x for x in vit[n] if x]
        assert got == want


def test_ub_bias_moves_recall_frontier():
    """Decode-time UB bias: positive bias emits more UB labels, negative
    fewer; 0.0 is bit-identical to the unbiased decode."""
    import numpy as np

    from xna_basecaller_tpu.infer.basecall import _score_and_decode

    n_base, state_len = 6, 3
    ns = n_base ** state_len
    T, N, C = 40, 3, ns * (n_base + 1)
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(T, N, C)).astype(np.float32)

    p0 = np.asarray(_score_and_decode(scores, n_base, state_len))
    p0b = np.asarray(_score_and_decode(scores, n_base, state_len,
                                       ub_bias=0.0))
    np.testing.assert_array_equal(p0, p0b)
    p_hi = np.asarray(_score_and_decode(scores, n_base, state_len,
                                        ub_bias=3.0))
    p_lo = np.asarray(_score_and_decode(scores, n_base, state_len,
                                        ub_bias=-3.0))
    n0, nhi, nlo = [(p > 4).sum() for p in (p0, p_hi, p_lo)]
    assert nhi > n0 > nlo, (nlo, n0, nhi)
    # non-UB emissions elsewhere are still sensible labels
    assert p_hi.min() >= 0 and p_hi.max() <= n_base

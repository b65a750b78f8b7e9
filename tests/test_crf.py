"""CRF ops vs. independent brute-force / dense numpy oracles.

The oracle builds the reference's explicit sparse index table
(reference: ub-bonito/bonito/crf/model.py:31-36) and runs the recursions
with plain numpy loops in float64 — an implementation independent of the
reshape/broadcast tricks used in xna_basecaller_tpu.ops.crf.
"""

import numpy as np
import pytest

from xna_basecaller_tpu.ops import crf


def make_idx(n_base, state_len):
    """Transition index table: idx[j, k] = predecessor state of j for
    column k (k=0 stay, k=i+1 move dropping base i)."""
    ns = n_base ** state_len
    nsd = ns // n_base
    idx = np.zeros((ns, n_base + 1), dtype=np.int64)
    for j in range(ns):
        idx[j, 0] = j
        for i in range(n_base):
            idx[j, 1 + i] = nsd * i + j // n_base
    return idx


def np_logsumexp(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    return (m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))).squeeze(axis)


def oracle_fwd(scores, n_base, state_len, semiring="log"):
    T, N, C = scores.shape
    ns = n_base ** state_len
    idx = make_idx(n_base, state_len)
    Ms = scores.reshape(T, N, ns, n_base + 1).astype(np.float64)
    reduce = np_logsumexp if semiring == "log" else (
        lambda x, axis=-1: np.max(x, axis=axis))
    alpha = np.zeros((N, ns))
    alphas = [alpha]
    for t in range(T):
        vals = alpha[:, idx] + Ms[t]          # [N, ns, n_base+1]
        alpha = reduce(vals, axis=-1)
        alphas.append(alpha)
    return np.stack(alphas), reduce(alpha, axis=-1)


def oracle_bwd(scores, n_base, state_len, semiring="log"):
    """Backward recursion via the transposed transition structure."""
    T, N, C = scores.shape
    ns = n_base ** state_len
    idx = make_idx(n_base, state_len)
    Ms = scores.reshape(T, N, ns, n_base + 1).astype(np.float64)
    reduce = np_logsumexp if semiring == "log" else (
        lambda x, axis=-1: np.max(x, axis=axis))
    beta = np.zeros((N, ns))
    betas = [beta]
    for t in range(T - 1, -1, -1):
        # out-transitions of k: every (j, col) with idx[j, col] == k
        vals = np.full((N, ns, (n_base + 1) * ns), -np.inf)
        cnt = np.zeros(ns, dtype=np.int64)
        store = [[] for _ in range(ns)]
        for j in range(ns):
            for col in range(n_base + 1):
                store[idx[j, col]].append((j, col))
        width = max(len(s) for s in store)
        vals = np.full((N, ns, width), -np.inf)
        for k in range(ns):
            for slot, (j, col) in enumerate(store[k]):
                vals[:, k, slot] = Ms[t, :, j, col] + beta[:, j]
        beta = reduce(vals, axis=-1)
        betas.append(beta)
    return np.stack(betas[::-1]), reduce(beta, axis=-1)


def oracle_ctc_lattice(stay, move, lengths):
    """Brute-force DP for the stay/move lattice in float64."""
    T, N, n = stay.shape
    out = np.zeros(N)
    for b in range(N):
        alpha = np.full(n, -np.inf)
        alpha[0] = 0.0
        for t in range(T):
            new = np.full(n, -np.inf)
            new[0] = alpha[0] + stay[t, b, 0]
            for l in range(1, n):
                new[l] = np.logaddexp(
                    alpha[l] + stay[t, b, l], alpha[l - 1] + move[t, b, l - 1])
            alpha = new
        out[b] = alpha[lengths[b] - 1]
    return out


@pytest.mark.parametrize("n_base,state_len,T,N", [
    (2, 2, 5, 3), (4, 2, 6, 2), (6, 3, 4, 2),
])
def test_logz_fwd_matches_oracle(n_base, state_len, T, N):
    rng = np.random.default_rng(0)
    C = (n_base + 1) * n_base ** state_len
    scores = rng.normal(size=(T, N, C)).astype(np.float32)
    got = np.asarray(crf.logz_fwd(scores, n_base, state_len))
    _, want = oracle_fwd(scores, n_base, state_len)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("semiring", ["log", "max"])
def test_fwd_bwd_scores_match_oracle(semiring):
    n_base, state_len, T, N = 3, 2, 5, 2
    rng = np.random.default_rng(1)
    C = (n_base + 1) * n_base ** state_len
    scores = rng.normal(size=(T, N, C)).astype(np.float32)
    alphas = np.asarray(crf.forward_scores(scores, n_base, state_len, semiring))
    betas = np.asarray(crf.backward_scores(scores, n_base, state_len, semiring))
    want_a, logz_f = oracle_fwd(scores, n_base, state_len, semiring)
    want_b, logz_b = oracle_bwd(scores, n_base, state_len, semiring)
    np.testing.assert_allclose(alphas, want_a, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(betas, want_b, rtol=1e-5, atol=1e-5)
    # fwd and bwd give the same partition function
    np.testing.assert_allclose(logz_f, logz_b, rtol=1e-6)


def test_max_le_log():
    """Property: Viterbi score <= full partition (log semiring)."""
    n_base, state_len, T, N = 4, 2, 8, 4
    rng = np.random.default_rng(2)
    C = (n_base + 1) * n_base ** state_len
    scores = rng.normal(size=(T, N, C)).astype(np.float32)
    lz_log = np.asarray(crf.logz_fwd(scores, n_base, state_len, "log"))
    lz_max = np.asarray(crf.logz_fwd(scores, n_base, state_len, "max"))
    assert np.all(lz_max <= lz_log + 1e-5)


def test_posteriors_sum_to_expected_transitions():
    """Log-semiring posteriors are edge marginals: at each t they sum to 1
    over all transitions for each batch element."""
    n_base, state_len, T, N = 3, 2, 6, 3
    rng = np.random.default_rng(3)
    C = (n_base + 1) * n_base ** state_len
    scores = rng.normal(size=(T, N, C)).astype(np.float32)
    post = np.asarray(crf.posteriors(scores, n_base, state_len, "log"))
    sums = post.reshape(T, N, -1).sum(-1)
    np.testing.assert_allclose(sums, np.ones((T, N)), rtol=1e-4, atol=1e-4)
    assert post.min() >= -1e-6


def test_max_posteriors_one_hot_path():
    """Max-semiring posteriors mark exactly one transition per frame."""
    n_base, state_len, T, N = 2, 2, 5, 2
    rng = np.random.default_rng(4)
    C = (n_base + 1) * n_base ** state_len
    scores = rng.normal(size=(T, N, C)).astype(np.float32)
    tb = np.asarray(crf.posteriors(scores, n_base, state_len, "max"))
    sums = tb.reshape(T, N, -1).sum(-1)
    np.testing.assert_allclose(sums, np.ones((T, N)), rtol=1e-5)
    # path score recovered by summing traceback * scores
    picked = (tb * scores).reshape(T, N, -1).sum((0, 2))
    lz_max = np.asarray(crf.logz_fwd(scores, n_base, state_len, "max"))
    np.testing.assert_allclose(picked, lz_max, rtol=1e-4, atol=1e-4)


def test_reverse_complement_involution():
    """rc(rc(x)) == x (property from reference crf/model.py:78-90)."""
    for n_base, state_len in [(4, 3), (6, 3), (4, 2)]:
        C = (n_base + 1) * n_base ** state_len
        rng = np.random.default_rng(5)
        scores = rng.normal(size=(3, 2, C)).astype(np.float32)
        rc = np.asarray(crf.reverse_complement(scores, n_base, state_len))
        rc2 = np.asarray(crf.reverse_complement(rc, n_base, state_len))
        np.testing.assert_allclose(rc2, scores, rtol=1e-6)
        assert not np.allclose(rc, scores)


def test_reverse_complement_preserves_logz():
    """Reverse-complementing the score tensor must not change logZ."""
    n_base, state_len = 4, 2
    C = (n_base + 1) * n_base ** state_len
    rng = np.random.default_rng(6)
    scores = rng.normal(size=(5, 3, C)).astype(np.float32)
    lz = np.asarray(crf.logz_fwd(scores, n_base, state_len))
    rc = np.asarray(crf.reverse_complement(scores, n_base, state_len))
    lz_rc = np.asarray(crf.logz_fwd(rc, n_base, state_len))
    np.testing.assert_allclose(lz, lz_rc, rtol=1e-5, atol=1e-5)


def test_ctc_lattice_logz_matches_bruteforce():
    T, N, n = 7, 4, 5
    rng = np.random.default_rng(7)
    stay = rng.normal(size=(T, N, n)).astype(np.float32)
    move = rng.normal(size=(T, N, n - 1)).astype(np.float32)
    lengths = np.array([5, 3, 4, 1], dtype=np.int32)
    got = np.asarray(crf.ctc_lattice_logz(stay, move, lengths))
    want = oracle_ctc_lattice(stay, move, lengths)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ctc_loss_decreases_for_matching_target():
    """Loss should be lower for the target the scores were built to favour."""
    n_base, state_len = 2, 2
    T, N = 12, 1
    ns = n_base ** state_len
    C = (n_base + 1) * ns
    # Build scores that strongly favour emitting target 1,2,1,2,... pattern
    target = np.array([[1, 2, 1, 2, 1, 2]], dtype=np.int32)
    wrong = np.array([[2, 1, 2, 1, 2, 1]], dtype=np.int32)
    lengths = np.array([6], dtype=np.int32)
    rng = np.random.default_rng(8)
    scores = rng.normal(scale=0.1, size=(T, N, C)).astype(np.float32)

    zt = np.clip(target[0] - 1, 0, None)
    # boost the stay scores of the kmer states along the target
    for i in range(len(zt) - state_len + 1):
        state = zt[i] * n_base + zt[i + 1]
        scores[:, 0, state * (n_base + 1)] += 3.0
    loss_good = float(crf.ctc_loss(scores, target, lengths, n_base, state_len))
    loss_bad = float(crf.ctc_loss(scores, wrong, lengths, n_base, state_len))
    assert loss_good < loss_bad


def test_normalise_zeroes_logz():
    n_base, state_len = 4, 2
    C = (n_base + 1) * n_base ** state_len
    rng = np.random.default_rng(9)
    scores = rng.normal(size=(6, 3, C)).astype(np.float32)
    normed = crf.normalise(scores, n_base, state_len)
    lz = np.asarray(crf.logz_fwd(normed, n_base, state_len))
    np.testing.assert_allclose(lz, np.zeros(3), atol=1e-4)


def test_decode_roundtrip_synthetic():
    """Scores boosted along a random legal state path decode to exactly the
    labels of that path (dropped-base layout, reference crf/model.py:92-100)."""
    dist = crf.CTCCRF(state_len=2, alphabet="NACGT")
    n_base, state_len = dist.n_base, dist.state_len
    ns = n_base ** state_len
    nsd = ns // n_base
    C = (n_base + 1) * ns
    T = 16
    rng = np.random.default_rng(11)
    scores = rng.normal(scale=0.05, size=(T, 1, C)).astype(np.float32)
    state = int(rng.integers(ns))
    expected = []
    for t in range(T):
        if rng.random() < 0.5:  # stay
            scores[t, 0, state * (n_base + 1) + 0] += 10.0
            expected.append(0)
        else:  # legal move: new state from successors of `state`
            b = int(rng.integers(n_base))
            dropped = state // nsd
            new_state = (state % nsd) * n_base + b
            scores[t, 0, new_state * (n_base + 1) + 1 + dropped] += 10.0
            expected.append(1 + dropped)
            state = new_state
    seqs = dist.decode_batch(scores)
    want = "".join(dist.alphabet[k] for k in expected if k != 0)
    assert seqs == [want]


def test_custom_vjp_logz_matches_autodiff_scan():
    """Explicit-recursion VJP == differentiating through the scan (both
    semirings)."""
    import jax
    import jax.numpy as jnp
    n_base, state_len, T, N = 3, 2, 6, 3
    C = (n_base + 1) * n_base ** state_len
    rng = np.random.default_rng(20)
    scores = jnp.asarray(rng.normal(size=(T, N, C)).astype(np.float32))
    for semiring in ("log", "max"):
        g_custom = jax.grad(
            lambda s: crf.logz_fwd(s, n_base, state_len, semiring).sum()
        )(scores)
        g_auto = jax.grad(
            lambda s: crf._logz_scan(s, n_base, state_len, semiring).sum()
        )(scores)
        np.testing.assert_allclose(
            np.asarray(g_custom), np.asarray(g_auto), rtol=1e-4, atol=1e-5)


def test_custom_vjp_ctc_lattice_matches_autodiff():
    import jax
    import jax.numpy as jnp
    T, N, n = 7, 3, 5
    rng = np.random.default_rng(21)
    stay = jnp.asarray(rng.normal(size=(T, N, n)).astype(np.float32))
    move = jnp.asarray(rng.normal(size=(T, N, n - 1)).astype(np.float32))
    lengths = jnp.asarray(np.array([5, 3, 4], np.int32))
    g1 = jax.grad(lambda s, m: crf.ctc_lattice_logz_grad(s, m, lengths).sum(),
                  argnums=(0, 1))(stay, move)
    g2 = jax.grad(lambda s, m: crf.ctc_lattice_logz(s, m, lengths).sum(),
                  argnums=(0, 1))(stay, move)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_explicit_viterbi_matches_grad_viterbi():
    """Explicit traceback == argmax of the Max-semiring gradient."""
    import jax
    n_base, state_len, T, N = 4, 2, 10, 4
    C = (n_base + 1) * n_base ** state_len
    rng = np.random.default_rng(22)
    scores = rng.normal(size=(T, N, C)).astype(np.float32)
    labels, states = crf._viterbi_traceback(scores, n_base, state_len)
    g = jax.grad(
        lambda s: crf._logz_scan(s, n_base, state_len, "max").sum()
    )(scores)
    flat = np.asarray(g).reshape(T, N, -1).argmax(-1)
    np.testing.assert_array_equal(
        np.asarray(labels), flat % (n_base + 1))
    np.testing.assert_array_equal(
        np.asarray(states), flat // (n_base + 1))


def test_ctc_viterbi_alignments_valid_path():
    """Lattice alignment: one-hot, starts at 0, ends at length-1, and is
    monotone with steps of 0/+1."""
    T, N, n = 10, 3, 5
    rng = np.random.default_rng(30)
    stay = rng.normal(size=(T, N, n)).astype(np.float32)
    move = rng.normal(size=(T, N, n - 1)).astype(np.float32)
    lengths = np.array([5, 3, 4], np.int32)
    align = np.asarray(crf.ctc_viterbi_alignments(stay, move, lengths))
    assert align.shape == (T, N, n)
    pos = align.argmax(-1)
    np.testing.assert_allclose(align.sum(-1), 1.0)
    for b in range(N):
        p = pos[:, b]
        # the first frame applies a transition from position 0
        assert p[0] in (0, 1)
        assert p[-1] == lengths[b] - 1
        assert np.all(np.isin(np.diff(p), [0, 1]))
    # path score equals the max-semiring lattice logZ
    picked = np.zeros(N)
    for b in range(N):
        p = pos[:, b]
        picked[b] += stay[0, b, 0] if p[0] == 0 else move[0, b, 0]
        for t in range(1, T):
            if p[t] == p[t - 1] + 1:
                picked[b] += move[t, b, p[t] - 1]
            else:
                picked[b] += stay[t, b, p[t]]
    lz_max = np.asarray(crf.ctc_lattice_logz(stay, move, lengths, "max"))
    np.testing.assert_allclose(picked, lz_max, rtol=1e-4, atol=1e-4)


def test_gather_cols_matmul_matches_gather():
    """The one-hot-matmul gather (the TPU path) must equal
    take_along_axis in both the forward and the VJP (whose transpose is
    scatter-add — duplicate columns must sum)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    T, N, C, n = 6, 3, 10, 7
    scores = jnp.asarray(rng.normal(size=(T, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, C, size=(N, n)))  # duplicates likely
    ct = jnp.asarray(rng.normal(size=(T, N, n)).astype(np.float32))

    def ref_gather(s):
        return jnp.take_along_axis(
            s, jnp.broadcast_to(idx[None], (T, N, n)), axis=2)

    want_f, ref_vjp = jax.vjp(ref_gather, scores)
    got_f, mm_vjp = jax.vjp(
        lambda s: crf._gather_cols_matmul(s, idx), scores)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mm_vjp(ct)[0]),
                               np.asarray(ref_vjp(ct)[0]),
                               rtol=1e-5, atol=1e-6)


def test_ctc_loss_grad_matches_autodiff_scan():
    """End-to-end loss gradient (normalise + gather + lattice custom VJPs)
    vs plain autodiff through the reference-shaped computation."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    NB, SL, T, N, L = 4, 2, 10, 3, 8
    C = (NB + 1) * NB ** SL
    scores = jnp.asarray(rng.normal(size=(T, N, C)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, NB + 1, size=(N, L)))
    lengths = jnp.asarray([L, L - 1, L])

    def loss_plain(s):
        s = s - crf._logz_scan(s, NB, SL, crf.LOG)[:, None] / T
        zt = jnp.clip(targets - 1, 0, None)
        n = L - (SL - 1)
        stay_state = sum(zt[:, i:n + i] * (NB ** (SL - i - 1))
                         for i in range(SL))
        stay_idx = stay_state * (NB + 1)
        move_idx = stay_idx[:, 1:] + zt[:, : n - 1] + 1
        stay = jnp.take_along_axis(
            s, jnp.broadcast_to(stay_idx[None], (T, N, n)), axis=2)
        move = jnp.take_along_axis(
            s, jnp.broadcast_to(move_idx[None], (T, N, n - 1)), axis=2)
        lz = crf.ctc_lattice_logz(stay, move, lengths + 1 - SL)
        return (-(lz / lengths)).mean()

    def loss_ours(s):
        return crf.ctc_loss(s, targets, lengths, NB, SL)

    np.testing.assert_allclose(float(loss_ours(scores)),
                               float(loss_plain(scores)), rtol=1e-5)
    g_want = jax.grad(loss_plain)(scores)
    g_got = jax.grad(loss_ours)(scores)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-6)


def test_pallas_log_path_gate(monkeypatch):
    """The Pallas CRF-loss routing is the TPU default with an env
    opt-out (XNACALL_PALLAS_LOSS=0) and never engages off-TPU or in the
    Max semiring (promotion measured in results/train_variants_r04.json)."""
    from xna_basecaller_tpu.ops import crf as crf_mod
    from xna_basecaller_tpu.utils import platform as plat

    monkeypatch.setattr(plat, "is_tpu", lambda: True)
    monkeypatch.delenv("XNACALL_PALLAS_LOSS", raising=False)
    assert crf_mod._pallas_log_path(crf_mod.LOG) is True
    for off in ("0", "false", "No", "OFF", ""):
        monkeypatch.setenv("XNACALL_PALLAS_LOSS", off)
        assert crf_mod._pallas_log_path(crf_mod.LOG) is False, off
    monkeypatch.setenv("XNACALL_PALLAS_LOSS", "1")
    assert crf_mod._pallas_log_path(crf_mod.LOG) is True
    assert crf_mod._pallas_log_path(crf_mod.MAX) is False
    monkeypatch.setattr(plat, "is_tpu", lambda: False)
    monkeypatch.delenv("XNACALL_PALLAS_LOSS", raising=False)
    assert crf_mod._pallas_log_path(crf_mod.LOG) is False

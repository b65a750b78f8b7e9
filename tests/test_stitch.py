"""Stitch (splice) augmentation tests against a crafted XNA library.

Builds a synthetic XNA ctc-dataset with the real library's structure —
single UB with mirrored 5-base context (the XNA1024 design the reference
relies on, stitch_chunks.py:468) — and verifies slicing, bucketing, and
device-side splicing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xna_basecaller_tpu.augment.stitch import (
    KMER_LEN, StitchTables, _tpl_code, make_stitch_augment,
    slice_xna_tables, stitch_batch,
)
from xna_basecaller_tpu.data.ctc_data import save_ctc_data
from xna_basecaller_tpu.data.pore_model import load_pore_model
from xna_basecaller_tpu.data.simulate import simulate_squiggle

# Period-6 base pattern: a target tiled with it mirrors its 5-base context
# around EVERY position (target[p+1+j] == target[p-5+j]), which is the
# XNA1024 library property the per_kmer lookup relies on.
HEX = np.array([1, 2, 3, 4, 2, 3], np.uint8)


def _ctx_for(rot):
    """5-base context seen around a position with residue ``rot`` in the
    period-6 pattern: the other five bases of the cycle, in order."""
    return np.array([HEX[(rot + 1 + j) % 6] for j in range(5)], np.uint8)


def _xna_read(rng, pore, ub_code=5, rot=0):
    """Target: DNA with one mirrored-context UB: ...c1..c5 UB c1..c5..."""
    ctx = _ctx_for(rot)
    pre = rng.integers(1, 5, size=20).astype(np.uint8)
    post = rng.integers(1, 5, size=20).astype(np.uint8)
    target = np.concatenate([pre, ctx, [ub_code], ctx, post]).astype(np.uint8)
    signal, bkps = simulate_squiggle(target, pore, rng)
    return target, signal, bkps


@pytest.fixture(scope="module")
def xna_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("xna_ctc")
    pore = load_pore_model()
    rng = np.random.default_rng(0)
    n = 40
    chunk_len = 1200
    max_len = 80
    chunks = np.zeros((n, chunk_len), np.float16)
    refs = np.zeros((n, max_len), np.uint8)
    lens = np.zeros(n, np.uint16)
    bkps_arr = np.zeros((n, max_len), np.uint16)
    for i in range(n):
        ub = 5 if (i // 6) % 2 == 0 else 6
        rot = i % 6
        target, signal, bkps = _xna_read(rng, pore, ub_code=ub, rot=rot)
        L = len(target)
        chunks[i, : min(len(signal), chunk_len)] = \
            signal[:chunk_len].astype(np.float16)
        refs[i, :L] = target
        lens[i] = L
        bkps_arr[i, :L] = np.minimum(bkps[:L], chunk_len)
    save_ctc_data(str(d), chunks, refs, lens, bkps_arr)
    return str(d)


def test_tpl_code_base4():
    assert _tpl_code(np.array([1, 1, 1, 1, 1])) == 0
    assert _tpl_code(np.array([4, 4, 4, 4, 4])) == 1023
    assert _tpl_code(np.array([1, 1, 1, 1, 2])) == 1


def test_slice_tables_built(xna_dir):
    tables = slice_xna_tables(xna_dir, cap=8)
    # every UB x kmer_ub_pos has candidates somewhere
    for ub in (0, 1):
        for kup in range(KMER_LEN):
            assert tables.counts[ub, kup].sum() > 0, (ub, kup)
    # slice lengths positive where counted
    filled = tables.counts > 0
    assert (tables.lens[filled] > 0).any()
    # the mirrored-context buckets exist for each rotation
    for rot in range(6):
        tpl = _tpl_code(_ctx_for(rot))
        assert tables.counts[0, :, tpl].sum() > 0, rot


@pytest.fixture(scope="module")
def dna_batch():
    """DNA chunks whose targets are the periodic cycle — every position's
    rotated context exists in the XNA tables."""
    pore = load_pore_model()
    rng = np.random.default_rng(1)
    B, chunk_len, L = 4, 2400, 120
    chunks = np.zeros((B, chunk_len), np.float32)
    refs = np.zeros((B, L), np.int32)
    lens = np.full(B, L, np.int32)
    bkps = np.zeros((B, L), np.int32)
    for i in range(B):
        target = np.tile(HEX, L // 6 + 1)[:L].astype(np.uint8)
        signal, bk = simulate_squiggle(target, pore, rng)
        chunks[i, : min(len(signal), chunk_len)] = signal[:chunk_len]
        refs[i] = target
        bkps[i] = np.minimum(bk[:L], chunk_len)
    return chunks, refs, lens, bkps


def test_stitch_inserts_ubs_and_splices(xna_dir, dna_batch):
    tables = slice_xna_tables(xna_dir, cap=8)
    chunks, refs, lens, bkps = dna_batch
    c, t, success = stitch_batch(
        jax.random.key(0), jnp.asarray(chunks), jnp.asarray(refs),
        jnp.asarray(lens), jnp.asarray(bkps),
        jnp.asarray(tables.signals), jnp.asarray(tables.lens),
        jnp.asarray(tables.counts), prop_ubs=0.08, ub_codes=(5, 6))
    c, t, success = np.asarray(c), np.asarray(t), np.asarray(success)
    assert success.all()
    for i in range(len(lens)):
        L = int(lens[i])
        new_ubs = np.where(t[i, :L] > 4)[0]
        assert len(new_ubs) >= 1
        # UBs respect edge margins
        assert np.all(new_ubs >= 10) and np.all(new_ubs < L - 10)
        # signal changed only inside spliced spans
        changed = np.where(np.abs(c[i] - chunks[i]) > 1e-6)[0]
        assert len(changed) > 0
        spans = [(int(bkps[i, p - 6]), int(bkps[i, p])) for p in new_ubs]
        for s in changed:
            assert any(lo <= s < hi for lo, hi in spans), (s, spans)
        # non-UB target positions unchanged
        keep = np.setdiff1d(np.arange(L), new_ubs)
        np.testing.assert_array_equal(t[i, keep], refs[i, keep])


def test_stitch_sparse_tables_skip_gracefully(dna_batch):
    """Empty tables -> no splice, chunk untouched, success False."""
    chunks, refs, lens, bkps = dna_batch
    empty = StitchTables(
        np.zeros((2, 6, 1024, 4, 100), np.float32),
        np.zeros((2, 6, 1024, 4), np.int32),
        np.zeros((2, 6, 1024), np.int32))
    c, t, success = stitch_batch(
        jax.random.key(0), jnp.asarray(chunks), jnp.asarray(refs),
        jnp.asarray(lens), jnp.asarray(bkps),
        jnp.asarray(empty.signals), jnp.asarray(empty.lens),
        jnp.asarray(empty.counts), prop_ubs=0.08)
    assert not np.asarray(success).any()
    np.testing.assert_allclose(np.asarray(c), chunks)
    np.testing.assert_array_equal(np.asarray(t), refs)


def test_make_stitch_augment_closure(xna_dir, dna_batch):
    chunks, refs, lens, bkps = dna_batch
    aug = make_stitch_augment(xna_dir, ubs="X", cap=8)
    rng = np.random.default_rng(2)
    c, t = aug(chunks, refs, lens, bkps, rng)
    assert (t > 4).sum() > 0
    assert set(np.unique(t[t > 4])) == {5}


def test_kmer_weight_table_and_position_weights(tmp_path):
    """Weighted insert picking: rare k-mer contexts get higher weight."""
    import jax.numpy as jnp
    from xna_basecaller_tpu.augment.stitch import (
        count_kmers, load_kmer_weight_table, position_weights,
    )
    from xna_basecaller_tpu.data.ctc_data import save_ctc_data

    rng = np.random.default_rng(0)
    n, L = 30, 60
    refs = np.zeros((n, L), np.uint8)
    # common pattern everywhere, one rare pattern in a single read
    refs[:] = np.tile(np.array([1, 2, 3, 4, 2, 3], np.uint8), L // 6 + 1)[:L]
    refs[0, 20:32] = np.array([4, 4, 1, 1, 3, 3] * 2, np.uint8)
    lens = np.full(n, L, np.uint16)
    chunks = np.zeros((n, 100), np.float16)
    save_ctc_data(str(tmp_path), chunks, refs, lens)

    counts = count_kmers(str(tmp_path))
    assert (tmp_path / "kmer_count-len_6.csv").exists()
    assert counts.sum() > 0

    table = load_kmer_weight_table(str(tmp_path))
    assert table.shape == (6, 1024)
    assert (table >= 0).all()

    w = np.asarray(position_weights(
        jnp.asarray(refs[0], jnp.int32), jnp.int32(L), jnp.asarray(table)))
    assert w.shape == (L,)
    # edges zeroed
    assert np.all(w[:5] == 0) and np.all(w[-5:] == 0)
    # the rare-context region outweighs the common one
    common = w[40:50].max()
    rare = w[23:29].max()
    assert rare > common, (rare, common)


def test_permute_transform_window_locality():
    """Permutation stays within windows and preserves the multiset of
    values; the padding tail is untouched."""
    import jax
    import jax.numpy as jnp
    from xna_basecaller_tpu.augment.stitch import _permute_transform

    sig = jnp.arange(32, dtype=jnp.float32)
    out = np.asarray(_permute_transform(jax.random.key(0), sig, 24, 8))
    # padding (>= valid_len 24) untouched and in place
    np.testing.assert_array_equal(out[24:], np.arange(24, 32))
    changed = False
    for w in range(3):
        win = out[w * 8:(w + 1) * 8]
        assert sorted(win.tolist()) == list(range(w * 8, (w + 1) * 8))
        changed |= not np.array_equal(win, np.arange(w * 8, (w + 1) * 8))
    assert changed  # at least one window actually permuted


def test_one_code_table_still_inserts_with_xy(xna_dir, dna_batch):
    """ubs=XY with a donor table populated only for X must still insert X
    (per-code availability; pre-fix the AND over codes silently zeroed
    every insertion)."""
    tables = slice_xna_tables(xna_dir, cap=8)
    x_only = StitchTables(
        tables.signals.copy(), tables.lens.copy(), tables.counts.copy())
    x_only.signals[1] = 0
    x_only.lens[1] = 0
    x_only.counts[1] = 0  # no Y donors at all
    chunks, refs, lens, bkps = dna_batch
    c, t, success = stitch_batch(
        jax.random.key(3), jnp.asarray(chunks), jnp.asarray(refs),
        jnp.asarray(lens), jnp.asarray(bkps),
        jnp.asarray(x_only.signals), jnp.asarray(x_only.lens),
        jnp.asarray(x_only.counts), prop_ubs=0.08, ub_codes=(5, 6))
    t = np.asarray(t)
    assert np.asarray(success).all()
    assert (t == 5).sum() > 0   # X inserted
    assert (t == 6).sum() == 0  # no Y without donors


def test_small_pad_rejected(xna_dir, dna_batch):
    tables = slice_xna_tables(xna_dir, cap=8)
    chunks, refs, lens, bkps = dna_batch
    with pytest.raises(ValueError, match="pad"):
        stitch_batch(
            jax.random.key(0), jnp.asarray(chunks), jnp.asarray(refs),
            jnp.asarray(lens), jnp.asarray(bkps),
            jnp.asarray(tables.signals), jnp.asarray(tables.lens),
            jnp.asarray(tables.counts), pad=3)


def test_simulator_structural_families_moment_matched():
    """The jitter structural families (lognormal dwell, laplace/triangular
    event noise) are moment-matched to the normal/uniform defaults, and
    jitter_regime never draws the held-out (gamma, gauss) pair."""
    import numpy as np

    from xna_basecaller_tpu.data.simulate import (
        _JITTER_FAMILIES, jitter_regime, load_pore_model, random_sequence,
        simulate_squiggle,
    )

    assert ("gamma", "gauss") not in _JITTER_FAMILIES

    pore = load_pore_model()
    rng = np.random.default_rng(0)
    codes = random_sequence(rng, 400)
    base = dict(samples_per_base=9.0, dwell_std=2.0, noise_std=0.0)
    for dwell in ("normal", "lognormal", "gamma"):
        sig, bk = simulate_squiggle(codes, pore, rng, dwell_dist=dwell,
                                    **base)
        reps = np.diff(np.concatenate([[0], bk.astype(int)]))
        assert abs(reps.mean() - 9.0) < 0.6, (dwell, reps.mean())
        assert abs(reps.std() - 2.0) < 0.7, (dwell, reps.std())
    for noise in ("uniform", "gauss", "laplace", "triangular"):
        sig, _ = simulate_squiggle(codes, pore, rng, event_noise=noise,
                                   **base)
        assert np.isfinite(sig).all()

    fams = {(jitter_regime(base | {"dwell_dist": "normal",
                                   "event_noise": "uniform"}, rng)
             ["dwell_dist"],
             jitter_regime(base | {"dwell_dist": "normal",
                                   "event_noise": "uniform"}, rng)
             ["event_noise"]) for _ in range(60)}
    assert all(f[0] != "gamma" for f in fams)


def test_relax_fallback_identity_when_occupied():
    from xna_basecaller_tpu.augment.stitch import build_relax_fallback
    full = np.ones((2, 6, 1024), np.int32)
    fb = build_relax_fallback(full)
    want = np.tile(np.arange(1024, dtype=np.int32), (2, 6, 1))
    np.testing.assert_array_equal(fb, want)


def test_relax_fallback_prefers_deep_suffix_match():
    from xna_basecaller_tpu.augment.stitch import build_relax_fallback
    counts = np.zeros((2, 6, 1024), np.int32)
    # occupied codes for (ub=0, kup=0): 0b-suffix structure in base 4:
    # 0x155 = digits (0,1,1,1,1); 0x2AA-ish: use explicit codes
    a = (((1 * 4 + 2) * 4 + 3) * 4 + 0) * 4 + 1     # digits 1,2,3,0,1
    b = (((3 * 4 + 3) * 4 + 3) * 4 + 0) * 4 + 1     # digits 3,3,3,0,1
    c = (((2 * 4 + 2) * 4 + 2) * 4 + 2) * 4 + 2     # digits 2,2,2,2,2
    counts[0, 0, [a, b, c]] = [1, 5, 1]
    fb = build_relax_fallback(counts)
    # occupied codes stay put
    assert fb[0, 0, a] == a and fb[0, 0, b] == b and fb[0, 0, c] == c
    # query digits 0,0,0,0,1: shares suffix (0,1) depth-2 with a and b;
    # b has the deeper count -> b wins the suffix class
    q = 1
    assert fb[0, 0, q] == b
    # query digits 0,0,0,2,2: shares suffix (2,2) depth-2 with c only
    q2 = 2 * 4 + 2
    assert fb[0, 0, q2] == c
    # query sharing no suffix digit with any donor: global most-populated
    q3 = (((0 * 4 + 0) * 4 + 0) * 4 + 3) * 4 + 3     # digits 0,0,0,3,3
    assert fb[0, 0, q3] == b
    # a (ub, kup) with zero donors keeps the identity map
    assert fb[1, 3, 7] == 7


def test_stitch_relax_rescues_sparse_library(xna_dir):
    """POC-like regime: acceptor DNA whose contexts are NOT in the donor
    tables.  Exact matching inserts ~nothing; relax inserts the
    requested proportion using deepest-suffix donors."""
    from xna_basecaller_tpu.augment.stitch import build_relax_fallback
    tables = slice_xna_tables(xna_dir, cap=8)
    pore = load_pore_model()
    rng = np.random.default_rng(9)
    B, chunk_len, L = 4, 2400, 120
    chunks = np.zeros((B, chunk_len), np.float32)
    refs = np.zeros((B, L), np.int32)
    lens = np.full(B, L, np.int32)
    bkps = np.zeros((B, L), np.int32)
    for i in range(B):
        target = rng.integers(1, 5, size=L).astype(np.uint8)  # random DNA
        signal, bk = simulate_squiggle(target, pore, rng)
        chunks[i, : min(len(signal), chunk_len)] = signal[:chunk_len]
        refs[i] = target
        bkps[i] = np.minimum(bk[:L], chunk_len)
    args = (jnp.asarray(chunks), jnp.asarray(refs), jnp.asarray(lens),
            jnp.asarray(bkps), jnp.asarray(tables.signals),
            jnp.asarray(tables.lens), jnp.asarray(tables.counts))
    _, t_exact, _ = stitch_batch(jax.random.key(0), *args, prop_ubs=0.10)
    fb = jnp.asarray(build_relax_fallback(np.asarray(tables.counts)))
    c_rel, t_rel, succ = stitch_batch(jax.random.key(0), *args,
                                      prop_ubs=0.10, tbl_fallback=fb)
    n_exact = int((np.asarray(t_exact) > 4).sum())
    n_rel = int((np.asarray(t_rel) > 4).sum())
    assert n_rel > max(4 * n_exact, B * 4), (n_exact, n_rel)
    assert np.asarray(succ).all()
    # the spliced signal actually changed under the inserted UBs
    assert not np.allclose(np.asarray(c_rel), chunks)


def test_stitch_relax_noop_on_fully_available_contexts(xna_dir, dna_batch):
    """On acceptors whose every context has exact donors (the CPLX-like
    cyclic fixture) relax must not change a single output bit."""
    from xna_basecaller_tpu.augment.stitch import build_relax_fallback
    tables = slice_xna_tables(xna_dir, cap=8)
    chunks, refs, lens, bkps = dna_batch
    args = (jnp.asarray(chunks), jnp.asarray(refs), jnp.asarray(lens),
            jnp.asarray(bkps), jnp.asarray(tables.signals),
            jnp.asarray(tables.lens), jnp.asarray(tables.counts))
    c0, t0, s0 = stitch_batch(jax.random.key(3), *args, prop_ubs=0.08)
    fb = jnp.asarray(build_relax_fallback(np.asarray(tables.counts)))
    c1, t1, s1 = stitch_batch(jax.random.key(3), *args, prop_ubs=0.08,
                              tbl_fallback=fb)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1))

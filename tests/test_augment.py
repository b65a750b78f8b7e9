"""Device-side spike augmentation tests (semantics of reference
ub-bonito/bonito/spike_chunks.py, validated distributionally)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xna_basecaller_tpu.augment.spike import (
    _kmer_codes_from_target, make_spike_augment, spike_batch,
)
from xna_basecaller_tpu.data.pore_model import load_pore_model
from xna_basecaller_tpu.data.simulate import simulate_ctc_dataset


@pytest.fixture(scope="module")
def dataset():
    return simulate_ctc_dataset(8, chunk_len=1800, target_len=200, seed=3)


@pytest.fixture(scope="module")
def pore_tables():
    pore = load_pore_model()
    return jnp.asarray(pore.means), jnp.asarray(pore.stds)


def _run(dataset, pore_tables, **kw):
    chunks, refs, lens, bkps = dataset
    km, ks = pore_tables
    key = jax.random.key(0)
    c, t = spike_batch(
        key, jnp.asarray(chunks, jnp.float32), jnp.asarray(refs, jnp.int32),
        jnp.asarray(lens, jnp.int32), jnp.asarray(bkps, jnp.int32),
        km, ks, **kw)
    return np.asarray(c), np.asarray(t)


def test_kmer_codes_match_string_lookup():
    pore = load_pore_model()
    target = np.array([1, 2, 3, 4, 1, 2, 3, 4, 5, 1, 2, 3], np.int32)
    codes = np.asarray(_kmer_codes_from_target(jnp.asarray(target)))
    # position 0 k-mer = ACGTAC
    assert codes[0] == pore.kmer_code("ACGTAC")
    # position 2 k-mer = GTACGT
    assert codes[2] == pore.kmer_code("GTACGT")
    # position 8 starts with X; tail k-mers use the AT-append convention
    assert codes[8] == pore.kmer_code("XACGAT")


def test_spike_inserts_expected_ub_count(dataset, pore_tables):
    chunks, refs, lens, bkps = dataset
    c, t = _run(dataset, pore_tables, prop_ubs=0.10, ub_codes=(5, 6))
    for i in range(len(lens)):
        L = int(lens[i])
        n_ub = int(((t[i, :L] > 4)).sum())
        # ~10% of length, within slack for window rejection
        assert n_ub >= max(1, int(0.05 * L))
        assert n_ub <= int(0.15 * L) + 2
        # original DNA positions preserved elsewhere
        changed = (t[i, :L] != refs[i, :L])
        assert np.all(t[i, :L][changed] > 4)
        # padding untouched
        np.testing.assert_array_equal(t[i, L:], refs[i, L:])


def test_spike_positions_respect_spacing(dataset, pore_tables):
    _, refs, lens, _ = dataset
    c, t = _run(dataset, pore_tables, prop_ubs=0.10, pad=5)
    for i in range(len(lens)):
        L = int(lens[i])
        new_ubs = np.where((t[i, :L] > 4) & (refs[i, :L] <= 4))[0]
        # no two inserted UBs closer than pad
        if len(new_ubs) > 1:
            assert np.min(np.diff(new_ubs)) > 5
        # not in the 10-base edge margins
        assert np.all(new_ubs >= 10)
        assert np.all(new_ubs < L - 10)


def test_spike_modifies_signal_near_ubs_only(dataset, pore_tables):
    chunks, refs, lens, bkps = dataset
    c, t = _run(dataset, pore_tables, prop_ubs=0.08, noise_std=0.5)
    for i in range(2):
        L = int(lens[i])
        new_ubs = np.where((t[i, :L] > 4) & (refs[i, :L] <= 4))[0]
        changed = np.where(
            np.abs(c[i] - np.asarray(chunks[i], np.float32)) > 1e-6)[0]
        assert len(changed) > 0
        # every changed sample lies in some spiked span
        spans = []
        for pos in new_ubs:
            start = bkps[i, pos - 6] if pos >= 6 else 0
            spans.append((int(start), int(bkps[i, pos])))
        for s in changed:
            assert any(lo <= s < hi for lo, hi in spans), (s, spans)


def test_spike_signal_distribution_reasonable(dataset, pore_tables):
    """Spiked spans stay in the normalised signal range (med/MAD applied)."""
    c, t = _run(dataset, pore_tables, prop_ubs=0.10, noise_std=1.0)
    assert np.isfinite(c).all()
    assert np.abs(c).max() < 20


def test_fully_synth_replaces_whole_chunk(dataset, pore_tables):
    chunks, refs, lens, bkps = dataset
    c, t = _run(dataset, pore_tables, prop_ubs=0.10, fully_synth=True)
    for i in range(2):
        L = int(lens[i])
        total = int(bkps[i, L - 1])
        orig = np.asarray(chunks[i], np.float32)
        frac_changed = np.mean(np.abs(c[i][:total] - orig[:total]) > 1e-6)
        assert frac_changed > 0.95
        # beyond the last breakpoint the chunk is untouched
        np.testing.assert_allclose(c[i][total:], orig[total:])


def test_single_ub_mode(dataset, pore_tables):
    _, refs, lens, _ = dataset
    c, t = _run(dataset, pore_tables, prop_ubs=0.10, ub_codes=(5,))
    assert set(np.unique(t[t > 4])) == {5}


def test_make_spike_augment_closure(dataset):
    chunks, refs, lens, bkps = dataset
    aug = make_spike_augment(ubs="XY", prop_ubs=0.10)
    rng = np.random.default_rng(0)
    c, t = aug(np.asarray(chunks, np.float32),
               np.asarray(refs, np.int32), np.asarray(lens, np.int32),
               np.asarray(bkps, np.int32), rng)
    assert c.shape == chunks.shape and t.shape == refs.shape
    assert (t > 4).sum() > (np.asarray(refs) > 4).sum()
    # different rng draw -> different augmentation
    c2, t2 = aug(np.asarray(chunks, np.float32),
                 np.asarray(refs, np.int32), np.asarray(lens, np.int32),
                 np.asarray(bkps, np.int32), rng)
    assert not np.array_equal(t, t2)


def test_spike_mix_ubs_false_single_type(dataset, pore_tables):
    c, t = _run(dataset, pore_tables, prop_ubs=0.10, ub_codes=(5, 6),
                mix_ubs=False)
    refs = np.asarray(dataset[1])
    for i in range(len(t)):
        new = t[i][(t[i] > 4) & (refs[i] <= 4)]
        if len(new):
            assert len(set(new.tolist())) == 1, new


def test_spike_var_prop_ubs_varies_counts(dataset, pore_tables):
    c1, t1 = _run(dataset, pore_tables, prop_ubs=0.10, var_prop_ubs=0.08)
    counts = [(row > 4).sum() for row in t1]
    assert len(set(counts)) > 1  # per-item proportion jitter

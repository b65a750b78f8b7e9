"""DTW segmentation tests: recover known dwell boundaries from synthetic
signal (semantics of reference src/tools/dtw_segmentation.py)."""

import numpy as np
import pytest

from xna_basecaller_tpu.data.ctc_data import save_ctc_data
from xna_basecaller_tpu.data.pore_model import load_pore_model
from xna_basecaller_tpu.data.simulate import random_sequence, simulate_squiggle
from xna_basecaller_tpu.tools.dtw_segmentation import (
    dtw_band_align, dtw_segmentation, naive_breakpoints, segment_read,
)


def test_dtw_band_align_exact_steps():
    # query = ref levels with known dwells
    ref = np.array([0.0, 5.0, -3.0, 2.0], np.float32)
    dwells = [3, 2, 4, 2]
    query = np.repeat(ref, dwells) + 0.01
    idx = dtw_band_align(query, ref)
    reps = np.bincount(idx, minlength=len(ref))
    np.testing.assert_array_equal(reps, dwells)


def test_dtw_no_path_when_query_short():
    assert dtw_band_align(np.zeros(3, np.float32),
                          np.zeros(5, np.float32)) is None


def test_naive_breakpoints_sum():
    bk = naive_breakpoints(3600, 350)
    assert bk[-1] == 3600
    assert len(bk) == 350
    assert np.all(np.diff(bk) >= 10)


def test_segment_read_recovers_breakpoints():
    pore = load_pore_model()
    rng = np.random.default_rng(0)
    codes = random_sequence(rng, 80)
    signal, true_bk = simulate_squiggle(codes, pore, rng, noise_std=0.3)
    T = int(true_bk[-1])
    est_bk, ok = segment_read(signal[:T], len(codes), codes, pore,
                              ref_rep=3)
    assert ok
    assert est_bk[-1] == T
    err = np.abs(est_bk.astype(int) - true_bk.astype(int))
    # boundaries recovered within a few samples on average
    assert np.median(err) <= 3, np.median(err)
    assert np.mean(err) <= 6, np.mean(err)


def test_segment_read_naive_fallback():
    pore = load_pore_model()
    # impossible: ref*3 longer than the signal
    chunk = np.zeros(60, np.float32)
    codes = np.ones(50, np.uint8)
    bk, ok = segment_read(chunk, 50, codes, pore, ref_rep=3)
    assert not ok
    assert bk[-1] == 60


def test_dtw_segmentation_directory(tmp_path):
    pore = load_pore_model()
    rng = np.random.default_rng(1)
    n, chunk_len = 4, 900
    chunks = np.zeros((n, chunk_len), np.float16)
    refs = np.zeros((n, 120), np.uint8)
    lens = np.zeros(n, np.uint16)
    for i in range(n):
        codes = random_sequence(rng, 120)
        signal, bk = simulate_squiggle(codes, pore, rng)
        # crop to bases fully inside the chunk
        L = int(np.searchsorted(bk, chunk_len, "right"))
        chunks[i, : min(len(signal), chunk_len)] = \
            signal[:chunk_len].astype(np.float16)
        refs[i, :L] = codes[:L]
        lens[i] = L
    save_ctc_data(str(tmp_path), chunks, refs, lens)
    bkps, ok = dtw_segmentation(str(tmp_path), log=lambda *a: None)
    assert (tmp_path / "breakpoints.npy").exists()
    assert bkps.shape == refs.shape
    assert ok.sum() >= n - 1  # DTW succeeds for (nearly) all
    # idempotent skip
    again, _ = dtw_segmentation(str(tmp_path), log=lambda *a: None)
    assert again is None

"""Native C++ kernels vs. the pure-python/numpy fallbacks."""

import numpy as np
import pytest

from xna_basecaller_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def test_levenshtein_matches_python():
    from xna_basecaller_tpu.eval.cs_align import levenshtein as py_lev
    cases = [("kitten", "sitting"), ("", "abc"), ("ACGT", "ACGT"),
             ("ACGTACGT", "AGGTACT"), ("X" * 30, "Y" * 30)]
    for a, b in cases:
        # force the pure-python path by bypassing the native hook
        if len(a) < len(b):
            aa, bb = b, a
        else:
            aa, bb = a, b
        prev = list(range(len(bb) + 1))
        for i, ca in enumerate(aa, 1):
            cur = [i]
            for j, cb in enumerate(bb, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        assert native.levenshtein(a, b) == prev[-1], (a, b)


def _numpy_sw(query, ref):
    """Call the numpy fallback directly (native hook bypassed)."""
    import xna_basecaller_tpu.eval.accuracy as acc
    import xna_basecaller_tpu.utils.native as nat
    orig = nat.available
    nat.available = lambda: False
    try:
        return acc.sw_align(query, ref)
    finally:
        nat.available = orig


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sw_align_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGTXYN"))
    q = "".join(rng.choice(bases, size=rng.integers(20, 120)))
    r = "".join(rng.choice(bases, size=rng.integers(20, 120)))
    s_n, cig_n, b_n = native.sw_align(q, r)
    s_p, cig_p, b_p = _numpy_sw(q, r)
    assert s_n == s_p
    assert cig_n == cig_p, (q, r)
    assert tuple(b_n) == tuple(b_p)


def test_sw_align_related_sequences():
    ref = "TTGCGTAGCGGGATCCAGCTCGCTGACACATAGATCTAGCGTGACG"
    query = ref[:20] + "A" + ref[22:]  # one substitution + deletion
    s_n, cig_n, b_n = native.sw_align(query, ref)
    s_p, cig_p, b_p = _numpy_sw(query, ref)
    assert (s_n, cig_n, tuple(b_n)) == (s_p, cig_p, tuple(b_p))


def test_dtw_band_matches_numpy():
    from xna_basecaller_tpu.tools import dtw_segmentation as ds
    rng = np.random.default_rng(0)
    ref = rng.normal(size=40).astype(np.float32)
    dwells = rng.integers(2, 8, size=40)
    query = (np.repeat(ref, dwells)
             + rng.normal(scale=0.05, size=int(dwells.sum()))
             ).astype(np.float32)
    idx_native = native.dtw_band(query, ref)
    import xna_basecaller_tpu.utils.native as nat
    orig = nat.available
    nat.available = lambda: False
    try:
        idx_numpy = ds.dtw_band_align(query, ref)
    finally:
        nat.available = orig
    assert idx_native is not None and idx_numpy is not None
    # identical DP + tie-breaking -> identical paths
    np.testing.assert_array_equal(idx_native, idx_numpy)
    reps_n = np.bincount(idx_native, minlength=40)
    # boundaries recovered to within a sample or two on average
    assert np.abs(reps_n - dwells).mean() < 1.0


def test_dtw_band_infeasible():
    assert native.dtw_band(np.zeros(3, np.float32),
                           np.zeros(9, np.float32)) is None


def test_native_speedup_sw():
    """Native SW should beat numpy substantially on eval-sized sequences."""
    import time
    rng = np.random.default_rng(1)
    bases = np.array(list("ACGT"))
    q = "".join(rng.choice(bases, size=400))
    r = "".join(rng.choice(bases, size=400))
    t0 = time.perf_counter()
    for _ in range(3):
        native.sw_align(q, r)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _numpy_sw(q, r)
    t_numpy = time.perf_counter() - t0
    assert t_native / 3 < t_numpy, (t_native / 3, t_numpy)

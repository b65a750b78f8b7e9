"""Native banded SW and batched demux vs their exact full/loop oracles."""

import numpy as np
import pytest

from xna_basecaller_tpu.utils import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _noisy(seq, rng, sub=0.05, indel=0.03):
    out = []
    for c in seq:
        r = rng.random()
        if r < indel:
            continue
        out.append("ACGT"[rng.integers(4)] if r < indel + sub else c)
        if r > 1 - indel:
            out.append("ACGT"[rng.integers(4)])
    return "".join(out)


def test_banded_matches_full_when_band_covers():
    rng = np.random.default_rng(0)
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, 2689))
    for _ in range(15):
        st = int(rng.integers(0, 2300))
        q = _noisy(ref[st:st + 360], rng)
        full = native.sw_align(q, ref)
        band = native.sw_align_banded(q, ref, st - 108, st + 108)
        assert band[0] == full[0]
        assert band[2] == full[2]
        assert band[1] == full[1]


def test_banded_weak_when_band_misses():
    rng = np.random.default_rng(1)
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, 2000))
    q = ref[1500:1800]
    # band nowhere near the true diagonal -> weak/no alignment, the
    # signal callers use to rescue with the full matrix
    band = native.sw_align_banded(q, ref, -100, 100)
    full = native.sw_align(q, ref)
    assert band[0] < 0.5 * full[0]


def test_lev_demux_matches_loop():
    rng = np.random.default_rng(2)
    cands = ["".join("ACGT"[i] for i in rng.integers(0, 4, 95))
             for _ in range(200)]
    for _ in range(10):
        true = int(rng.integers(200))
        q = list(cands[true])
        for p in rng.choice(len(q), 6, replace=False):
            q[p] = "ACGT"[int(rng.integers(4))]
        q = "".join(q)
        idx, d = native.lev_demux(q, cands)
        dists = [native.levenshtein(q, c) for c in cands]
        assert d == min(dists)
        assert dists[idx] == d


def test_sw_score_batch_matches_sw_align():
    rng = np.random.default_rng(4)
    refs = ["".join("ACGT"[i] for i in rng.integers(0, 4, 89))
            for _ in range(60)]
    q = refs[17][:40] + "T" + refs[17][40:]
    scores = native.sw_score_batch(q, refs)
    loop = [native.sw_align(q, r)[0] for r in refs]
    assert (scores == np.array(loop)).all()
    assert int(np.argmax(scores)) == 17


def test_align_read_batched_scan_same_result():
    from xna_basecaller_tpu.eval.ref_align import align_read

    rng = np.random.default_rng(5)
    targets = {f"t{i}": "".join("ACGT"[j] for j in rng.integers(0, 4, 89))
               for i in range(40)}
    q = list(targets["t7"])
    for p in rng.choice(len(q), 8, replace=False):
        q[p] = "ACGT"[int(rng.integers(4))]
    q = "".join(q)
    rec = align_read("r", q, targets)  # >8 pairs -> batched scan path
    assert rec is not None and rec.target_id == "t7"


def test_lev_demux_variable_lengths():
    rng = np.random.default_rng(3)
    cands = ["".join("ACGT"[i] for i in rng.integers(0, 4, n))
             for n in (40, 95, 120, 60)]
    q = cands[2]
    idx, d = native.lev_demux(q, cands)
    assert idx == 2 and d == 0

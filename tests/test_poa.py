"""POA consensus tests (reference util.py:440-465, duplex.py:43-97)."""

import numpy as np
import pytest

from xna_basecaller_tpu.utils import native
from xna_basecaller_tpu.utils.poa import _consensus_py, consensus, poa


def _mutate(rng, seq, sub=0.05, ins=0.02, dele=0.02):
    out = []
    for ch in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append("ACGT"[rng.integers(4)])
        else:
            out.append(ch)
        if rng.random() < ins:
            out.append("ACGT"[rng.integers(4)])
    return "".join(out)


def test_identical_sequences():
    assert consensus(["ACGTACGT"] * 5) == "ACGTACGT"
    assert consensus(["ACGTACGT"]) == "ACGTACGT"
    assert consensus([]) == ""
    assert consensus(["", "ACGT", ""]) == "ACGT"


def test_majority_substitution():
    # 2-vs-1 disagreement at one position -> majority base wins
    seqs = ["ACGTACGTAC", "ACGTACGTAC", "ACGTTCGTAC"]
    assert consensus(seqs) == "ACGTACGTAC"
    assert _consensus_py(seqs) == "ACGTACGTAC"


def test_majority_indel():
    seqs = ["ACGTACGT", "ACGTACGT", "ACGTACT", "ACGTAACGT"]
    assert consensus(seqs) == "ACGTACGT"
    assert _consensus_py(seqs) == "ACGTACGT"


def test_noisy_copies_recover_truth():
    rng = np.random.default_rng(0)
    truth = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    for trial in range(3):
        copies = [_mutate(rng, truth) for _ in range(9)]
        cons = consensus(copies)
        # native edit distance to truth should be tiny vs any single copy
        d_cons = native.levenshtein(cons, truth)
        d_copy = min(native.levenshtein(c, truth) for c in copies)
        assert d_cons <= max(2, d_copy // 2), (trial, d_cons, d_copy)


def test_native_matches_python_oracle():
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    for trial in range(5):
        truth = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
        copies = [_mutate(rng, truth, sub=0.08) for _ in range(5)]
        got = native.poa_consensus(copies)
        want = _consensus_py(copies)
        assert got == want, (trial, got, want)


def test_group_api():
    groups = [["ACGT", "ACGT"], ["TTTT", "TTTA", "TTTT"], []]
    out = poa(groups)
    assert out == ["ACGT", "TTTT", ""]


def test_xna_letters_supported():
    # X/Y are first-class bases in consensus (6-letter alphabet)
    seqs = ["ACXGTYAC", "ACXGTYAC", "ACAGTYAC"]
    assert consensus(seqs) == "ACXGTYAC"

"""Aligner-fidelity bound (VERDICT r2 weak #4): the seed-indexed path vs
the exhaustive full-SW scan on noisy reads.

The reference's eval alignments come from minimap2 (`eval_model.sh:
128-132`, `-x map-ont -w 5 -c --cs=short`); minimap2/mappy are not
installable here, so the built-in aligner carries the eval chain.  Its
seed-indexed mode (the CPLX/1024-template accelerator) must not shift
the metrics that adjudicate the north star: this test aligns the same
noisy synthetic reads both ways, counts cs-tag disagreements, pushes
both PAF sets through the analyzer, and bounds the induced delta on
err_only_ub / ub_acc to < 1 percentage point."""

import numpy as np
import pytest

from xna_basecaller_tpu.core.alphabet import reverse_complement_str
from xna_basecaller_tpu.eval.analyze import analyze_paf
from xna_basecaller_tpu.eval.ref_align import align_fastq
from xna_basecaller_tpu.eval.xna_refs import XnaRefs

BASES = "ACGT"


def _noisy_copy(seq: str, rng, p_err: float = 0.10) -> str:
    """Basecall-like corruption: substitutions, insertions, deletions at
    ~p_err/3 each; UB letters survive with prob 0.7 (miscalled to a
    random canonical base otherwise, like a real miscall)."""
    out = []
    for ch in seq:
        r = rng.random()
        if ch in "XY" and rng.random() > 0.7:
            ch = BASES[rng.integers(4)]
        if r < p_err / 3:
            continue  # deletion
        if r < 2 * p_err / 3:
            out.append(BASES[rng.integers(4)])  # substitution
        else:
            out.append(ch)
        if rng.random() < p_err / 3:
            out.append(BASES[rng.integers(4)])  # insertion
    return "".join(out)


@pytest.fixture(scope="module")
def noisy_cplx_reads():
    refs = XnaRefs("CPLX")
    rng = np.random.default_rng(0)
    tids = list(refs.targets)
    picks = rng.choice(len(tids), size=40, replace=False)
    reads = {}
    for k, ti in enumerate(picks):
        tid = tids[ti]
        seq = _noisy_copy(refs.targets[tid], rng)
        if k % 2:
            seq = reverse_complement_str(seq)
        reads[f"{tid}_{k}"] = seq
    return refs, reads


def test_seed_vs_exhaustive_cs_agreement(noisy_cplx_reads):
    refs, reads = noisy_cplx_reads
    rec_seed = align_fastq(reads, refs.targets, use_seeds=True)
    rec_full = align_fastq(reads, refs.targets, use_seeds=False)
    by_seed = {r["read_id"]: r for r in rec_seed}
    by_full = {r["read_id"]: r for r in rec_full}
    # the seed path (with its rescue pass) may not drop reads the
    # exhaustive scan keeps
    assert set(by_seed) == set(by_full)
    n_target_mismatch = sum(
        by_seed[k]["target_id"] != by_full[k]["target_id"] for k in by_full)
    n_cs_mismatch = sum(
        by_seed[k]["cs"] != by_full[k]["cs"] for k in by_full)
    # at 10% read error the exact-12-mer seed top-5 plus rescue must
    # recover the exhaustive winner essentially always
    assert n_target_mismatch <= len(by_full) * 0.05, (
        n_target_mismatch, len(by_full))
    assert n_cs_mismatch <= len(by_full) * 0.10, (
        n_cs_mismatch, len(by_full))


def test_seed_vs_exhaustive_metric_delta_under_1pp(noisy_cplx_reads,
                                                   tmp_path):
    refs, reads = noisy_cplx_reads
    summaries = {}
    for tag, use_seeds in (("seed", True), ("full", False)):
        recs = align_fastq(reads, refs.targets, use_seeds=use_seeds)
        summaries[tag] = analyze_paf(
            "CPLX", recs, reads, refs=refs,
            out_dir=str(tmp_path / tag), log=lambda *a: None)
    for metric in ("err_only_ub", "ub_acc", "ub_area_acc", "err_far_ub"):
        a = summaries["seed"][metric]
        b = summaries["full"][metric]
        assert np.isfinite(a) and np.isfinite(b), metric
        assert abs(a - b) < 1.0, (metric, a, b)
    assert summaries["seed"]["num_aligned_reads"] == \
        summaries["full"]["num_aligned_reads"]

"""Golden parity: eval/analyze.py vs the reference's actual analyze_paf.py.

Builds a fixed PAF(+cs)/fastq fixture from the real POC template library,
runs /root/reference/src/tools/analyze_paf.py on it in a subprocess (pandas
CPU — runnable here; biopython is replaced by the minimal stub package in
tests/ref_compat), runs this framework's eval.analyze on the same inputs,
and asserts the results_summ metrics agree (VERDICT round-1 item #4;
reference: src/tools/analyze_paf.py:538-1035, eval_model.sh:150-177).
"""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from xna_basecaller_tpu.core.alphabet import reverse_complement_str
from xna_basecaller_tpu.eval import analyze, ref_align
from xna_basecaller_tpu.eval.xna_refs import XnaRefs

REF_ROOT = "/root/reference"
REF_ANALYZE = os.path.join(REF_ROOT, "src", "tools", "analyze_paf.py")
BIO_STUB = os.path.join(os.path.dirname(__file__), "ref_compat")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_ANALYZE), reason="reference tree not present")


def _mutate(seq: str, ub_char: str, rng) -> str:
    """Controlled sequencing errors: substitutions, indels, UB misses and
    false UB calls — enough structure to exercise every metric."""
    out = []
    bases = "ACGT"
    for ch in seq:
        r = rng.random()
        if r < 0.015:  # deletion
            continue
        if ch in "XY":
            if rng.random() < 0.15:  # UB miss
                ch = bases[rng.integers(4)]
        else:
            r2 = rng.random()
            if r2 < 0.04:  # substitution
                ch = bases[(bases.index(ch) + 1 + rng.integers(3)) % 4]
            elif r2 < 0.045:  # false UB call
                ch = ub_char
        out.append(ch)
        if rng.random() < 0.015:  # insertion
            out.append(bases[rng.integers(4)])
    return "".join(out)


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden_analyze")
    refs = XnaRefs("POC")
    rng = np.random.default_rng(42)

    # mix of 1-UB (XNA16-style), multi-UB (XNA_4Ds-style) and PC templates
    tids = (refs.xna_targets_id[:3] + refs.xna_targets_id[12:14]
            + refs.xna_targets_id[16:18] + refs.pc_targets_id[:2])
    reads = {}
    for tid in tids:
        tar = refs.targets[tid].replace("N", "X")
        for strand in "FR":
            base = tar if strand == "F" else reverse_complement_str(tar)
            ub_char = "X" if strand == "F" else "Y"
            for i in range(3):
                flank_l = "".join("ACGT"[j] for j in rng.integers(0, 4, 30))
                flank_r = "".join("ACGT"[j] for j in rng.integers(0, 4, 30))
                rid = f"{tid}_{strand}_{i}"
                reads[rid] = flank_l + _mutate(base, ub_char, rng) + flank_r

    fq_path = str(tmp / "reads-POC-golden.fastq")
    with open(fq_path, "w") as fh:
        for rid, seq in reads.items():
            fh.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")

    records = ref_align.align_fastq(reads, refs.targets)
    paf_path = str(tmp / "alignment-POC-golden.paf")
    ref_align.write_paf(records, paf_path)

    # --- reference analyzer (subprocess; cwd must see ./xna_libs) ---
    env = dict(os.environ)
    env["PYTHONPATH"] = BIO_STUB
    # data_io.py requires ~/projects/xna_basecallers to exist at import
    (tmp / "projects" / "xna_basecallers").mkdir(parents=True)
    env["HOME"] = str(tmp)
    proc = subprocess.run(
        [sys.executable, os.path.join(BIO_STUB, "run_ref_analyze.py"),
         "POC", paf_path, "-p", "-D", "-d", "5", "-R", fq_path,
         "--save_confusion_matrix"],
        cwd=REF_ROOT, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    want = pd.read_csv(str(tmp / "results_summ-POC-golden.csv"))

    # --- this framework ---
    out_dir = str(tmp / "ours")
    got = analyze.analyze_paf(
        "POC", ref_align.read_paf(paf_path), reads, max_bc_dist=5,
        max_dist=0, out_dir=out_dir, out_prefix="results_summ-POC-golden",
        save_confusion_matrix=True, log=lambda *a: None)
    return want, got, tmp, proc.stdout


INT_COLS = ("num_aligned_reads", "true_pos", "false_neg", "false_pos",
            "true_neg")
FLOAT_COLS = ("target_acc", "read_acc", "err_far_ub", "err_close_ub",
              "err_only_ub", "acc_xna", "acc_pc", "demux", "align",
              "specificity", "precision", "f1_score", "f2_score")


def test_summary_counts_match(golden):
    want, got, _, out = golden
    for col in INT_COLS:
        assert int(want[col].iloc[0]) == int(got[col]), (col, out)


@pytest.mark.parametrize("col", FLOAT_COLS)
def test_summary_metrics_match(golden, col):
    want, got, _, _ = golden
    w = float(want[col].iloc[0])
    g = float(got[col])
    assert np.isclose(g, w, atol=2e-3), f"{col}: ours={g} ref={w}"


def test_confusion_matrix_matches(golden):
    """Summed base confusion matrix (reference analyze_paf.py:520-537,
    728-737): exact integer equality."""
    want, got, tmp, _ = golden
    ref_cm = np.load(tmp / "results_summ-POC-golden-confusion_matrix.npy")
    our_cm = np.load(
        tmp / "ours" / "results_summ-POC-golden-confusion_matrix.npy")
    assert ref_cm.shape == our_cm.shape == (6, 7)
    np.testing.assert_array_equal(our_cm, ref_cm)
    assert ref_cm.sum() > 0


def test_by_tar_pos_matches(golden):
    """Per-UB-position breakdown (targets with >1 UB)."""
    want, got, tmp, _ = golden
    ref_path = tmp / "results_summ-POC-golden-by_tar_pos.csv"
    our_path = tmp / "ours" / "results_summ-POC-golden-by_tar_pos.csv"
    if not ref_path.exists():
        pytest.skip("no multi-UB targets in fixture")
    assert our_path.exists()
    ref_df = pd.read_csv(ref_path).set_index(
        ["strand", "target_id", "ub_order"]).sort_index()
    our_df = pd.read_csv(our_path).set_index(
        ["strand", "target_id", "ub_order"]).sort_index()
    assert list(ref_df.index) == list(our_df.index)
    for col in ("ub_acc", "ub_area_acc"):
        np.testing.assert_allclose(
            our_df[col].to_numpy(), ref_df[col].to_numpy(), atol=2e-3,
            err_msg=col)

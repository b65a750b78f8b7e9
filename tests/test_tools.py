"""Writers + evaluation tools tests."""

import io
import os

import numpy as np
import pandas as pd
import pytest

from xna_basecaller_tpu.core.alphabet import reverse_complement_str
from xna_basecaller_tpu.data.writers import (
    CtcDataWriter, SamWriter, mean_qscore_from_qstring, phred, read_fastq,
    typical_indices, write_fastq,
)
from xna_basecaller_tpu.eval.ref_align import align_read
from xna_basecaller_tpu.eval.xna_refs import XnaRefs
from xna_basecaller_tpu.tools.comp_basecalls_perf import comp_basecalls_perf
from xna_basecaller_tpu.tools.consolidate_ub_validation import (
    consolidate_ub_validation, pick_best_epoch,
)
from xna_basecaller_tpu.tools.eval_model import eval_model


@pytest.fixture(scope="module")
def poc():
    return XnaRefs("POC")


def test_phred_and_qscore_roundtrip():
    assert phred(0.999) == chr(30 + 33)
    q = mean_qscore_from_qstring(chr(30 + 33) * 10)
    assert 29 < q < 31
    assert mean_qscore_from_qstring("") == 0.0


def test_fastq_roundtrip(tmp_path):
    p = tmp_path / "r.fastq"
    with open(p, "w") as fh:
        write_fastq(fh, "read1", "ACGTX", "IIIII")
        write_fastq(fh, "read2", "GGTA", "IIII", tags=["RG:Z:x"])
    back = read_fastq(str(p))
    assert back == {"read1": "ACGTX", "read2": "GGTA"}


def test_sam_writer_mapped_and_unmapped(poc):
    tid = "XNA01"
    read = poc.targets[tid].replace("N", "X")
    rec = align_read("r0", read, poc.targets).as_dict()
    buf = io.StringIO()
    sam = SamWriter(buf, {tid: poc.targets[tid]})
    sam.write("r0", read, "I" * len(read), rec)
    sam.write("r1", "ACGT", "IIII", None)
    lines = buf.getvalue().strip().split("\n")
    assert lines[0].startswith("@HD")
    assert any(l.startswith("@SQ\tSN:XNA01") for l in lines)
    body = [l for l in lines if not l.startswith("@")]
    f0 = body[0].split("\t")
    assert f0[0] == "r0" and f0[1] == "0" and f0[2] == tid
    assert f0[5].endswith("M")  # full-length match cigar
    f1 = body[1].split("\t")
    assert f1[1] == "4" and f1[2] == "*"


def test_typical_indices_filters_outliers():
    x = np.array([10] * 20 + [1000])
    idx = typical_indices(x)
    assert 20 not in idx and len(idx) == 20


def test_ctc_writer_builds_training_data(tmp_path, poc):
    w = CtcDataWriter(str(tmp_path / "ctc"), min_coverage=0.5,
                      min_accuracy=0.5, log=lambda *a: None)
    rng = np.random.default_rng(0)
    for i, tid in enumerate(["XNA01", "XNA02", "PC01"] * 4):
        tar = poc.targets[tid]
        seq = tar.replace("N", "X")
        rec = align_read(f"r{i}", seq, poc.targets).as_dict()
        refseq = poc.targets[rec["target_id"]][
            rec["target_start"]:rec["target_end"]]
        sig = rng.normal(size=1200).astype(np.float32)
        assert w.add(sig, seq, rec, refseq=refseq)
    # failures counted, not stored
    assert not w.add(np.zeros(1200), "", None)
    assert w.stats["count_failed_seq"] == 1
    n = w.save()
    assert n == 12
    chunks = np.load(tmp_path / "ctc" / "chunks.npy")
    refs = np.load(tmp_path / "ctc" / "references.npy")
    lens = np.load(tmp_path / "ctc" / "reference_lengths.npy")
    assert chunks.dtype == np.float16 and refs.dtype == np.uint8
    assert len(chunks) == len(refs) == len(lens) == 12
    # forward strand: UB encoded as 5
    assert (refs == 5).any()
    assert os.path.exists(tmp_path / "ctc" / "filter_stats.csv")


def test_ctc_writer_reverse_strand_encodes_6(tmp_path, poc):
    w = CtcDataWriter(str(tmp_path / "ctc2"), min_coverage=0.5,
                      min_accuracy=0.5, log=lambda *a: None)
    tid = "XNA01"
    seq = reverse_complement_str(poc.targets[tid].replace("N", "X"))
    rec = align_read("r0", seq, poc.targets).as_dict()
    refseq = poc.targets[rec["target_id"]][
        rec["target_start"]:rec["target_end"]]
    assert rec["strand"] == "-"
    assert w.add(np.zeros(100, np.float32), seq, rec, refseq=refseq)
    assert 6 in w.targets[0]


def test_ctc_writer_ub_only_filter(tmp_path, poc):
    w = CtcDataWriter(str(tmp_path / "ctc3"), ub_only=True,
                      min_coverage=0.5, min_accuracy=0.5,
                      log=lambda *a: None)
    seq = poc.targets["PC01"]
    rec = align_read("r0", seq, poc.targets).as_dict()
    refseq = poc.targets[rec["target_id"]]
    assert not w.add(np.zeros(100, np.float32), seq, rec, refseq=refseq)
    assert w.stats["non_ubs_skipped"] == 1


def test_eval_model_from_existing_fastq(tmp_path, poc):
    # fabricate a perfect-reads fastq and run the eval chain on it
    d = tmp_path / "basecalls"
    d.mkdir()
    fq = d / "reads-POC-val.fastq"
    with open(fq, "w") as fh:
        for tid in ["XNA01", "XNA02"]:
            seq = poc.targets[tid].replace("N", "X")
            write_fastq(fh, f"{tid}_f", seq, "I" * len(seq))
            rc = reverse_complement_str(seq)
            write_fastq(fh, f"{tid}_r", rc, "I" * len(rc))
    summary = eval_model("POC", str(d), split="val", log=lambda *a: None)
    assert summary["num_aligned_reads"] == 4
    assert summary["ub_acc"] == pytest.approx(100.0)
    assert (d / "alignment-POC-val.paf").exists()
    assert (d / "results_summ-POC-val.csv").exists()
    # idempotent: rerun reuses the PAF
    summary2 = eval_model("POC", str(d), split="val", log=lambda *a: None)
    assert summary2["num_aligned_reads"] == 4


def _write_epoch_csvs(model_dir, metrics):
    for epoch, (ub, far) in metrics.items():
        d = model_dir / f"basecalls-weights_{epoch}"
        d.mkdir(parents=True)
        pd.DataFrame([{
            "num_aligned_reads": 100, "err_only_ub": ub,
            "err_close_ub": 10.0, "err_far_ub": far,
        }]).to_csv(d / "results_summ-POC-val.csv", index=False)


def test_consolidate_picks_best_epoch(tmp_path):
    _write_epoch_csvs(tmp_path, {1: (40.0, 9.0), 2: (25.0, 8.0),
                                 3: (30.0, 7.0)})
    # weights files for the symlinks
    for e in (1, 2, 3):
        (tmp_path / f"weights_{e}.npz").write_bytes(b"x")
    best = consolidate_ub_validation(str(tmp_path), exp="POC",
                                     log=lambda *a: None)
    assert best == 2
    assert os.path.islink(tmp_path / "weights_99.npz")
    assert os.readlink(tmp_path / "weights_99.npz") == "weights_2.npz"
    assert os.path.islink(tmp_path / "basecalls")


def test_pick_best_epoch_tiebreak():
    df = pd.DataFrame({
        "err_only_ub": [30.0, 20.0, 20.0],
        "err_far_ub": [5.0, 9.0, 6.0],
    }, index=[1, 2, 3])
    assert pick_best_epoch(df) == 3


def test_comp_basecalls_perf(tmp_path):
    for run, ub_acc in (("runA", 70.0), ("runB", 80.0)):
        d = tmp_path / run / "basecalls"
        d.mkdir(parents=True)
        pd.DataFrame([{
            "num_aligned_reads": 10, "ub_acc": ub_acc,
            "acc_xna": 90.0,
        }]).to_csv(d / "results_summ-POC-test.csv", index=False)
    view = comp_basecalls_perf(
        [str(tmp_path / "runA"), str(tmp_path / "runB")],
        log=lambda *a: None)
    assert list(view["run"]) == ["runA", "runB"]
    assert list(view["ub_acc"]) == [70.0, 80.0]

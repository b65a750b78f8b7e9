"""Full-length construct library: derivation, fragment simulation, and the
two-stage construct aligner feeding the CTC-data bootstrap
(reference io.py:469-505 --save-ctc semantics over xna_libs/CPLX/refdb.fasta).
"""

import os

import numpy as np
import pytest

from xna_basecaller_tpu.core.alphabet import reverse_complement_str
from xna_basecaller_tpu.data.simulate import sim_library_reads
from xna_basecaller_tpu.data.writers import CtcDataWriter
from xna_basecaller_tpu.eval.construct_align import (
    from_refs, query_span_for_ref_window)
from xna_basecaller_tpu.eval.xna_refs import XnaRefs

REF_FULL = "/root/reference/xna_libs/CPLX/refdb.fasta"


@pytest.fixture(scope="module")
def cplx():
    return XnaRefs("CPLX")


def test_full_targets_derivation(cplx):
    full = cplx.full_targets
    assert len(full) == 1024
    for tid in ("AAAAA", "ACGTC", "TTTTT"):
        t = full[tid]
        assert len(t) == 2689
        assert t[1274] == "N"
        assert cplx.full_ub_positions(tid) == [1274]
        # insert equals the short template
        assert t[1214:1303] == cplx.targets[tid]


@pytest.mark.skipif(not os.path.exists(REF_FULL),
                    reason="reference refdb.fasta not present")
def test_full_targets_match_reference(cplx):
    lines = open(REF_FULL).read().splitlines()
    ref = {lines[i][1:]: lines[i + 1] for i in range(0, len(lines), 2)}
    full = cplx.full_targets
    for tid in ("AAAAA", "CAGTC", "GGTAC", "TTTTT"):
        assert full[tid].replace("N", "X") == ref[tid]


def test_query_span_for_ref_window():
    # ref: 10 aligned bases starting at r0=100, q0=5, all matches
    cigar = [("=", 10)]
    assert query_span_for_ref_window(cigar, 5, 100, 102, 106) == (7, 11)
    # insertion in query before the window shifts query coords
    cigar = [("=", 2), ("I", 3), ("=", 8)]
    assert query_span_for_ref_window(cigar, 0, 100, 104, 108) == (7, 11)
    # deletion spanning the window start
    cigar = [("=", 2), ("D", 4), ("=", 6)]
    assert query_span_for_ref_window(cigar, 0, 100, 103, 110) == (2, 6)
    # window outside the alignment
    assert query_span_for_ref_window([("=", 5)], 0, 100, 200, 210) is None


def _mutate(seq, rng, n):
    s = list(seq)
    for p in rng.choice(len(s), size=n, replace=False):
        s[p] = "ACGT"[rng.integers(4)]
    return "".join(s)


def test_construct_align_demux_forward(cplx):
    aligner = from_refs(cplx, with_ubs=True)
    rng = np.random.default_rng(0)
    for tid in ("ACGTC", "TGCAT"):
        frag = cplx.full_targets[tid][900:1800].replace("N", "X")
        frag = _mutate(frag, rng, 30)  # ~3.3% errors
        rec = aligner.align("r", frag)
        assert rec is not None
        assert rec.target_id == tid
        assert rec.strand == "+"
        cov = (rec.read_end - rec.read_start) / len(frag)
        assert cov > 0.95
        # refseq covers the chunk span and contains the UB as N
        refseq = aligner.refseq(rec)
        assert "N" in refseq
        assert abs(len(refseq) - len(frag)) < 60


def test_construct_align_demux_reverse(cplx):
    aligner = from_refs(cplx, with_ubs=True)
    rng = np.random.default_rng(1)
    tid = "GATTA"
    frag = reverse_complement_str(
        cplx.full_targets[tid][1000:1700].replace("N", "X"))
    assert "Y" in frag
    frag = _mutate(frag, rng, 20)
    rec = aligner.align("r", frag)
    assert rec is not None and rec.target_id == tid and rec.strand == "-"


def test_construct_align_backbone_only(cplx):
    aligner = from_refs(cplx, with_ubs=True)
    frag = cplx.full_targets["CCCGG"][100:800]  # pure backbone
    rec = aligner.align("r", frag)
    assert rec is not None
    # backbone is template-independent; canonical id is fine
    assert rec.target_end <= 1214 or rec.target_start >= 1303
    assert "N" not in aligner.refseq(rec)


def test_construct_align_pcified_demux(cplx):
    aligner = from_refs(cplx, with_ubs=False)
    rng = np.random.default_rng(2)
    tid = "CATCG"
    frag = _mutate(
        cplx.full_targets[tid][950:1750].replace("N", "A"), rng, 25)
    rec = aligner.align("r", frag)
    assert rec is not None and rec.target_id == tid
    assert "N" not in aligner.refseq(rec)


def test_sim_library_reads_fragments(cplx):
    rng = np.random.default_rng(3)
    reads = list(sim_library_reads(cplx, rng, 12, with_ubs=True,
                                   read_len_chunks=2))
    assert len(reads) == 12
    for r in reads:
        n_ub = r.sequence.count("X") + r.sequence.count("Y")
        assert n_ub == 1  # centered fragment always covers the single UB
        assert len(r.signal) >= 2 * 3600  # covers the requested chunks
        # fragment is a contiguous construct substring (oriented)
        tid = r.read_id.split("_")[0]
        fwd = cplx.full_targets[tid].replace("N", "X")
        assert (r.sequence in fwd
                or r.sequence in reverse_complement_str(fwd))


def test_sim_dna_reads_uniform(cplx):
    rng = np.random.default_rng(4)
    reads = list(sim_library_reads(cplx, rng, 16, with_ubs=False,
                                   read_len_chunks=1))
    for r in reads:
        assert "X" not in r.sequence and "Y" not in r.sequence


def test_writer_reverse_strand_y_encoding(cplx, tmp_path):
    """Reverse-strand chunk-reads store the revcomp'd refseq with the UB
    coded 6 (Y) — reference io.py:536-540 strand-aware encoding."""
    aligner = from_refs(cplx, with_ubs=True)
    writer = CtcDataWriter(str(tmp_path), min_coverage=0.9,
                           min_accuracy=0.9, log=lambda *a: None)
    rng = np.random.default_rng(6)
    tid = "TGACA"
    frag = reverse_complement_str(
        cplx.full_targets[tid][1000:1360].replace("N", "X"))
    assert "Y" in frag
    seq = _mutate(frag, rng, 8)
    rec = aligner.align("c0", seq)
    assert rec is not None and rec.strand == "-"
    ok = writer.add(np.zeros(3600, np.float16), seq, rec.as_dict(),
                    refseq=aligner.refseq(rec))
    assert ok
    target = writer.targets[-1]
    assert 6 in target and 5 not in target
    assert len(target) > 0.9 * len(frag)


def test_writer_full_coverage_targets(cplx, tmp_path):
    """With construct-fragment reads, kept chunks carry targets covering
    essentially the whole chunk signal (the round-1 bootstrap stored
    ~89-base targets for 3600-sample chunks — the bug this fixes)."""
    aligner = from_refs(cplx, with_ubs=True)
    writer = CtcDataWriter(str(tmp_path), min_coverage=0.9,
                           min_accuracy=0.9, log=lambda *a: None)
    rng = np.random.default_rng(5)
    tid = "AGGCT"
    frag = cplx.full_targets[tid][1000:1360].replace("N", "X")
    seq = _mutate(frag, rng, 8)  # a realistic chunk basecall, ~360 bases
    rec = aligner.align("c0", seq)
    ok = writer.add(np.zeros(3600, np.float16), seq, rec.as_dict(),
                    refseq=aligner.refseq(rec))
    assert ok
    target = writer.targets[-1]
    assert len(target) > 0.9 * len(frag)  # full-coverage target
    assert 5 in target  # UB encoded as X on the forward strand

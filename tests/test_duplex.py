"""Duplex consensus tests (working redesign of the reference's broken
cli/duplex.py — pair finding duplex.py:184-214, consensus infer/duplex.py)."""

import numpy as np
import pandas as pd
import pytest

from xna_basecaller_tpu.core.alphabet import reverse_complement_str
from xna_basecaller_tpu.infer.duplex import (
    DuplexRead, duplex_consensus, duplex_pairs, find_follow_on,
)


def _qs(q, n):
    return chr(q + 33) * n


def test_consensus_identical_strands():
    seq = "ACGTACGTACGTACGTACGT"
    comp = reverse_complement_str(seq)
    out, q = duplex_consensus(seq, _qs(20, len(seq)), comp, _qs(20, len(seq)))
    assert out == seq
    # agreement sums the phreds (independent evidence)
    assert set(q) == {chr(40 + 33)}


def test_consensus_conflict_picks_higher_quality():
    seq1 = "ACGTACGTACGTACGTACGT"
    seq2 = "ACGTACGTACTTACGTACGT"  # G->T at index 10
    comp2 = reverse_complement_str(seq2)
    # complement strand more confident at the conflict
    q1 = _qs(15, len(seq1))
    q2 = _qs(30, len(seq2))
    out, q = duplex_consensus(seq1, q1, comp2, q2[::-1])
    assert out == seq2
    assert q[10] == chr(15 + 33)  # |30-15|
    # template more confident -> template base
    out, _ = duplex_consensus(seq1, _qs(30, len(seq1)),
                              comp2, _qs(15, len(seq2))[::-1])
    assert out == seq1


def test_consensus_low_q_insertion_dropped():
    seq1 = "ACGTACGTACGCTACGTACGTACA"
    # complement lacks the extra C at index 11 (unambiguous context)
    seq2 = "ACGTACGTACGTACGTACGTACA"
    comp2 = reverse_complement_str(seq2)
    q2 = _qs(20, len(seq2))
    # low-q insertion -> dropped
    q1 = list(_qs(20, len(seq1)))
    q1[11] = chr(5 + 33)
    out, _ = duplex_consensus(seq1, "".join(q1), comp2, q2[::-1])
    assert out == seq2
    # high-q insertion -> kept
    q1[11] = chr(25 + 33)
    out, _ = duplex_consensus(seq1, "".join(q1), comp2, q2[::-1])
    assert out == seq1


def test_consensus_unalignable_falls_back_to_better_strand():
    s1, s2 = "AAAAAAAAAA", "CCCCCCCCCC"  # revcomp(s2)=GGGG... no alignment
    out, _ = duplex_consensus(s1, _qs(10, 10), s2, _qs(30, 10))
    assert out == reverse_complement_str(s2)


def test_consensus_xna_letters():
    seq = "ACGTXCGTACGTYCGTACGT"
    comp = reverse_complement_str(seq)
    out, _ = duplex_consensus(seq, _qs(20, len(seq)), comp,
                              _qs(20, len(seq)))
    assert out == seq


def test_find_follow_on():
    base = dict(run_id="r1", alignment_coverage=0.95,
                sequence_length_template=500, duration=1.0)
    rows = [
        # valid pair: same channel/mux, opposite strand, close in time+space
        dict(base, read_id="t1", channel=1, mux=1, start_time=0.0,
             alignment_direction="+", alignment_genome_start=100,
             alignment_genome_end=600),
        dict(base, read_id="c1", channel=1, mux=1, start_time=2.0,
             alignment_direction="-", alignment_genome_start=110,
             alignment_genome_end=590),
        # same strand -> no pair
        dict(base, read_id="t2", channel=2, mux=1, start_time=0.0,
             alignment_direction="+", alignment_genome_start=100,
             alignment_genome_end=600),
        dict(base, read_id="c2", channel=2, mux=1, start_time=2.0,
             alignment_direction="+", alignment_genome_start=100,
             alignment_genome_end=600),
        # too far apart in time
        dict(base, read_id="t3", channel=3, mux=1, start_time=0.0,
             alignment_direction="+", alignment_genome_start=100,
             alignment_genome_end=600),
        dict(base, read_id="c3", channel=3, mux=1, start_time=50.0,
             alignment_direction="-", alignment_genome_start=100,
             alignment_genome_end=600),
        # different genome location
        dict(base, read_id="t4", channel=4, mux=1, start_time=0.0,
             alignment_direction="+", alignment_genome_start=100,
             alignment_genome_end=600),
        dict(base, read_id="c4", channel=4, mux=1, start_time=2.0,
             alignment_direction="-", alignment_genome_start=900,
             alignment_genome_end=1400),
        # low coverage filtered out entirely
        dict(base, read_id="t5", channel=5, mux=1, start_time=0.0,
             alignment_direction="+", alignment_genome_start=100,
             alignment_genome_end=600, alignment_coverage=0.2),
        dict(base, read_id="c5", channel=5, mux=1, start_time=2.0,
             alignment_direction="-", alignment_genome_start=100,
             alignment_genome_end=600),
    ]
    pairs = find_follow_on(pd.DataFrame(rows))
    assert pairs == [("t1", "c1")]


def test_duplex_pairs_plumbing(monkeypatch):
    """duplex_pairs basecalls only the reads in pairs and merges them."""
    from xna_basecaller_tpu.infer import duplex as dx

    seq = "ACGTACGTACGTACGTACGT"
    calls = {
        "t1": (seq, _qs(20, len(seq))),
        "c1": (reverse_complement_str(seq), _qs(20, len(seq))),
        "t9": ("AAAA", _qs(9, 4)),
    }

    class FakeRead:
        def __init__(self, rid):
            self.read_id = rid
            self.signal = np.zeros(10, np.float32)

    def fake_basecall(model, params, reads, **kw):
        assert kw["qscores"] is True
        for r in reads:
            yield r, {"sequence": calls[r.read_id][0],
                      "qstring": calls[r.read_id][1]}

    import xna_basecaller_tpu.infer.basecall as bc
    monkeypatch.setattr(bc, "basecall", fake_basecall)

    reads = [FakeRead(r) for r in ("t1", "c1", "t9")]
    out = list(dx.duplex_pairs(None, None, [("t1", "c1")], reads))
    assert len(out) == 1
    dup = out[0]
    assert isinstance(dup, DuplexRead)
    assert dup.read_id == "t1;duplex"
    assert dup.sequence == seq
    assert dup.template_id == "t1" and dup.complement_id == "c1"


def test_summary_tsv_fixed_schema_roundtrip(tmp_path):
    """Aligned + unmapped reads produce a rectangular summary TSV that
    pandas (and find_follow_on) can consume."""
    from types import SimpleNamespace

    from xna_basecaller_tpu.data.writers import summary_row

    read = SimpleNamespace(read_id="r1", filename="f", run_id="run",
                           channel=1, mux=1, start=0.0, duration=1.0,
                           template_start=0.0, template_duration=1.0)
    mapping = dict(target_id="T1", target_start=5, target_end=25,
                   read_start=2, read_end=22, strand="+",
                   alignment_block_length=20, n_matches=19,
                   percent_match=0.95, target_cover=0.9)
    r1 = summary_row(read, 100, 12.0, alignment=mapping)
    read.read_id = "r2"
    r2 = summary_row(read, 80, 9.0, alignment=None)
    assert list(r1) == list(r2)  # identical schema either way
    p = tmp_path / "summary.tsv"
    with open(p, "w") as fh:
        fh.write("\t".join(r1) + "\n")
        fh.write("\t".join(str(v) for v in r1.values()) + "\n")
        fh.write("\t".join(str(v) for v in r2.values()) + "\n")
    df = pd.read_csv(p, sep="\t")
    assert list(df.read_id) == ["r1", "r2"]
    assert df.alignment_genome.tolist() == ["T1", "*"]
    assert df.alignment_coverage.tolist() == [0.9, 0.0]

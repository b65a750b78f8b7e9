"""eval/forensics: eventalign / demux / quality forensics
(reference src/misc/data_io.py:323-487, src/misc/utils.py:512-660,
1630-1955)."""

import numpy as np
import pandas as pd
import pytest

from xna_basecaller_tpu.eval import forensics as fx


def _eventalign_df():
    # two reads over a tiny target, nanopolish-style columns
    rows = []
    for read in ("r1", "r2"):
        for pos, kmer in [(0, "ACGTAC"), (1, "CGTACG"), (2, "GTACGT")]:
            rows.append(dict(
                target_id="T1", position=pos, reference_kmer=kmer,
                read_id=read, event_index=float(pos),
                model_kmer=kmer, samples="1.0,2.0,3.0"))
    return pd.DataFrame(rows)


def test_read_eventalign_renames_and_filters(tmp_path):
    df = _eventalign_df().rename(
        columns={"target_id": "contig", "read_id": "read_name"})
    p = tmp_path / "ev.tsv"
    df.to_csv(p, sep="\t", index=False)
    out = fx.read_eventalign(str(p))
    assert {"target_id", "read_id"} <= set(out.columns)
    assert out.read_id.nunique() == 2

    lst = tmp_path / "ids.tsv"
    pd.DataFrame({"read_id": ["r1"]}).to_csv(lst, sep="\t", index=False)
    out = fx.read_eventalign(str(p), sample_list=str(lst))
    assert set(out.read_id) == {"r1"}


def test_read_eventalign_reverse_position(tmp_path):
    df = _eventalign_df().rename(
        columns={"target_id": "contig", "read_id": "read_name"})
    p = tmp_path / "ev.tsv"
    df.to_csv(p, sep="\t", index=False)
    out = fx.read_eventalign(str(p), reverse=True, target_len=10)
    # position' = -pos + target_len - 1 (reference data_io.py:434)
    assert sorted(out.position.unique()) == [7, 8, 9]


def test_fix_reversed_reference_kmers():
    # polished rows (NaN event_index) carrying rc'd kmers: consecutive
    # positions overlap the WRONG way -> module must rc them back
    df = pd.DataFrame([
        dict(target_id="T", position=0, reference_kmer="GTNCGT",
             read_id="r", event_index=np.nan, model_kmer="NNNNNN",
             samples="1.0"),
        dict(target_id="T", position=1, reference_kmer="AGTNCG",
             read_id="r", event_index=1.0, model_kmer="AGTNCG",
             samples="1.0"),
    ])
    # row0[:-1]=GTNCG == row1[1:]=GTNCG -> slides the wrong way
    out = fx._fix_reversed_reference_kmers(df)
    from xna_basecaller_tpu.core.alphabet import reverse_complement_str
    assert out.reference_kmer.iloc[0] == reverse_complement_str("GTNCGT")
    assert out.reference_kmer.iloc[1] == "AGTNCG"  # non-NaN row untouched


def test_reverse_unreverse_eventalign_roundtrip():
    df = _eventalign_df()
    rev = fx.reverse_eventalign(df, target_len=10)
    # position' = -pos + len - kmer_len (reference utils.py:1752)
    assert sorted(rev.position.unique()) == [2, 3, 4]
    back = fx.unreverse_eventalign(rev, target_len=10)
    assert sorted(back.position.unique()) == [0, 1, 2]


def test_invert_extract_count_samples():
    df = _eventalign_df()
    inv = fx.invert_samples(df)
    assert inv.samples.iloc[0] == "3.0,2.0,1.0"
    s = fx.extract_samples(df.head(2))
    assert s.tolist() == [1.0, 2.0, 3.0, 1.0, 2.0, 3.0]
    assert fx.count_samples(df).tolist() == [3] * 6
    assert fx.count_samples(df, sum_all=True) == 18


def test_extract_seq_samples_long_format():
    df = _eventalign_df()[lambda d: d.read_id == "r1"]
    out = fx.extract_seq_samples(df, x_pos=2, kmer_len=2, margin=0)
    # window covers positions 1..2 -> 2 positions x 3 samples
    assert len(out) == 6
    assert set(out.columns) == {"target_id", "position", "signal_level",
                                "is_pc"}
    assert not out.is_pc.any()


def _demux_df():
    return pd.DataFrame({
        "read_id": ["a", "b", "c", "d"],
        "target_id": ["T1", "PC_T1", "T2", "T1"],
        "read_length": [100, 250, 400, 90],
        "read_start": [0, 0, 0, 0],
        "read_end": [90, 240, 380, 80],
        "n_matches": [85, 230, 300, 40],
        "target_length": [100, 100, 400, 100],
        "barcode_distance": [1, 2, 7, 0],
        "strand": ["F", "R", "F", "R"],
    }).set_index("read_id")


def test_read_demux_derived_columns(tmp_path):
    p = tmp_path / "demux.csv"
    _demux_df().to_csv(p)
    df = fx.read_demux(str(p))
    assert df.loc["b", "is_pc"] and df.loc["b", "type"] == "PC"
    assert df.loc["a", "type"] == "XNA"
    assert df.loc["a", "read_alignment_cover"] == pytest.approx(85 / 90)
    assert df.loc["c", "template_coverage"] == pytest.approx(380 / 400)
    assert df.loc["b", "template_coverage"] == 1  # clipped


def test_filter_demux_chain(tmp_path):
    p = tmp_path / "demux.csv"
    _demux_df().to_csv(p)
    df = fx.read_demux(str(p))
    out = fx.filter_demux(df, read_len_interval=(95, 300),
                          max_barcode_dist=5, read_type="XNA",
                          output_dir=str(tmp_path))
    assert list(out.index) == ["a"]
    saved = list(tmp_path.glob("demux-k_15-w_5-*.csv.gz"))
    assert len(saved) == 1 and "XNA_only" in saved[0].name \
        and "-l_95_300" in saved[0].name and "-d_5" in saved[0].name


def test_qual_per_pos_explodes():
    df = pd.DataFrame({"read_id": ["a", "b"]})
    out = fx.qual_per_pos(df, [np.array([10, 20]), np.array([30])])
    assert len(out) == 3
    assert out.position.tolist() == [1, 2, 1]
    assert out.qual_score.tolist() == [10, 20, 30]


def test_target_to_read_index_ops():
    # target len 10; cs: 3 match, 1 sub, 2-del, +2 ins, 4 match
    rec = dict(target_length=10, target_start=0, read_start=0,
               cs=":3*at-cc+gg:4")
    idx = fx._target_to_read_index(rec, n_read=10)
    assert idx[:4].tolist() == [0, 1, 2, 3]
    # deleted target positions 4,5 nearest-fill to flanking read indices
    assert idx[4] in (3, 6) and idx[5] in (3, 6)
    # after 2-del and 2-ins the read pointer is 4+2=6 for target pos 6
    assert idx[6:].tolist() == [6, 7, 8, 9]


def test_ub_area_qual_windows():
    rec = dict(target_length=20, target_start=0, read_start=0, cs=":20")
    q = np.arange(20.0)
    win = fx.ub_area_qual(rec, q, ub_pos=[10], margin=2)
    assert win.shape == (1, 5)
    assert win[0].tolist() == [8, 9, 10, 11, 12]
    # off-read window -> None (reference asserts, utils.py:592)
    assert fx.ub_area_qual(rec, q, ub_pos=[1], margin=2) is None


def test_all_ub_area_qual_uses_strand_positions():
    class Refs:
        x_pos = {"T": [10]}
        x_pos_rev = {"T": [9]}

    recs = [dict(read_id="f", target_id="T", strand="F",
                 target_length=20, target_start=0, read_start=0, cs=":20"),
            dict(read_id="r", target_id="T", strand="R",
                 target_length=20, target_start=0, read_start=0, cs=":20")]
    quals = {"f": np.arange(20.0), "r": np.arange(20.0)}
    out = fx.all_ub_area_qual(recs, Refs(), quals, margin=1)
    assert out["f"][0].tolist() == [9, 10, 11]
    assert out["r"][0].tolist() == [8, 9, 10]


def test_reads_count_per_target_and_stats():
    df = pd.DataFrame({
        "target_id": ["T1", "T1", "T1", "T2"],
        "strand": ["F", "F", "R", "+"],
        "type": ["XNA", "XNA", "XNA", "PC"],
        "n_matches": [90, 80, 85, 70],
        "alignment_block_length": [100, 100, 100, 100],
    })
    counts = fx.reads_count_per_target(df, ["T1", "T2", "T3"])
    assert counts.loc["T1", "F"] == 2 and counts.loc["T1", "R"] == 1
    assert counts.loc["T2", "F"] == 1  # '+' normalised to F
    assert counts.loc["T3", "total"] == 0
    assert counts.loc["T1", "min_strands"] == 1

    class Refs:
        targets_id = ["T1", "T2", "T3"]

    stats = fx.reads_stats(df, Refs())
    assert stats["n_reads"] == 4 and stats["n_xna"] == 3
    assert stats["templates_covered"] == 2
    assert stats["mean_identity"] == pytest.approx(0.8125)


def test_slice_eventalign_focus_and_pc_majority():
    class Refs:
        x_pos = {"T1": [4]}

        def get_complement_target_id(self, tid):
            return "T1"

    rows = []
    for pos in range(8):
        for kmer in (["AAAAAA"] * 2 + ["NNNNNN"]):
            rows.append(dict(target_id="T1", position=pos,
                             reference_kmer=kmer, read_id="r",
                             event_index=1.0, model_kmer=kmer,
                             samples="1.0"))
    df = pd.DataFrame(rows)
    out = fx.slice_eventalign(df, Refs(), "T1", kmer_len=3, margin=0,
                              pc_majority=False)
    # focus = positions p-k+1..p = 2,3,4
    assert sorted(out.position.unique()) == [2, 3, 4]
    maj = fx.slice_eventalign(df, Refs(), "T1", kmer_len=3, margin=0,
                              pc_majority=True)
    assert set(maj.model_kmer) == {"AAAAAA"}  # minority NNNNNN dropped
    # PC target routes focus through the complement
    pc = fx.slice_eventalign(df.assign(target_id="PC_T1"), Refs(), "PC_T1",
                             kmer_len=3, margin=0, pc_majority=False)
    assert sorted(pc.position.unique()) == [2, 3, 4]


def test_read_demux_template_coverage_without_cover_fallback(tmp_path):
    # CSV already carrying read_alignment_cover but NOT template_coverage
    df = _demux_df()
    df["read_alignment_cover"] = 0.9
    p = tmp_path / "demux.csv"
    df.to_csv(p)
    out = fx.read_demux(str(p))
    assert out.loc["c", "template_coverage"] == pytest.approx(380 / 400)

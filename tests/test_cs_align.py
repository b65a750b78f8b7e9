"""Aligned-pair reconstruction + alignment pretty-printer (reference
utils.py:262-375, util.py:427-437)."""



def test_aligned_pair_reconstruction():
    """Reference compute_alignments semantics (utils.py:262-375): gapped
    equal-length strings with the full target visible outside the aligned
    window."""
    from xna_basecaller_tpu.eval.cs_align import aligned_pair

    rec = dict(target_start=2, target_end=12, target_length=12,
               cs=":3*at+gg:2-ca:2")
    ra, ta = aligned_pair(rec, "NNCGTAGGCATT", "CGTTGGGGTT")
    assert ra == "--CGTTGGGG--TT"
    assert ta == "NNCGTA--GGCATT"


def test_print_alignment_renders_and_scores(capsys):
    from xna_basecaller_tpu.eval.accuracy import print_alignment

    score = print_alignment("ACGTACGTAAGG", "ACGTTACGTAGG")
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "ACG-TACGTAAGG"   # ref with insertion gap
    assert out[2] == "ACGTTACGT-AGG"   # query with deletion gap
    assert f"Score={score}" in out[3]
    assert score > 0

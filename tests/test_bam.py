"""BGZF/BAM codec tests (reference io.py:379-445, data_io.py:505-563)."""

import gzip
import io
import struct

import numpy as np
import pytest

from xna_basecaller_tpu.data.bam import (
    BGZF_EOF, BamWriter, BgzfWriter, read_bam, read_sam, sam_to_paf_records)
from xna_basecaller_tpu.data.writers import SamWriter


def test_bgzf_gzip_compatible_roundtrip():
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, size=200_000, dtype=np.uint8).tobytes()
    buf = io.BytesIO()
    w = BgzfWriter(buf)
    # uneven write sizes to exercise block splitting
    for start in range(0, len(payload), 70_001):
        w.write(payload[start:start + 70_001])
    w.close()
    raw = buf.getvalue()
    assert raw.endswith(BGZF_EOF)
    # stdlib gzip reads concatenated members -> full payload back
    assert gzip.decompress(raw) == payload
    # every member carries the BC extra field with a consistent BSIZE chain
    off = 0
    while off < len(raw):
        assert raw[off:off + 4] == b"\x1f\x8b\x08\x04"
        (bsize,) = struct.unpack_from("<H", raw, off + 16)
        off += bsize + 1
    assert off == len(raw)


MAPPING = dict(
    target_id="T1", target_start=5, target_end=25, strand="+",
    read_start=2, read_end=22, read_length=24, mapping_quality=60,
    n_matches=19, alignment_block_length=20, target_cover=0.9,
    percent_match=0.95, cs=":10*at:9")


@pytest.fixture
def targets():
    rng = np.random.default_rng(1)
    return {name: "".join(rng.choice(list("ACGT"), 40))
            for name in ("T1", "PC_2")}


def test_bam_record_roundtrip(tmp_path, targets):
    path = str(tmp_path / "out.bam")
    w = BamWriter(path, targets)
    w.write("read1", "ACGTACGTACGTACGTACGTACGT", "I" * 24, MAPPING,
            tags=["RG:Z:grp_1", "qs:i:17", "mx:f:0.5"])
    w.write("read2", "ACGT", "", None)  # unmapped, no quals
    w.close()

    refs, recs = read_bam(path)
    assert refs == [("T1", 40), ("PC_2", 40)]
    r1, r2 = recs
    assert r1["query_name"] == "read1"
    assert r1["flag"] == 0
    assert r1["ref_id"] == 0
    assert r1["pos"] == 5
    assert r1["mapq"] == 60
    assert r1["seq"] == "ACGTACGTACGTACGTACGTACGT"
    assert r1["qual"] == "I" * 24
    assert r1["cigar"] == [("S", 2), ("M", 20), ("S", 2)]
    assert r1["tags"] == ["RG:Z:grp_1", "qs:i:17", "mx:f:0.5"]
    assert r2["flag"] == 4 and r2["ref_id"] == -1 and r2["qual"] == "*"


def test_bam_reverse_strand_and_xna_folding(tmp_path, targets):
    path = str(tmp_path / "rc.bam")
    mapping = dict(MAPPING, strand="-")
    w = BamWriter(path, targets)
    w.write("r", "AXGTACGTACGTACGTACGTACGY", "ABCDEFGHIJKLMNOPQRSTUVWX",
            mapping)
    w.close()
    _, (rec,) = read_bam(path)
    assert rec["flag"] == 16
    # reverse-complemented on write; X/Y have no nt16 code -> N (htslib rule)
    from xna_basecaller_tpu.core.alphabet import reverse_complement_str
    expect = reverse_complement_str("AXGTACGTACGTACGTACGTACGY")
    expect = "".join(c if c in "ACGT" else "N" for c in expect)
    assert rec["seq"] == expect
    assert rec["qual"] == "ABCDEFGHIJKLMNOPQRSTUVWX"[::-1]
    # soft clips swap sides under reverse (2 left / 2 right symmetric here)
    assert rec["cigar"][0][0] == "S" and rec["cigar"][-1][0] == "S"


def test_read_sam_matches_reference_dataframe_shape(tmp_path, targets):
    """SAM text and BAM binary of the same records -> identical dataframe
    (reference read_sam columns, data_io.py:513-563)."""
    sam_path = tmp_path / "out.sam"
    bam_path = str(tmp_path / "out.bam")
    with open(sam_path, "w") as fh:
        sw = SamWriter(fh, targets)
        bw = BamWriter(bam_path, targets)
        for wtr in (sw, bw):
            wtr.write("read1", "ACGTACGTACGTACGTACGTACGT", "I" * 24, MAPPING)
            wtr.write("read2", "ACGTACGTACGTACGTACGTACGT", "I" * 24,
                      dict(MAPPING, target_id="PC_2", strand="-"))
        bw.close()

    df_sam = read_sam(str(sam_path))
    df_bam = read_sam(bam_path)
    for df in (df_sam, df_bam):
        assert list(df.read_id) == ["read1", "read2"]
        assert list(df.strand) == ["+", "-"]
        assert list(df.target_id) == ["T1", "PC_2"]
        assert list(df.target_length) == [40, 40]
        assert list(df.is_pc) == [False, True]
        assert list(df.type) == ["XNA", "PC"]
        # cigar 2S 10M 1M(sub) 9M 2S -> read_start 2, read_end 22, 20 matched
        assert list(df.read_start) == [2, 2]
        assert list(df.read_end) == [22, 22]
        assert list(df.n_matches) == [20, 20]
        assert list(df.target_start) == [5, 5]
        assert list(df.target_end) == [25, 25]
        np.testing.assert_allclose(df.target_cover, 20 / 40)
        np.testing.assert_allclose(df.read_alignment_cover, 1.0)
    # byte-identical derived values between the two containers
    for col in ("read_length", "mapping_quality", "block_length",
                "percent_match"):
        assert list(df_sam[col]) == list(df_bam[col])


def test_sam_to_paf_records(tmp_path, targets):
    bam_path = str(tmp_path / "x.bam")
    w = BamWriter(bam_path, targets)
    w.write("read1", "ACGTACGTACGTACGTACGTACGT", "I" * 24, MAPPING)
    w.close()
    (rec,) = sam_to_paf_records(bam_path)
    # keys + semantics match eval.ref_align.read_paf records
    assert rec["read_id"] == "read1"
    assert rec["read_start"] == 2 and rec["read_end"] == 22
    assert rec["target_start"] == 5 and rec["target_end"] == 25
    assert rec["alignment_block_length"] == 20
    assert rec["cs"] == ""
    assert 0 < rec["percent_match"] <= 1


def test_read_group_headers_and_tags(tmp_path, targets):
    import io as _io
    fh = _io.StringIO()
    sw = SamWriter(fh, targets, read_group="runX_model")
    sw.write("r1", "ACGT", "IIII", None)
    out = fh.getvalue()
    assert "@RG\tID:runX_model\tPL:ONT" in out
    assert "RG:Z:runX_model" in out

    path = str(tmp_path / "rg.bam")
    bw = BamWriter(path, targets, read_group="runX_model")
    bw.write("r1", "ACGT", "IIII", None, tags=["qs:i:12"])
    bw.close()
    _, (rec,) = read_bam(path)
    assert rec["tags"] == ["RG:Z:runX_model", "qs:i:12"]

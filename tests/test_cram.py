"""CRAM 3.0 codec: varints, the spec's EOF constant reproduced by our
own serializer, and full write/read round-trips.

No external CRAM validator (pysam/samtools) exists in this environment
— the reference delegates CRAM to pysam (io.py:391-401); here the
container arithmetic is pinned by the published EOF constant and the
reader/writer pair (PARITY.md documents the validation ceiling)."""

import numpy as np
import pytest

from xna_basecaller_tpu.data import cram


# ---------------------------------------------------------------------------
# varints
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("v", [0, 1, 0x7F, 0x80, 0x3FFF, 0x4000,
                               0x1FFFFF, 0x200000, 0x0FFFFFFF,
                               0x10000000, 0xFFFFFFFF, 4542278])
def test_itf8_roundtrip(v):
    enc = cram.itf8_encode(v)
    got, pos = cram.itf8_decode(enc, 0)
    assert got == v and pos == len(enc)


def test_itf8_known_values():
    # spec EOF container: -1 -> ff ff ff ff 0f ; 4542278 -> e0 45 4f 46
    assert cram.itf8_encode(0xFFFFFFFF) == bytes.fromhex("ffffffff0f")
    assert cram.itf8_encode(4542278) == bytes.fromhex("e0454f46")


@pytest.mark.parametrize("v", [0, 1, 0x7F, 0x80, 0x3FFF, 1 << 20,
                               1 << 27, 1 << 34, 1 << 41, 1 << 48,
                               1 << 55, (1 << 60) + 12345])
def test_ltf8_roundtrip(v):
    enc = cram.ltf8_encode(v)
    got, pos = cram.ltf8_decode(enc, 0)
    assert got == v and pos == len(enc)


# ---------------------------------------------------------------------------
# the spec's EOF container, byte for byte
# ---------------------------------------------------------------------------

def test_eof_container_matches_spec_constant():
    """Our container/block/ITF8/LTF8/CRC serialization reproduces the
    CRAM 3.0 spec's fixed EOF container exactly — the strongest
    validation available without an external reader."""
    assert cram.eof_container() == cram.EOF_BYTES


def test_block_roundtrip_gzip_and_raw():
    data = bytes(range(200)) * 3
    for method in (cram.M_RAW, cram.M_GZIP):
        blk = cram.encode_block(cram.CT_EXTERNAL, 7, data, method=method)
        got, pos = cram.decode_block(blk, 0)
        assert pos == len(blk)
        assert got == {"ctype": cram.CT_EXTERNAL, "cid": 7, "data": data}


def test_block_crc_detects_corruption():
    blk = bytearray(cram.encode_block(cram.CT_EXTERNAL, 1, b"hello"))
    blk[6] ^= 0xFF
    with pytest.raises(ValueError):
        cram.decode_block(bytes(blk), 0)


# ---------------------------------------------------------------------------
# full-file round trips
# ---------------------------------------------------------------------------

def _write(tmp_path, records, **kw):
    path = str(tmp_path / "out.cram")
    w = cram.CramWriter(path, **kw)
    for rec in records:
        w.write(*rec)
    w.close()
    return path


def test_roundtrip_basic(tmp_path):
    rng = np.random.default_rng(0)
    recs = []
    for i in range(25):
        n = int(rng.integers(5, 300))
        seq = "".join(rng.choice(list("ACGTXY"), size=n))
        q = "".join(chr(33 + int(x)) for x in rng.integers(0, 45, size=n))
        recs.append((f"read_{i}", seq, q))
    path = _write(tmp_path, recs)
    header, got = cram.read_cram(path)
    assert header.startswith("@HD")
    assert "@PG" in header
    assert len(got) == len(recs)
    for (rid, seq, q), r in zip(recs, got):
        assert r["read_id"] == rid
        assert r["seq"] == seq
        assert r["qstring"] == q


def test_roundtrip_tags_and_read_group(tmp_path):
    recs = [("r1", "ACGT", "IIII", None, ["mx:Z:1", "ch:Z:7"]),
            ("r2", "GGTTAA", "IIIIII", None, None),
            ("r3", "TTT", "JJJ", None, ["mx:Z:2", "ch:Z:8"])]
    path = _write(tmp_path, recs, read_group="grp1")
    header, got = cram.read_cram(path)
    assert "@RG\tID:grp1" in header
    assert got[0]["tags"] == ["RG:Z:grp1", "mx:Z:1", "ch:Z:7"]
    assert got[1]["tags"] == ["RG:Z:grp1"]
    assert got[2]["tags"] == ["RG:Z:grp1", "mx:Z:2", "ch:Z:8"]


def test_roundtrip_binary_typed_tags(tmp_path):
    """Non-Z tags (mods MM/ML style, i/f/A/B) carry BAM binary typing in
    the tag stream — the TD dictionary declares the real type code, so a
    spec-conformant reader decodes by it (ADVICE r3)."""
    tags = ["mv:B:c,5,1,0,1", "ML:B:C,3,250,128", "qs:i:-42",
            "du:f:1.5", "st:A:+", "fn:Z:file.fast5"]
    recs = [("r1", "ACGT", "IIII", None, tags)]
    path = _write(tmp_path, recs)
    _, got = cram.read_cram(path)
    assert got[0]["tags"] == tags

    # codec level: int32/float/typed-array byte layouts per the BAM spec
    assert cram._tag_value_bytes("i", "-42") == (-42).to_bytes(
        4, "little", signed=True)
    assert cram._tag_value_bytes("B", "C,3,250,128") == (
        b"C" + (3).to_bytes(4, "little") + bytes([3, 250, 128]))
    assert cram._tag_value_str(
        "B", cram._tag_value_bytes("B", "s,-7,300")) == "s,-7,300"


def test_roundtrip_multiple_containers(tmp_path):
    recs = [(f"r{i}", "ACGT" * (i % 7 + 1), "!" * 4 * (i % 7 + 1))
            for i in range(37)]
    path = _write(tmp_path, recs, records_per_container=10)
    _, got = cram.read_cram(path)
    assert [r["read_id"] for r in got] == [r[0] for r in recs]
    assert [r["seq"] for r in got] == [r[1] for r in recs]


def test_roundtrip_missing_quality(tmp_path):
    path = _write(tmp_path, [("r1", "ACGTACGT", "*")])
    _, got = cram.read_cram(path)
    assert got[0]["qstring"] == "*"


def test_file_structure(tmp_path):
    """File definition + SAM header container + EOF are structurally
    where the spec puts them."""
    path = _write(tmp_path, [("r1", "ACGT", "IIII")],
                  targets={"tpl1": "A" * 100})
    buf = open(path, "rb").read()
    assert buf[:4] == b"CRAM"
    assert buf[4] == 3 and buf[5] == 0
    assert buf.endswith(cram.EOF_BYTES)
    header, got = cram.read_cram(path)
    assert "@SQ\tSN:tpl1\tLN:100" in header
    assert got[0]["seq"] == "ACGT"

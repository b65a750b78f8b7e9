"""fast5 end-to-end: write real HDF5 fast5 files (multi- and single-read
layouts) and drive get_reads + the basecaller CLI over a directory
(reference fast5.py:22-128, 284-297; cli/basecaller.py)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from xna_basecaller_tpu.data.fast5 import Read, get_reads, read_chunks


def _raw_signal(rng, n=12000, dac_base=500):
    # DAC counts with a stall prefix (high plateau) the trimmer should cut
    sig = rng.integers(dac_base - 40, dac_base + 40, size=n).astype(np.int16)
    sig[:300] = dac_base + 400
    return sig


def write_multi_fast5(path, read_ids, rng, n=12000):
    """Multi-read layout: /read_<id>/{Raw/Signal, channel_id, tracking_id}."""
    with h5py.File(path, "w") as fh:
        for i, rid in enumerate(read_ids):
            g = fh.create_group(f"read_{rid}")
            g.attrs["read_id"] = rid
            raw = g.create_group("Raw")
            raw.create_dataset("Signal", data=_raw_signal(rng, n))
            raw.attrs["read_number"] = i + 1
            raw.attrs["start_mux"] = 1
            raw.attrs["start_time"] = 4000 * i
            ch = g.create_group("channel_id")
            ch.attrs["range"] = 1400.0
            ch.attrs["digitisation"] = 8192.0
            ch.attrs["offset"] = 10.0
            ch.attrs["sampling_rate"] = 4000.0
            ch.attrs["channel_number"] = str(100 + i)
            tr = g.create_group("tracking_id")
            tr.attrs["run_id"] = "run01"
            tr.attrs["sample_id"] = "sampleA"


def write_single_fast5(path, rid, rng, n=12000):
    """Single-read layout: /Raw/Reads/Read_N + /UniqueGlobalKey/..."""
    with h5py.File(path, "w") as fh:
        reads = fh.create_group("Raw/Reads")
        g = reads.create_group("Read_7")
        g.attrs["read_id"] = rid
        g.attrs["read_number"] = 7
        g.attrs["start_mux"] = 2
        g.attrs["start_time"] = 123456
        g.create_dataset("Signal", data=_raw_signal(rng, n))
        ch = fh.create_group("UniqueGlobalKey/channel_id")
        ch.attrs["range"] = 1400.0
        ch.attrs["digitisation"] = 8192.0
        ch.attrs["offset"] = 10.0
        ch.attrs["sampling_rate"] = 4000.0
        ch.attrs["channel_number"] = "42"
        tr = fh.create_group("UniqueGlobalKey/tracking_id")
        tr.attrs["run_id"] = "run02"


@pytest.fixture()
def fast5_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "reads"
    d.mkdir()
    write_multi_fast5(d / "batch0.fast5", ["aaa", "bbb"], rng)
    write_single_fast5(d / "single.fast5", "ccc", rng)
    sub = d / "sub"
    sub.mkdir()
    write_multi_fast5(sub / "batch1.fast5", ["ddd"], rng)
    return d


def test_get_reads_both_layouts(fast5_dir):
    reads = list(get_reads(str(fast5_dir), n_proc=1))
    assert sorted(r.read_id for r in reads) == ["aaa", "bbb", "ccc"]
    by_id = {r.read_id: r for r in reads}
    # metadata carried through (multi-read layout)
    assert by_id["aaa"].run_id == "run01"
    assert by_id["aaa"].sample_id == "sampleA"
    assert by_id["bbb"].channel == "101"
    assert by_id["aaa"].mux == 1
    # single-read layout
    assert by_id["ccc"].run_id == "run02"
    assert by_id["ccc"].channel == "42"
    assert by_id["ccc"].read_number == 7


def test_get_reads_recursive_and_filters(fast5_dir):
    reads = list(get_reads(str(fast5_dir), n_proc=1, recursive=True))
    assert sorted(r.read_id for r in reads) == ["aaa", "bbb", "ccc", "ddd"]
    only = list(get_reads(str(fast5_dir), read_ids={"bbb"}, n_proc=1))
    assert [r.read_id for r in only] == ["bbb"]
    rest = list(get_reads(str(fast5_dir), read_ids={"bbb"}, skip=True,
                          n_proc=1))
    assert sorted(r.read_id for r in rest) == ["aaa", "ccc"]


def test_get_reads_pool_matches_serial(fast5_dir):
    serial = sorted(r.read_id for r in get_reads(str(fast5_dir), n_proc=1))
    pooled = sorted(r.read_id for r in get_reads(str(fast5_dir), n_proc=2))
    assert serial == pooled


def test_read_scaling_trim_normalisation(fast5_dir):
    read = next(iter(get_reads(str(fast5_dir), read_ids={"aaa"}, n_proc=1)))
    # stall prefix trimmed: signal shorter than raw
    assert len(read.signal) < 12000
    # long read -> med/MAD normalised: median ~0, MAD-scaled spread ~1
    assert abs(float(np.median(read.signal))) < 0.2
    assert 0.3 < float(np.std(read.signal)) < 3.0
    assert read.template_start >= read.start
    # chunking covers the signal with the exact window arithmetic
    chunks = list(read_chunks(read, chunksize=4000, overlap=400))
    assert chunks and all(len(c.signal) == 4000 for c in chunks)
    assert chunks[0].read_id.startswith("aaa:1:")


def test_basecaller_cli_over_fast5_dir(fast5_dir, tmp_path, capsys):
    """Full CLI path: model dir + fast5 dir -> FASTQ + summary.tsv."""
    import jax

    from xna_basecaller_tpu.cli import main as cli_main
    from xna_basecaller_tpu.core import config as config_lib
    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.models.crf_model import Model
    from xna_basecaller_tpu.train import checkpoint as ckpt

    cfg = ModelConfig(encoder=EncoderConfig(features=32, num_rnn_layers=2))
    model = Model(cfg)
    params = model.init(jax.random.key(0))
    mdir = tmp_path / "model"
    mdir.mkdir()
    config_lib.save(cfg, str(mdir))
    ckpt.save_checkpoint(str(mdir), 1, params)

    summary = tmp_path / "summary.tsv"
    cli_main(["basecaller", str(mdir), str(fast5_dir),
              "--chunksize", "2000", "--overlap", "200",
              "--batchsize", "4", "--summary", str(summary)])
    out = capsys.readouterr().out
    read_ids = {l[1:].split()[0] for l in out.splitlines()
                if l.startswith("@")}
    assert {"aaa", "bbb", "ccc"} <= read_ids
    assert summary.exists()
    header = summary.read_text().splitlines()[0].split("\t")
    assert "read_id" in header


def test_basecaller_cli_cram_output(fast5_dir, tmp_path, capsys):
    """--cram writes a CRAM 3.0 container whose records round-trip."""
    import jax

    from xna_basecaller_tpu.cli import main as cli_main
    from xna_basecaller_tpu.core import config as config_lib
    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.data.cram import EOF_BYTES, read_cram
    from xna_basecaller_tpu.models.crf_model import Model
    from xna_basecaller_tpu.train import checkpoint as ckpt

    cfg = ModelConfig(encoder=EncoderConfig(features=32, num_rnn_layers=2))
    model = Model(cfg)
    params = model.init(jax.random.key(0))
    mdir = tmp_path / "model"
    mdir.mkdir()
    config_lib.save(cfg, str(mdir))
    ckpt.save_checkpoint(str(mdir), 1, params)

    cram_path = tmp_path / "out.cram"
    cli_main(["basecaller", str(mdir), str(fast5_dir),
              "--chunksize", "2000", "--overlap", "200",
              "--batchsize", "4", "--cram", str(cram_path)])
    assert capsys.readouterr().out == ""  # CRAM mode: no FASTQ on stdout
    buf = cram_path.read_bytes()
    assert buf[:6] == b"CRAM\x03\x00" and buf.endswith(EOF_BYTES)
    header, records = read_cram(str(cram_path))
    assert "@RG\tID:model" in header
    got = {r["read_id"]: r for r in records}
    assert {"aaa", "bbb", "ccc"} <= set(got)
    for r in got.values():
        assert len(r["seq"]) > 0 and len(r["qstring"]) == len(r["seq"])
        assert any(t.startswith("RG:Z:") for t in r["tags"])

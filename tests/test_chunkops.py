"""Golden/property tests for chunk/stitch/batchify overlap arithmetic
(semantics of reference ub-bonito/bonito/util.py:152-225)."""

import numpy as np
import pytest

from xna_basecaller_tpu.data.chunkops import (
    batchify, chunk, stitch, unbatchify,
)


def test_chunk_short_signal_left_pads():
    sig = np.arange(10, dtype=np.float32)
    c = chunk(sig, 16, 4)
    assert c.shape == (1, 16)
    np.testing.assert_array_equal(c[0, :6], 0)
    np.testing.assert_array_equal(c[0, 6:], sig)


def test_chunk_exact_fit_no_stub():
    sig = np.arange(28, dtype=np.float32)
    # (28 - 4) % (16 - 4) == 0 -> no stub, two chunks
    c = chunk(sig, 16, 4)
    assert c.shape == (2, 16)
    np.testing.assert_array_equal(c[0], sig[:16])
    np.testing.assert_array_equal(c[1], sig[12:])


def test_chunk_with_stub_prepends_head_window():
    sig = np.arange(30, dtype=np.float32)
    # stub = (30-4) % 12 = 2
    c = chunk(sig, 16, 4)
    assert c.shape == (3, 16)
    np.testing.assert_array_equal(c[0], sig[:16])
    np.testing.assert_array_equal(c[1], sig[2:18])
    np.testing.assert_array_equal(c[2], sig[14:30])


@pytest.mark.parametrize("T", [3600, 5000, 7777, 12345])
def test_chunk_stitch_roundtrip_identity(T):
    """stitch(chunk(x)) == x at stride 1 with even overlap."""
    rng = np.random.default_rng(0)
    sig = rng.normal(size=T).astype(np.float32)
    chunksize, overlap = 3600, 500
    c = chunk(sig, chunksize, overlap)
    out = stitch(c, chunksize, overlap, len(sig), stride=1)
    np.testing.assert_array_equal(out, sig)


@pytest.mark.parametrize("T", [7777, 12345])
def test_chunk_stitch_reverse_roundtrip(T):
    """Reversed per-chunk results stitched with reverse=True give the
    reversed signal (the R-strand decode path, crf/basecall.py:15-24)."""
    rng = np.random.default_rng(1)
    sig = rng.normal(size=T).astype(np.float32)
    chunksize, overlap = 3600, 500
    c = chunk(sig, chunksize, overlap)
    c_rev = c[:, ::-1]
    out = stitch(c_rev, chunksize, overlap, len(sig), stride=1, reverse=True)
    np.testing.assert_array_equal(out, sig[::-1])


def test_stitch_strided_length():
    """Stitched frame count == ceil-ish coverage of T/stride frames."""
    T, chunksize, overlap, stride = 20000, 3600, 500, 5
    rng = np.random.default_rng(2)
    sig = rng.normal(size=T).astype(np.float32)
    c = chunk(sig, chunksize, overlap)
    frames = c.reshape(c.shape[0], chunksize // stride, stride).mean(-1)
    out = stitch(frames, chunksize, overlap, T, stride)
    # identical arithmetic to the reference: interior chunks contribute
    # (chunksize - overlap) // stride frames each (overlap 500, stride 5)
    semi = overlap // 2
    start, end = semi // stride, (chunksize - semi) // stride
    stub = (T - overlap) % (chunksize - overlap)
    first = (stub + semi) // stride if stub else end
    want = first + (len(c) - 2) * (end - start) + (chunksize // stride - start)
    assert out.shape[0] == want


def test_stitch_single_chunk_passthrough():
    x = np.arange(720).reshape(1, 720)
    out = stitch(x, 3600, 500, 3000, 5)
    np.testing.assert_array_equal(out, x[0])


def test_batchify_unbatchify_roundtrip():
    rng = np.random.default_rng(3)
    reads = []
    for i in range(7):
        n_chunks = int(rng.integers(1, 9))
        reads.append((f"read{i}", rng.normal(size=(n_chunks, 12))
                      .astype(np.float32)))
    batches = list(batchify(iter(reads), batchsize=4))
    # all but the last batch are exactly batchsize rows
    for _, v in batches[:-1]:
        assert len(v) == 4
    assert len(batches[-1][1]) <= 4
    out = dict(unbatchify(iter(batches)))
    assert set(out) == {k for k, _ in reads}
    for k, v in reads:
        np.testing.assert_array_equal(out[k], v)


def test_batchify_dict_results_roundtrip():
    """unbatchify works on dict-valued batch results (scores pipelines)."""
    reads = [("a", np.arange(6).reshape(6, 1)),
             ("b", np.arange(5).reshape(5, 1))]
    batches = []
    for ks, v in batchify(iter(reads), batchsize=4):
        batches.append((ks, {"x": v, "y": v * 2}))
    out = dict(unbatchify(iter(batches)))
    np.testing.assert_array_equal(out["a"]["x"], reads[0][1])
    np.testing.assert_array_equal(out["b"]["y"], reads[1][1] * 2)


def test_load_script_escape_hatch(tmp_path):
    """dataset.py with a Loader class drives custom data loading
    (reference data.py:89-96)."""
    from xna_basecaller_tpu.data.ctc_data import load_script

    (tmp_path / "dataset.py").write_text(
        "import numpy as np\n"
        "from xna_basecaller_tpu.data.ctc_data import ChunkDataset\n"
        "def _mk(n):\n"
        "    return ChunkDataset(\n"
        "        np.zeros((n, 100), np.float16),\n"
        "        np.ones((n, 10), np.uint8),\n"
        "        np.full((n,), 10, np.uint16))\n"
        "class Loader:\n"
        "    def train_dataset(self, **kw):\n"
        "        return _mk(8)\n"
        "    def valid_dataset(self, **kw):\n"
        "        return _mk(2)\n")
    train, valid = load_script(str(tmp_path))
    assert len(train) == 8 and len(valid) == 2


def test_basecall_superbatch_matches_single():
    """superbatch=G stacks G batches into one execution; output sequences
    must be identical to the per-batch path, including the trailing
    partial group."""
    import jax
    import jax.numpy as jnp

    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.infer.basecall import basecall
    from xna_basecaller_tpu.models.crf_model import Model

    cfg = ModelConfig(encoder=EncoderConfig(features=32, num_rnn_layers=2))
    model = Model(cfg)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(3)

    class R:
        def __init__(self, rid, sig):
            self.read_id, self.signal = rid, sig

    # 7 reads of ~2 chunks each -> 13+ batches of 2 -> uneven final group
    reads = [R(f"r{i}", rng.normal(size=int(rng.integers(900, 2400)))
               .astype(np.float32)) for i in range(7)]

    def run(g):
        return {r.read_id: a["sequence"] for r, a in basecall(
            model, params, iter(reads), chunksize=1000, overlap=200,
            batchsize=2, compute_dtype=jnp.float32, superbatch=g)}

    base = run(1)
    assert set(base) == {r.read_id for r in reads}
    for g in (3, 4):
        got = run(g)
        assert got == base, g

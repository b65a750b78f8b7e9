"""End-to-end basecall pipeline and simulation tests (CPU, tiny model)."""

import io

import jax
import numpy as np
import pytest

from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
from xna_basecaller_tpu.data.pore_model import load_pore_model
from xna_basecaller_tpu.data.simulate import (
    simulate_ctc_dataset, simulate_reads,
)
from xna_basecaller_tpu.infer.basecall import basecall, run_basecaller
from xna_basecaller_tpu.models.crf_model import Model


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(encoder=EncoderConfig(features=32, num_rnn_layers=2))
    m = Model(cfg)
    p = m.init(jax.random.key(0))
    return m, p


def test_pore_model_loads():
    pm = load_pore_model()
    assert len(pm.table) == 16384
    mean, std = pm.lookup("AAAAAA")
    assert 50 < mean < 150 and 0 < std < 10
    # X/Y context k-mers present
    assert any("X" in k for k in list(pm.table)[:100])


def test_simulate_reads_shapes():
    reads = list(simulate_reads(3, mean_len=5000, seed=1))
    assert len(reads) == 3
    for r in reads:
        assert r.signal.dtype == np.float32
        assert 1500 < len(r.signal) < 12000
        # normalised signal: roughly centred
        assert abs(np.median(r.signal)) < 0.5


def test_simulate_ctc_dataset_contract():
    chunks, refs, lens, bkps = simulate_ctc_dataset(
        4, chunk_len=1200, target_len=160, seed=0, ub_prop=0.05)
    assert chunks.shape == (4, 1200) and chunks.dtype == np.float16
    assert refs.dtype == np.uint8 and lens.dtype == np.uint16
    assert bkps.dtype == np.uint16
    for i in range(4):
        l = int(lens[i])
        assert 0 < l <= refs.shape[1]
        assert np.all(np.diff(bkps[i, :l].astype(int)) >= 0)
        assert refs[i, :l].max() >= 5  # UB spiked
        assert np.all(refs[i, l:] == 0)


def test_basecall_pipeline_multi_read(tiny_model):
    model, params = tiny_model
    reads = list(simulate_reads(3, mean_len=4000, seed=2))
    out = list(basecall(model, params, iter(reads),
                        chunksize=1200, overlap=200, batchsize=4))
    assert len(out) == 3
    got_ids = {r.read_id for r, _ in out}
    assert got_ids == {r.read_id for r in reads}
    for read, attrs in out:
        n_frames = -(-len(read.signal) // model.stride)
        assert 0 < len(attrs["sequence"])
        # stitched path length ~= signal frames (within chunk rounding)
        assert len(attrs["moves"]) <= n_frames + 240
        assert set(attrs["sequence"]) <= set("ACGTXY")
        assert len(attrs["qstring"]) == len(attrs["sequence"])


def test_basecall_short_read_single_chunk(tiny_model):
    """A read shorter than chunksize takes the padded single-chunk path."""
    model, params = tiny_model
    reads = list(simulate_reads(1, mean_len=700, seed=3))
    out = list(basecall(model, params, iter(reads),
                        chunksize=1200, overlap=200, batchsize=4))
    assert len(out) == 1
    assert len(out[0][1]["sequence"]) > 0


def test_run_basecaller_writes_fastq(tiny_model):
    model, params = tiny_model
    reads = list(simulate_reads(2, mean_len=3000, seed=4))
    fq = io.StringIO()
    summary = io.StringIO()
    stats = run_basecaller(model, params, iter(reads), fq, summary,
                           chunksize=1200, overlap=200, batchsize=4)
    assert stats["reads"] == 2
    assert stats["samples"] == sum(len(r.signal) for r in reads)
    assert stats["samples_per_s"] > 0
    lines = fq.getvalue().strip().split("\n")
    assert len(lines) == 8
    assert lines[0].startswith("@sim_")
    assert set(lines[1]) <= set("ACGTXY")
    assert lines[2] == "+"
    assert len(lines[3]) == len(lines[1])


def test_basecall_reverse_strand(tiny_model):
    """R-strand path: rc scores + reverse stitching runs and yields the
    same read set."""
    model, params = tiny_model
    reads = list(simulate_reads(2, mean_len=3000, seed=5))
    out = dict(
        (r.read_id, a) for r, a in
        basecall(model, params, iter(reads), chunksize=1200, overlap=200,
                 batchsize=4, reverse=True))
    assert len(out) == 2
    for a in out.values():
        assert len(a["sequence"]) > 0


def test_basecall_real_qscores(tiny_model):
    """qscores=True emits posterior-derived qualities; sequence unchanged."""
    model, params = tiny_model
    reads = list(simulate_reads(2, mean_len=3000, seed=6))
    plain = dict((r.read_id, a) for r, a in basecall(
        model, params, iter(reads), chunksize=1200, overlap=200,
        batchsize=4))
    qual = dict((r.read_id, a) for r, a in basecall(
        model, params, iter(reads), chunksize=1200, overlap=200,
        batchsize=4, qscores=True))
    for rid in plain:
        assert qual[rid]["sequence"] == plain[rid]["sequence"]
        qs = qual[rid]["qstring"]
        assert len(qs) == len(qual[rid]["sequence"])
        # a random-init model is rightly unconfident (low phred); the
        # default path emits the reference's dummy mid-scale qstring
        assert set(plain[rid]["qstring"]) == {"O"}
        assert all(ord(c) >= 33 for c in qs)


def test_decode_qual_confident_on_boosted_scores():
    """Posterior qualities are high exactly where the path is certain."""
    from xna_basecaller_tpu.ops import crf
    nb, sl, T = 4, 2, 16
    ns = nb ** sl
    C = (nb + 1) * ns
    rng = np.random.default_rng(11)
    scores = rng.normal(scale=0.05, size=(T, 1, C)).astype(np.float32)
    state = 0
    for t in range(T):  # strong stay path at state 0
        scores[t, 0, state * (nb + 1)] += 12.0
    labels, probs = crf.decode_paths_with_qual(scores, nb, sl)
    probs = np.asarray(probs)[0]
    assert np.asarray(labels)[0].tolist() == [0] * T
    assert probs.min() > 0.95  # certain path -> posterior ~1


def test_ordered_thread_map_preserves_order():
    import random
    import time
    from xna_basecaller_tpu.utils.pipeline import ordered_thread_map

    rng = random.Random(0)

    def slow_square(x):
        time.sleep(rng.random() * 0.01)  # jitter worker completion order
        return x * x

    out = list(ordered_thread_map(slow_square, range(40), n_workers=4))
    assert out == [x * x for x in range(40)]


def test_ordered_thread_map_inline_and_exceptions():
    import pytest
    from xna_basecaller_tpu.utils.pipeline import ordered_thread_map

    assert list(ordered_thread_map(str, range(3), n_workers=0)) == \
        ["0", "1", "2"]

    def boom(x):
        if x == 5:
            raise ValueError("x5")
        return x

    with pytest.raises(ValueError):
        list(ordered_thread_map(boom, range(20), n_workers=3))


def test_ordered_thread_map_cancel():
    import threading
    from xna_basecaller_tpu.utils.pipeline import ordered_thread_map

    cancel = threading.Event()
    seen = []

    def gen():
        for i in range(1000):
            if i == 10:
                cancel.set()
            yield i

    out = list(ordered_thread_map(seen.append or (lambda x: x),
                                  gen(), n_workers=2, cancel=cancel))
    # dispatcher stops soon after the cancel flag; far fewer than 1000
    assert len(out) < 100


def test_ordered_process_map():
    from xna_basecaller_tpu.utils.pipeline import ordered_process_map

    out = list(ordered_process_map(_square_for_pmap, range(25),
                                   n_workers=3))
    assert out == [x * x for x in range(25)]
    assert list(ordered_process_map(_square_for_pmap, range(4),
                                    n_workers=0)) == [0, 1, 4, 9]


def _square_for_pmap(x):
    return x * x


def test_cancel_on_sigint_sets_event():
    import os
    import signal
    from xna_basecaller_tpu.utils.pipeline import cancel_on_sigint

    previous = signal.getsignal(signal.SIGINT)
    try:
        ev = cancel_on_sigint()
        assert not ev.is_set()
        try:
            os.kill(os.getpid(), signal.SIGINT)
        except KeyboardInterrupt:
            pass
        # handler chains to the previous handler (KeyboardInterrupt); the
        # event must be set regardless
        assert ev.is_set()
    finally:
        signal.signal(signal.SIGINT, previous)


def test_basecall_with_cancel_stops_early():
    """A set cancel event stops the read producer; already-admitted reads
    still complete (clean shutdown, no hang)."""
    import threading
    import numpy as np
    import jax
    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.models.crf_model import Model
    from xna_basecaller_tpu.infer.basecall import basecall

    cfg = ModelConfig(state_len=2, labels=tuple("NACGT"),
                      encoder=EncoderConfig(features=16, num_rnn_layers=2,
                                            winlen=9, second_conv_size=8))
    model = Model(cfg)
    params = model.init(jax.random.key(0))
    cancel = threading.Event()

    class R:
        def __init__(self, i):
            self.read_id = f"r{i}"
            self.signal = np.random.default_rng(i).normal(
                size=500).astype(np.float32)

    def reads():
        for i in range(50):
            if i == 3:
                cancel.set()
            yield R(i)

    out = list(basecall(model, params, reads(), chunksize=400, overlap=100,
                        batchsize=4, cancel=cancel))
    assert 0 < len(out) < 50
    assert all(isinstance(attrs["sequence"], str) for _, attrs in out)


def test_basecall_quantized_uploads_match(tiny_model):
    """int8 quantized uploads (basecaller --quantize): the 1/24
    quantisation step must leave the score tensor essentially unchanged.
    (Decode strings from a RANDOM-init model are chaotic under any input
    perturbation, so the assertion is on scores — the physical quantity —
    not on decoded text.)"""
    import jax.numpy as jnp

    from xna_basecaller_tpu.models.crf_model import QUANT_SCALE, forward

    model, params = tiny_model
    sig = np.asarray(
        list(simulate_reads(1, mean_len=2400, seed=5))[0].signal[:2400],
        np.float32)[None]
    f16 = forward(params, jnp.asarray(sig, jnp.float16), model.cfg)
    q = np.clip(np.rint(sig * QUANT_SCALE), -127, 127).astype(np.int8)
    qs = forward(params, jnp.asarray(q), model.cfg)
    diff = np.abs(np.asarray(f16) - np.asarray(qs))
    # scores live in [-5, 5] (tanh x scale); quantisation shifts them by
    # far less than the decision margins the decoder works with
    assert np.mean(diff) < 0.05, np.mean(diff)
    assert np.percentile(diff, 99) < 0.5, np.percentile(diff, 99)


def test_basecall_beam_decode(tiny_model):
    """beam_width>0 routes decode through the path-collapsing beam search;
    results stay read-shaped and close to the Viterbi call."""
    model, params = tiny_model
    reads = list(simulate_reads(2, mean_len=3000, seed=11))
    vit = {r.read_id: a["sequence"]
           for r, a in basecall(model, params, iter(reads),
                                chunksize=1200, overlap=200, batchsize=4)}
    beam = list(basecall(model, params, iter(reads),
                         chunksize=1200, overlap=200, batchsize=4,
                         beam_width=8))
    assert {r.read_id for r, _ in beam} == set(vit)
    from xna_basecaller_tpu.eval.accuracy import accuracy
    for read, attrs in beam:
        seq = attrs["sequence"]
        assert len(seq) > 0 and set(seq) <= set("ACGTXY")
        # beam and Viterbi call near-identical sequences on an untrained
        # but deterministic model (same posterior lattice)
        assert accuracy(vit[read.read_id], seq) > 80.0

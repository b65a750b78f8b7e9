"""Trainer, checkpoint/resume, schedule, and accuracy tests (CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
from xna_basecaller_tpu.data.ctc_data import (
    ChunkDataset, load_datasets, save_ctc_data,
)
from xna_basecaller_tpu.data.simulate import simulate_ctc_dataset
from xna_basecaller_tpu.eval.accuracy import accuracy, sw_align
from xna_basecaller_tpu.models.crf_model import Model
from xna_basecaller_tpu.train import checkpoint as ckpt
from xna_basecaller_tpu.train.loop import Trainer
from xna_basecaller_tpu.train.schedule import linear_warmup_cosine_decay


def tiny_model():
    cfg = ModelConfig(encoder=EncoderConfig(
        features=32, num_rnn_layers=2, winlen=9))
    return Model(cfg)


def make_datasets(n=16, chunk_len=600, target_len=70, seed=0):
    chunks, refs, lens, bkps = simulate_ctc_dataset(
        n, chunk_len=chunk_len, target_len=target_len, seed=seed)
    train = ChunkDataset(chunks[: n - 4], refs[: n - 4], lens[: n - 4],
                         bkps[: n - 4])
    valid = ChunkDataset(chunks[n - 4:], refs[n - 4:], lens[n - 4:],
                         bkps[n - 4:], epoch_reset_seed=True)
    return train, valid


def test_schedule_warmup_then_cosine():
    sched = linear_warmup_cosine_decay(1.0, total_steps=1000,
                                       warmup_steps=100)
    assert sched(0) == pytest.approx(0.1)
    assert sched(100) == pytest.approx(1.0, abs=0.01)
    assert sched(1000) == pytest.approx(0.01, abs=0.005)
    # monotone decrease after warmup
    vals = [sched(s) for s in range(100, 1000, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_trainer_loss_decreases(tmp_path):
    model = tiny_model()
    train, valid = make_datasets()
    tr = Trainer(model, train, valid, batchsize=4, lr=2e-3,
                 warmup_steps=3, log=lambda *a: None)
    out = tr.fit(str(tmp_path), epochs=3)
    losses = [h["validation_loss"] for h in out["history"]]
    assert losses[-1] < losses[0], losses
    # checkpoints written with the reference naming contract
    assert os.path.exists(tmp_path / "weights_1.npz")
    assert os.path.exists(tmp_path / "weights_3.npz")
    assert os.path.exists(tmp_path / "training.csv")
    assert os.path.exists(tmp_path / "losses_2.csv")


def test_trainer_resume(tmp_path):
    model = tiny_model()
    train, valid = make_datasets()
    kw = dict(batchsize=4, lr=1e-3, warmup_steps=3, log=lambda *a: None)
    Trainer(model, train, valid, **kw).fit(str(tmp_path), epochs=1)
    # `epochs` is the TOTAL count (reference training.py:189-204):
    # resume from epoch 1 with epochs=2 trains exactly epoch 2 ...
    out = Trainer(model, train, valid, **kw).fit(str(tmp_path), epochs=2)
    assert [h["epoch"] for h in out["history"]] == [2]
    assert os.path.exists(tmp_path / "weights_2.npz")
    # ... and a relaunch at the same total is a no-op
    out = Trainer(model, train, valid, **kw).fit(str(tmp_path), epochs=2)
    assert out["history"] == []
    assert not os.path.exists(tmp_path / "weights_3.npz")


def test_checkpoint_roundtrip(tmp_path):
    model = tiny_model()
    p = model.init(jax.random.key(0))
    ckpt.save_checkpoint(str(tmp_path), 5, p)
    epoch, p2, _ = ckpt.load_checkpoint(str(tmp_path), jax.tree.map(
        jnp.zeros_like, p))
    assert epoch == 5
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_best_epoch_link(tmp_path):
    model = tiny_model()
    p = model.init(jax.random.key(0))
    ckpt.save_checkpoint(str(tmp_path), 1, p)
    ckpt.save_checkpoint(str(tmp_path), 2, p)
    ckpt.link_best_epoch(str(tmp_path), 1)
    assert os.path.islink(tmp_path / "weights_99.npz")
    epoch, _, _ = ckpt.load_checkpoint(
        str(tmp_path), p, epoch=99)
    assert epoch == 99


def test_frozen_params_do_not_move(tmp_path):
    """Freeze-bottom semantics (reference cli/train.py:134-158): frozen
    subtrees keep their initial values."""
    model = tiny_model()
    train, valid = make_datasets(n=8)
    tr = Trainer(model, train, valid, batchsize=4, lr=5e-3, warmup_steps=1,
                 frozen_predicate=lambda key: key.startswith("conv"),
                 log=lambda *a: None)
    p0 = model.init(jax.random.key(tr.seed))
    out = tr.fit(str(tmp_path), epochs=1)
    p1 = out["params"]
    np.testing.assert_array_equal(
        np.asarray(p0["conv"][0]["w"]), np.asarray(p1["conv"][0]["w"]))
    assert not np.allclose(
        np.asarray(p0["head"]["w"]), np.asarray(p1["head"]["w"]))


def test_ctc_data_disk_roundtrip(tmp_path):
    chunks, refs, lens, bkps = simulate_ctc_dataset(6, chunk_len=400,
                                                    target_len=50)
    save_ctc_data(str(tmp_path), chunks, refs, lens, bkps)
    train, valid = load_datasets(str(tmp_path), load_bkps=True)
    assert len(train) + len(valid) == 6
    batches = list(train.batches(2))
    c, t, l = batches[0]
    assert c.dtype == np.float32 and t.dtype == np.int32


def test_sw_accuracy_basics():
    assert accuracy("ACGTACGTACGT", "ACGTACGTACGT") == 100.0
    assert accuracy("ACGTACGTACGT", "ACGTTCGTACGT") == pytest.approx(
        100 * 11 / 12)
    assert accuracy("ACGTACGT", "") == 0.0
    # deletion
    a = accuracy("ACGTACGTAA", "ACGTCGTAA")
    assert 80 < a < 100
    # min_coverage gate
    assert accuracy("A" * 100 + "C" * 100, "A" * 10, min_coverage=0.5) == 0.0


def test_sw_align_local():
    score, cigar, (q0, q1, r0, r1) = sw_align("TTTACGTACGTTTT", "ACGTACGT")
    ops = "".join(op * c for op, c in cigar)
    assert ops == "=" * 8
    assert (q0, q1) == (3, 11)
    assert (r0, r1) == (0, 8)
    assert score == 40


def test_sw_align_xy_bases():
    """X/Y score as first-class bases."""
    assert accuracy("ACGXACGT", "ACGXACGT") == 100.0
    assert accuracy("ACGXACGT", "ACGYACGT") == pytest.approx(100 * 7 / 8)


def test_grad_accum_matches_full_batch(tmp_path):
    """grad_accum_split=2 gives (numerically close) results to split=1."""
    import jax.numpy as jnp
    from xna_basecaller_tpu.train.loop import make_optimizer, train_step
    model = tiny_model()
    train, _ = make_datasets(n=8)
    c, t, l = next(train.batches(8))
    params = model.init(jax.random.key(0))
    opt = make_optimizer(lambda _: 1e-3)

    def run(split):
        p = jax.tree.map(jnp.array, params)
        st = opt.init(p)
        p2, _, loss, gn = train_step(p, st, c, t, l, model.cfg, opt,
                                     jnp.float32, split)
        return p2, float(loss), float(gn)

    p1, loss1, gn1 = run(1)
    p2, loss2, gn2 = run(2)
    assert loss1 == pytest.approx(loss2, rel=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_dropout_active_in_training_only():
    """With drop rates set, a dropout_rng changes the forward; inference
    (no rng) is deterministic."""
    import jax.numpy as jnp
    from xna_basecaller_tpu.models import crf_model
    cfg = ModelConfig(encoder=EncoderConfig(
        features=32, num_rnn_layers=2, winlen=9,
        drop_rate=0.5, drop_rate_bottom=0.05))
    params = crf_model.init_params(jax.random.key(0), cfg)
    sig = np.random.default_rng(0).normal(size=(2, 300)).astype(np.float32)
    s1 = crf_model.forward(params, sig, cfg, jnp.float32,
                           dropout_rng=jax.random.key(1))
    s2 = crf_model.forward(params, sig, cfg, jnp.float32,
                           dropout_rng=jax.random.key(2))
    s3 = crf_model.forward(params, sig, cfg, jnp.float32)
    s4 = crf_model.forward(params, sig, cfg, jnp.float32)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(s3), np.asarray(s4))


def test_merge_ctc_dirs_hybrid(tmp_path):
    """Hybrid data prep: merge a DNA pack with an XNA pack."""
    from xna_basecaller_tpu.data.ctc_data import (
        load_numpy_datasets, merge_ctc_dirs,
    )
    dna = simulate_ctc_dataset(6, chunk_len=400, target_len=50, seed=1)
    xna = simulate_ctc_dataset(4, chunk_len=400, target_len=60, seed=2,
                               ub_prop=0.05)
    save_ctc_data(str(tmp_path / "dna"), *dna)
    save_ctc_data(str(tmp_path / "xna"), *xna)
    n = merge_ctc_dirs(str(tmp_path / "mix"), str(tmp_path / "dna"),
                       str(tmp_path / "xna"))
    assert n == 10
    chunks, targets, lengths, bkps = load_numpy_datasets(
        str(tmp_path / "mix"), load_bkps=True)
    assert len(chunks) == 10
    assert targets.shape[1] >= 60  # padded to widest
    assert (targets > 4).any()     # XNA chunks present
    # limits honoured
    n2 = merge_ctc_dirs(str(tmp_path / "mix2"), str(tmp_path / "dna"),
                        str(tmp_path / "xna"), limits=[3, None])
    assert n2 == 7


def test_resume_ignores_reserved_pseudo_epochs(tmp_path):
    """weights_90 (SWA candidate) and weights_99 (best-epoch alias) are
    selection artifacts, not training progress: resume must pick the
    highest REAL epoch, while inference "latest" loading still sees the
    alias (reference util.py:261 loads the consolidated best)."""
    import jax

    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.models.crf_model import init_params
    from xna_basecaller_tpu.train import checkpoint as ckpt

    cfg = ModelConfig(encoder=EncoderConfig(features=32, num_rnn_layers=1))
    p = init_params(jax.random.key(0), cfg)
    for e in (1, 2):
        ckpt.save_checkpoint(str(tmp_path), e, p, save_optim=False)
    ckpt.save_tree(p, str(tmp_path / "weights_90.npz"))
    ckpt.link_best_epoch(str(tmp_path), 2)

    assert ckpt.latest_epoch(str(tmp_path)) == 99          # inference view
    assert ckpt.latest_epoch(str(tmp_path),
                             exclude_reserved=True) == 2   # resume view
    epoch, _, _ = ckpt.load_checkpoint(str(tmp_path), p)
    assert epoch == 2


def test_reserved_marker_beats_adjacency_heuristic(tmp_path):
    """An SWA artifact at 90 written next to a REAL epoch 89 looks like
    training progress to the r-1-adjacency heuristic; the explicit
    sidecar marker (written by every pseudo-epoch writer) must exclude
    it from resume anyway."""
    import jax

    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.models.crf_model import init_params
    from xna_basecaller_tpu.train import checkpoint as ckpt

    cfg = ModelConfig(encoder=EncoderConfig(features=32, num_rnn_layers=1))
    p = init_params(jax.random.key(0), cfg)
    for e in (88, 89):
        ckpt.save_checkpoint(str(tmp_path), e, p, save_optim=False)
    ckpt.save_tree(p, str(tmp_path / "weights_90.npz"))
    # without the marker the heuristic treats 90 as real progress...
    assert ckpt.latest_epoch(str(tmp_path), exclude_reserved=True) == 90
    # ...the marker overrides it
    ckpt.mark_reserved(str(tmp_path), 90)
    assert ckpt.latest_epoch(str(tmp_path), exclude_reserved=True) == 89
    # and a real >=90-epoch training (no marker) still resumes from 90
    assert ckpt.latest_epoch(str(tmp_path)) == 90


def test_train_step_multi_matches_sequential(tmp_path):
    """One train_step_multi dispatch (lax.scan over K stacked batches)
    must produce the same params/losses as K sequential train_step
    calls with the same per-step dropout rngs."""
    import jax.numpy as jnp

    from xna_basecaller_tpu.train import loop

    model = tiny_model()
    cfg = model.cfg
    K, B = 3, 4
    rng = np.random.default_rng(0)
    cs = rng.normal(size=(K, B, 600)).astype(np.float32)
    ts = rng.integers(1, 7, size=(K, B, 40)).astype(np.int32)
    ls = np.full((K, B), 40, np.int32)
    optimizer = loop.make_optimizer(lambda _: 1e-3)
    base_rng = jax.random.key(7)

    p_seq = model.init(jax.random.key(0))
    s_seq = optimizer.init(p_seq)
    seq_losses = []
    for i in range(K):
        p_seq, s_seq, loss, _ = loop.train_step(
            p_seq, s_seq, cs[i], ts[i], ls[i], cfg, optimizer,
            dropout_rng=jax.random.fold_in(base_rng, i))
        seq_losses.append(float(loss))

    p_multi = model.init(jax.random.key(0))
    s_multi = optimizer.init(p_multi)
    p_multi, s_multi, losses, gns = loop.train_step_multi(
        p_multi, s_multi, jnp.asarray(cs), jnp.asarray(ts),
        jnp.asarray(ls), jnp.arange(K, dtype=jnp.int32), base_rng,
        cfg, optimizer)
    assert losses.shape == (K,) and gns.shape == (K,)
    np.testing.assert_allclose(np.asarray(losses), seq_losses,
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p_seq), jax.tree.leaves(p_multi)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=2e-5)


def test_trainer_steps_per_dispatch(tmp_path):
    """Trainer with steps_per_dispatch=2 trains the same number of steps
    (CSV rows) and still learns; leftover batches fall back to single
    dispatches."""
    model = tiny_model()
    train, valid = make_datasets()  # 12 train chunks -> 3 batches of 4
    tr = Trainer(model, train, valid, batchsize=4, lr=2e-3,
                 warmup_steps=3, steps_per_dispatch=2,
                 log=lambda *a: None)
    out = tr.fit(str(tmp_path), epochs=2)
    import csv as _csv
    with open(tmp_path / "losses_1.csv") as fh:
        rows = list(_csv.DictReader(fh))
    assert len(rows) == 3  # one K=2 dispatch + one leftover single
    losses = [h["validation_loss"] for h in out["history"]]
    assert losses[-1] < losses[0] * 1.5

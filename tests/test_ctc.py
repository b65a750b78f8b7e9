"""Legacy CTC family: loss vs torch oracle, decode, QuartzNet model.

The loss oracle is torch.nn.functional.ctc_loss — the exact function the
reference trains with (reference: ub-bonito/bonito/ctc/model.py:52)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xna_basecaller_tpu.core import config as config_lib
from xna_basecaller_tpu.core.config import BlockConfig, ModelConfig
from xna_basecaller_tpu.models import ctc_model
from xna_basecaller_tpu.ops import ctc as ctc_ops

torch = pytest.importorskip("torch")


def _rand_problem(rng, T=24, N=3, C=5, L=6):
    logits = rng.normal(size=(T, N, C)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lengths = rng.integers(2, L + 1, size=N).astype(np.int32)
    targets = np.zeros((N, L), np.int32)
    for n in range(N):
        targets[n, :lengths[n]] = rng.integers(1, C, size=lengths[n])
    return log_probs, jnp.asarray(targets), jnp.asarray(lengths)


def test_ctc_loss_matches_torch():
    rng = np.random.default_rng(0)
    log_probs, targets, lengths = _rand_problem(rng)
    T, N, C = log_probs.shape

    got = ctc_ops.ctc_loss(log_probs, targets, lengths, reduction="none")

    lp_t = torch.tensor(np.asarray(log_probs))
    want = torch.nn.functional.ctc_loss(
        lp_t, torch.tensor(np.asarray(targets)),
        torch.full((N,), T, dtype=torch.int64),
        torch.tensor(np.asarray(lengths), dtype=torch.int64),
        reduction="none", blank=0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=1e-5)

    # 'mean' reduction: torch divides by target length then averages
    got_m = ctc_ops.ctc_loss(log_probs, targets, lengths)
    want_m = torch.nn.functional.ctc_loss(
        lp_t, torch.tensor(np.asarray(targets)),
        torch.full((N,), T, dtype=torch.int64),
        torch.tensor(np.asarray(lengths), dtype=torch.int64),
        reduction="mean", blank=0)
    np.testing.assert_allclose(float(got_m), float(want_m), rtol=1e-5)


def test_ctc_loss_repeated_labels():
    """Repeated labels exercise the skip-transition mask."""
    rng = np.random.default_rng(1)
    log_probs, _, _ = _rand_problem(rng, T=20, N=2, C=4, L=5)
    targets = jnp.asarray([[1, 1, 2, 2, 1], [3, 3, 3, 0, 0]], jnp.int32)
    lengths = jnp.asarray([5, 3], jnp.int32)
    got = ctc_ops.ctc_loss(log_probs, targets, lengths, reduction="none")
    want = torch.nn.functional.ctc_loss(
        torch.tensor(np.asarray(log_probs)),
        torch.tensor(np.asarray(targets)),
        torch.full((2,), 20, dtype=torch.int64),
        torch.tensor(np.asarray(lengths), dtype=torch.int64),
        reduction="none", blank=0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_ctc_loss_grad_matches_torch():
    """Gradients w.r.t. LOGITS (through log_softmax) must match — torch's
    native ctc_loss fuses the softmax into its backward, so its log_probs
    gradient is already the logits gradient and only this composition is
    comparable."""
    rng = np.random.default_rng(2)
    T, N, C, L = 16, 2, 4, 4
    logits = rng.normal(size=(T, N, C)).astype(np.float32)
    lengths = np.array([4, 3], np.int32)
    targets = np.zeros((N, L), np.int32)
    for n in range(N):
        targets[n, :lengths[n]] = rng.integers(1, C, size=lengths[n])
    targets_j, lengths_j = jnp.asarray(targets), jnp.asarray(lengths)

    got_g = jax.grad(lambda lg: ctc_ops.ctc_loss(
        jax.nn.log_softmax(lg, axis=-1), targets_j, lengths_j))(
        jnp.asarray(logits))

    lg_t = torch.tensor(logits, requires_grad=True)
    loss = torch.nn.functional.ctc_loss(
        torch.log_softmax(lg_t, dim=-1), torch.tensor(targets),
        torch.full((N,), T, dtype=torch.int64),
        torch.tensor(lengths, dtype=torch.int64),
        reduction="mean", blank=0)
    loss.backward()
    np.testing.assert_allclose(np.asarray(got_g), lg_t.grad.numpy(),
                               rtol=1e-3, atol=1e-5)


def test_label_smoothing_loss_matches_reference_formula():
    rng = np.random.default_rng(3)
    log_probs, targets, lengths = _rand_problem(rng)
    C = log_probs.shape[2]
    d = ctc_ops.ctc_label_smoothing_loss(log_probs, targets, lengths)
    weights = np.concatenate([[0.4], np.full(C - 1, 0.1 / (C - 1))])
    want_smooth = -np.mean(np.asarray(log_probs) * weights)
    np.testing.assert_allclose(float(d["label_smooth_loss"]), want_smooth,
                               rtol=1e-6)
    np.testing.assert_allclose(
        float(d["loss"]),
        float(d["ctc_loss"]) + float(d["label_smooth_loss"]), rtol=1e-6)


def test_collapse_path():
    path = np.array([0, 1, 1, 0, 2, 0, 2, 3, 3, 0])
    seq, qstring, moves = ctc_ops.collapse_path(path, alphabet="NACGT")
    assert seq == "ACCG"  # labels 1,2,2,3 -> A C C G
    assert qstring == "*"
    assert list(np.where(moves)[0]) == [1, 4, 6, 7]


def test_collapse_path_qscores():
    path = np.array([0, 1, 1, 0, 2])
    prob = np.array([0.9, 0.8, 0.6, 0.5, 0.99])
    seq, qstring, _ = ctc_ops.collapse_path(path, prob, alphabet="NACGT")
    assert seq == "AC"
    # base A: mean(0.8, 0.6) = 0.7 -> q = -10 log10(0.3) ~ 5.2 -> 5
    assert qstring[0] == chr(5 + 33)
    # base C: 0.99 -> q = 20
    assert qstring[1] == chr(20 + 33)


def _brute_force_best_seq(probs, alphabet):
    """Enumerate all alignments, sum per collapsed sequence, return max."""
    import itertools
    T, C = probs.shape
    scores = {}
    for path in itertools.product(range(C), repeat=T):
        p = 1.0
        for t, c in enumerate(path):
            p *= probs[t, c]
        seq, _, _ = ctc_ops.collapse_path(np.array(path), alphabet=alphabet)
        scores[seq] = scores.get(seq, 0.0) + p
    return max(scores.items(), key=lambda kv: kv[1])


def test_beam_search_matches_brute_force():
    rng = np.random.default_rng(4)
    for _ in range(5):
        probs = rng.dirichlet(np.ones(3), size=5).astype(np.float32)  # T=5,C=3
        want_seq, _ = _brute_force_best_seq(probs, "NAC")
        got_seq, path = ctc_ops._beam_search_py(probs, "NAC", beamsize=128,
                                                threshold=0.0)
        assert got_seq == want_seq
        assert len(path) == len(got_seq)
        assert all(0 <= f < 5 for f in path)


def test_beam_search_native_matches_python():
    from xna_basecaller_tpu.utils import native
    if not (native.available() and hasattr(native, "ctc_beam_search")):
        pytest.skip("native beam search not built")
    rng = np.random.default_rng(5)
    probs = rng.dirichlet(np.ones(5), size=40).astype(np.float32)
    want = ctc_ops._beam_search_py(probs, "NACGT", 5, 1e-3)
    got = native.ctc_beam_search(probs, "NACGT", 5, 1e-3)
    assert got[0] == want[0]
    np.testing.assert_array_equal(got[1], want[1])


def _tiny_cfg():
    blocks = (
        BlockConfig(filters=16, repeat=1, kernel=(9,), stride=(3,)),
        BlockConfig(filters=16, repeat=3, kernel=(7,), residual=True,
                    separable=True, dropout=0.05),
        BlockConfig(filters=32, repeat=1, kernel=(1,)),
    )
    return ModelConfig(labels=tuple("NACGT"), blocks=blocks,
                       package="xna_basecaller_tpu.models.ctc_model")


def test_quartznet_forward_shapes():
    cfg = _tiny_cfg()
    model = ctc_model.CtcModel(cfg)
    assert model.stride == 3
    params = model.init(jax.random.key(0))
    sig = np.random.default_rng(0).normal(size=(2, 120)).astype(np.float32)
    lp = model.apply(params, sig)
    assert lp.shape == (40, 2, 5)
    # log-softmax: rows sum to 1 in prob space
    np.testing.assert_allclose(
        np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-5)
    seqs = model.decode_batch(lp)
    assert len(seqs) == 2 and all(isinstance(s, str) for s in seqs)


def test_quartznet_matches_torch_reference_module():
    """Build the same tiny QuartzNet in the reference's own torch code
    (ub-bonito/bonito/ctc/model.py) and assert forwards match after
    weight transplant."""
    import importlib
    import sys
    import types
    ref = "/root/reference/ub-bonito/bonito"
    try:
        if "bonito.ctc.model" in sys.modules:
            TorchModel = sys.modules["bonito.ctc.model"].Model
        else:
            # fast_ctc_decode (rust) is not installed; the reference model
            # only needs its names at import time
            sys.modules.setdefault("fast_ctc_decode", types.SimpleNamespace(
                beam_search=None, viterbi_search=None))
            if "bonito" not in sys.modules:
                pkg = types.ModuleType("bonito")
                pkg.__path__ = [ref]
                sys.modules["bonito"] = pkg
            ctcpkg = types.ModuleType("bonito.ctc")
            ctcpkg.__path__ = [ref + "/ctc"]
            sys.modules["bonito.ctc"] = ctcpkg
            TorchModel = importlib.import_module("bonito.ctc.model").Model
    except Exception as e:  # pragma: no cover - env without ref deps
        pytest.skip(f"reference ctc model unimportable: {e}")

    raw = {
        "qscore": {"bias": 0.0, "scale": 1.0},
        "input": {"features": 1},
        "labels": {"labels": ["N", "A", "C", "G", "T"]},
        "encoder": {"activation": "swish"},
        "block": [
            {"filters": 8, "repeat": 1, "kernel": [9], "stride": [3],
             "dilation": [1], "dropout": 0.0, "residual": False,
             "separable": False},
            {"filters": 8, "repeat": 2, "kernel": [7], "stride": [1],
             "dilation": [1], "dropout": 0.0, "residual": True,
             "separable": True},
        ],
    }
    tm = TorchModel(raw).eval()
    cfg = config_lib.from_dict(raw)
    model = ctc_model.CtcModel(cfg)
    params = model.init(jax.random.key(0))

    # transplant torch weights into the JAX pytree
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    def conv_w(name):
        # torch [out, in/groups, W] -> jax [W, in/groups, out]
        return np.transpose(sd[name], (2, 1, 0))

    blocks = []
    for bi, blk in enumerate(cfg.blocks):
        prefix = f"encoder.encoder.{bi}.conv"
        convs = []
        mod_i = 0
        for ri in range(blk.repeat):
            if blk.separable:
                tcs = {"depthwise": {
                           "w": conv_w(f"{prefix}.{mod_i}.depthwise.weight")},
                       "pointwise": {
                           "w": conv_w(f"{prefix}.{mod_i}.pointwise.weight")}}
            else:
                tcs = {"conv": {"w": conv_w(f"{prefix}.{mod_i}.conv.weight")}}
            bn = f"{prefix}.{mod_i + 1}"
            convs.append({"tcs": tcs, "bn": {
                "scale": sd[f"{bn}.weight"], "bias": sd[f"{bn}.bias"],
                "mean": sd[f"{bn}.running_mean"],
                "var": sd[f"{bn}.running_var"]}})
            mod_i += 2 if ri == blk.repeat - 1 else 4  # act+dropout between
        entry = {"convs": convs}
        if blk.residual:
            rp = f"encoder.encoder.{bi}.residual"
            entry["residual"] = {
                "tcs": {"conv": {"w": conv_w(f"{rp}.0.conv.weight")}},
                "bn": {"scale": sd[f"{rp}.1.weight"],
                       "bias": sd[f"{rp}.1.bias"],
                       "mean": sd[f"{rp}.1.running_mean"],
                       "var": sd[f"{rp}.1.running_var"]}}
        blocks.append(entry)
    params = {"blocks": jax.tree.map(jnp.asarray, blocks),
              "decoder": {"w": jnp.asarray(
                              conv_w("decoder.layers.0.weight")),
                          "b": jnp.asarray(sd["decoder.layers.0.bias"])}}

    sig = np.random.default_rng(7).normal(size=(2, 90)).astype(np.float32)
    got = np.asarray(model.apply(params, sig))
    with torch.no_grad():
        want = tm(torch.tensor(sig[:, None, :])).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ctc_train_step_decreases_loss():
    import optax
    cfg = _tiny_cfg()
    model = ctc_model.CtcModel(cfg)
    params = model.init(jax.random.key(0))
    optimizer = optax.adamw(1e-3)
    mask = ctc_model.bn_stat_mask(params)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.normal(size=(4, 120)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, 5, size=(4, 10)).astype(np.int32))
    lengths = jnp.full((4,), 10, jnp.int32)

    losses = []
    for i in range(8):
        params, opt_state, loss, gn = ctc_model.train_step(
            params, opt_state, chunks, targets, lengths, cfg, optimizer,
            dropout_rng=jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    # bn running stats moved away from init
    bn0 = params["blocks"][0]["convs"][0]["bn"]
    assert float(jnp.abs(bn0["mean"]).sum()) > 0


def test_ctc_basecall_pipeline():
    """End-to-end legacy pipeline on synthetic reads: chunk -> forward ->
    stitch scores -> greedy + beam decode."""
    from dataclasses import dataclass as dc

    from xna_basecaller_tpu.infer.ctc_basecall import basecall_ctc

    @dc
    class R:
        read_id: str
        signal: np.ndarray

    cfg = _tiny_cfg()
    model = ctc_model.CtcModel(cfg)
    params = model.init(jax.random.key(1))
    rng = np.random.default_rng(3)
    reads = [R(f"r{i}", rng.normal(size=n).astype(np.float32))
             for i, n in enumerate([700, 450, 900])]
    out = list(basecall_ctc(model, params, iter(reads), chunksize=300,
                            overlap=60, batchsize=4, beamsize=3))
    assert [r.read_id for r, _ in out] == ["r0", "r1", "r2"]
    for read, attrs in out:
        assert set(attrs["sequence"]) <= set("ACGT")
        assert attrs["stride"] == 3
        assert attrs["sig_move"].size >= len(read.signal) - 300
    # greedy path (beamsize=1) also emits a real qstring
    out1 = list(basecall_ctc(model, params, iter(reads[:1]), chunksize=300,
                             overlap=60, batchsize=4, beamsize=1))
    _, attrs = out1[0]
    assert len(attrs["qstring"]) == len(attrs["sequence"])
    assert attrs["mean_qscore"] > 0


def test_ctc_trainer_integration(tmp_path):
    """The generic Trainer drives the CTC family end-to-end (train_step
    dispatch, batchnorm stat writeback, validation decode)."""
    from xna_basecaller_tpu.data.ctc_data import ChunkDataset
    from xna_basecaller_tpu.train.loop import Trainer

    cfg = _tiny_cfg()
    model = ctc_model.CtcModel(cfg)
    rng = np.random.default_rng(0)
    n = 32
    chunks = rng.normal(size=(n, 120)).astype(np.float32)
    refs = rng.integers(1, 5, size=(n, 12)).astype(np.int32)
    lens = np.full((n,), 12, np.int32)
    train = ChunkDataset(chunks[:24], refs[:24], lens[:24])
    valid = ChunkDataset(chunks[24:], refs[24:], lens[24:])
    trainer = Trainer(model, train, valid, batchsize=8, lr=1e-3,
                      warmup_steps=2, log=lambda *a: None)
    res = trainer.fit(str(tmp_path), epochs=2)
    assert len(res["history"]) == 2
    assert np.isfinite(res["history"][-1]["train_loss"])
    # resume from the checkpoint it just wrote
    from xna_basecaller_tpu.utils.model_io import load_model
    config_lib.save(cfg, str(tmp_path))
    m2, p2, c2 = load_model(str(tmp_path))
    assert c2.is_ctc
    lp = m2.apply(p2, chunks[:2])
    assert lp.shape[2] == 5


def test_ctc_config_toml_roundtrip(tmp_path):
    cfg = ctc_model.quartznet5x5_config()
    config_lib.save(cfg, str(tmp_path))
    back = config_lib.load(str(tmp_path))
    assert back == cfg
    assert back.is_ctc and len(back.blocks) == 8

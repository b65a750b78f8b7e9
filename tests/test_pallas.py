"""Pallas kernels vs pure-JAX oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xna_basecaller_tpu.ops import crf, crf_pallas
from xna_basecaller_tpu.ops.lstm import init_lstm_params, lstm_forward


@pytest.mark.parametrize("n_base,state_len", [(4, 2), (6, 3)])
def test_forward_scan_pallas_matches(n_base, state_len):
    T, N = 12, 4
    C = (n_base + 1) * n_base ** state_len
    s = jax.random.normal(jax.random.key(0), (T, N, C), jnp.float32)
    a_pal, logz = crf_pallas.forward_scan_pallas(
        s, n_base, state_len, interpret=True)
    a_ref = crf.forward_scores(s, n_base, state_len)[:-1]
    np.testing.assert_allclose(
        np.asarray(a_pal), np.asarray(jnp.transpose(a_ref, (0, 2, 1))),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logz), np.asarray(crf.logz_fwd(s, n_base, state_len)),
        rtol=1e-5, atol=1e-5)


def test_backward_scan_pallas_matches():
    n_base, state_len, T, N = 6, 3, 10, 2
    C = (n_base + 1) * n_base ** state_len
    s = jax.random.normal(jax.random.key(1), (T, N, C), jnp.float32)
    b_pal = crf_pallas.backward_scan_pallas(
        s, n_base, state_len, interpret=True)
    b_ref = crf.backward_scores(s, n_base, state_len)[1:]
    np.testing.assert_allclose(
        np.asarray(b_pal), np.asarray(jnp.transpose(b_ref, (0, 2, 1))),
        rtol=1e-5, atol=1e-5)


def test_decode_paths_pallas_matches():
    n_base, state_len, T, N = 6, 3, 16, 3
    C = (n_base + 1) * n_base ** state_len
    s = jax.random.normal(jax.random.key(2), (T, N, C), jnp.float32)
    p_pal = crf_pallas.decode_paths_pallas(
        s, n_base, state_len, interpret=True)
    p_ref = crf.decode_paths(s, n_base, state_len)
    np.testing.assert_array_equal(np.asarray(p_pal), np.asarray(p_ref))


def test_lstm_pallas_matches_scan_interpret():
    from xna_basecaller_tpu.ops import lstm_pallas

    # patch the kernel call into interpret mode for CPU execution
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = patched
    try:
        p = init_lstm_params(jax.random.key(0), 128, 128)
        x = jax.random.normal(jax.random.key(1), (8, 4, 128), jnp.float32)
        y_pal = lstm_pallas.lstm_forward_pallas(p, x)
        y_ref = lstm_forward(p, x)
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)
        # reverse direction too
        y_pal_r = lstm_pallas.lstm_forward_pallas(p, x, reverse=True)
        y_ref_r = lstm_forward(p, x, reverse=True)
        np.testing.assert_allclose(np.asarray(y_pal_r), np.asarray(y_ref_r),
                                   rtol=1e-5, atol=1e-5)
    finally:
        pl.pallas_call = orig


def test_trainable_pallas_lstm_grads_match_scan():
    """Custom-VJP gradients == autodiff through the scan LSTM."""
    import jax.experimental.pallas as pl
    from xna_basecaller_tpu.ops import lstm_pallas

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = patched
    try:
        H, T, N = 32, 10, 3
        p = init_lstm_params(jax.random.key(0), H, H)
        x = jax.random.normal(jax.random.key(1), (T, N, H), jnp.float32)
        dy_seed = jax.random.normal(jax.random.key(2), (T, N, H),
                                    jnp.float32)

        def loss_pallas(params, x):
            y = lstm_pallas.lstm_forward_pallas_trainable(params, x)
            return jnp.sum(y * dy_seed)

        def loss_scan(params, x):
            y = lstm_forward(params, x)
            return jnp.sum(y * dy_seed)

        g1 = jax.grad(loss_pallas, argnums=(0, 1))(p, x)
        g2 = jax.grad(loss_scan, argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)
        # reverse direction
        g1r = jax.grad(lambda p, x: jnp.sum(
            lstm_pallas.lstm_forward_pallas_trainable(p, x, reverse=True)
            * dy_seed), argnums=(0, 1))(p, x)
        g2r = jax.grad(lambda p, x: jnp.sum(
            lstm_forward(p, x, reverse=True) * dy_seed),
            argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree.leaves(g1r), jax.tree.leaves(g2r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)
    finally:
        pl.pallas_call = orig


def test_trainable_pallas_lstm_odd_T_pad_path():
    """Odd T exercises the unroll padding in _pallas_fwd_with_cells:
    values and grads must still match the scan oracle."""
    import jax.experimental.pallas as pl
    from xna_basecaller_tpu.ops import lstm_pallas

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = patched
    try:
        H, T, N = 32, 11, 2
        p = init_lstm_params(jax.random.key(4), H, H)
        x = jax.random.normal(jax.random.key(5), (T, N, H), jnp.float32)
        dy_seed = jax.random.normal(jax.random.key(6), (T, N, H),
                                    jnp.float32)
        y1 = lstm_pallas.lstm_forward_pallas_trainable(p, x)
        y2 = lstm_forward(p, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=2e-3, atol=2e-4)
        g1 = jax.grad(lambda p, x: jnp.sum(
            lstm_pallas.lstm_forward_pallas_trainable(p, x) * dy_seed),
            argnums=(0, 1))(p, x)
        g2 = jax.grad(lambda p, x: jnp.sum(
            lstm_forward(p, x) * dy_seed), argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)
    finally:
        pl.pallas_call = orig


def test_trainable_pallas_lstm_bf16_cell_residuals():
    """XNACALL_LSTM_CELL_RESID_BF16 mode: cell-state residuals stream in
    bf16 (halves the cs HBM traffic and lets the backward unroll engage
    at full batch tile).  The in-kernel carries stay f32, so grads must
    track the f32 scan oracle within bf16-residual error (~1e-2), and
    the forward outputs stay bit-identical to flag-off (the flag only
    changes what is SAVED, not what is computed)."""
    import jax.experimental.pallas as pl
    from xna_basecaller_tpu.ops import lstm_pallas

    orig_call = pl.pallas_call
    orig_flag = lstm_pallas._CELL_RESID_COMPUTE_DTYPE

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    pl.pallas_call = patched
    lstm_pallas._CELL_RESID_COMPUTE_DTYPE = True
    try:
        H, T, N = 32, 9, 4
        p32 = init_lstm_params(jax.random.key(7), H, H)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)
        x = jax.random.normal(jax.random.key(8), (T, N, H),
                              jnp.float32).astype(jnp.bfloat16)
        dy_seed = jax.random.normal(jax.random.key(9), (T, N, H),
                                    jnp.float32)

        def loss_pallas(params, x):
            y = lstm_pallas.lstm_forward_pallas_trainable(params, x)
            return jnp.sum(y.astype(jnp.float32) * dy_seed)

        def loss_scan(params, x):
            y = lstm_forward(jax.tree.map(
                lambda a: a.astype(jnp.float32), params),
                x.astype(jnp.float32))
            return jnp.sum(y * dy_seed)

        y_on = lstm_pallas.lstm_forward_pallas_trainable(p, x)
        lstm_pallas._CELL_RESID_COMPUTE_DTYPE = False
        y_off = lstm_pallas.lstm_forward_pallas_trainable(p, x)
        np.testing.assert_array_equal(np.asarray(y_on), np.asarray(y_off))
        lstm_pallas._CELL_RESID_COMPUTE_DTYPE = True

        g1 = jax.grad(loss_pallas, argnums=(0, 1))(p, x)
        g2 = jax.grad(loss_scan, argnums=(0, 1))(p32, x)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            denom = max(1e-3, float(np.max(np.abs(b))))
            assert np.max(np.abs(a - b)) / denom < 3e-2
    finally:
        pl.pallas_call = orig_call
        lstm_pallas._CELL_RESID_COMPUTE_DTYPE = orig_flag


def test_int8_lstm_pallas_matches_quantized_oracle():
    """int8 recurrence kernel (koi --quantize parity): bit-exact against a
    plain-JAX oracle of the same quantized math, and close to the f32
    recurrence (the quantization error budget)."""
    import jax.experimental.pallas as pl
    from xna_basecaller_tpu.ops import lstm_pallas

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = patched
    try:
        H, T, N = 128, 16, 4
        p = init_lstm_params(jax.random.key(3), H, H)
        x = jax.random.normal(jax.random.key(4), (T, N, H), jnp.float32)
        y_q = lstm_pallas.lstm_forward_pallas_int8(p, x)

        # oracle: same int8 input projection, per-column int8 weights +
        # per-step h requantization
        w_q, scale = lstm_pallas.quantize_w_hh(p["w_hh"])
        wp_q, wp_s = lstm_pallas.quantize_w_hh(p["w_ih"])
        xp = lstm_pallas.int8_matmul(x, wp_q, wp_s) + p["bias"]
        deq = scale / 127.0

        def step(carry, xp_t):
            h, c = carry
            h_q = jnp.clip(jnp.round(h * 127.0), -127, 127)
            gates = xp_t + (h_q @ w_q.astype(jnp.float32)) * deq[None, :]
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        z = jnp.zeros((N, H), jnp.float32)
        _, y_ref = jax.lax.scan(step, (z, z), xp)
        np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

        # quantization error vs the exact f32 recurrence stays small
        y_f32 = lstm_forward(p, x)
        err = np.abs(np.asarray(y_q) - np.asarray(y_f32))
        assert err.mean() < 5e-3, err.mean()
        assert err.max() < 5e-2, err.max()

        # reverse direction plumbs through
        y_qr = lstm_pallas.lstm_forward_pallas_int8(p, x, reverse=True)
        assert y_qr.shape == y_q.shape
    finally:
        pl.pallas_call = orig


@pytest.mark.parametrize("n_base,state_len", [(4, 2), (6, 3)])
def test_edge_posteriors_pallas_matches(n_base, state_len):
    T, N = 10, 3
    C = (n_base + 1) * n_base ** state_len
    s = jax.random.normal(jax.random.key(5), (T, N, C), jnp.float32)
    p_pal = crf_pallas.edge_posteriors_pallas(
        s, n_base, state_len, interpret=True)
    p_ref = crf.posteriors(s, n_base, state_len)
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref),
                               rtol=1e-5, atol=1e-6)


def test_ctc_lattice_logz_pallas_matches():
    T, N, n = 14, 3, 9
    k = jax.random.split(jax.random.key(6), 2)
    stay = jax.random.normal(k[0], (T, N, n), jnp.float32)
    move = jax.random.normal(k[1], (T, N, n - 1), jnp.float32)
    lengths = jnp.asarray([n, n - 2, n - 1])
    got = crf_pallas.ctc_lattice_logz_pallas(stay, move, lengths,
                                             interpret=True)
    want = crf.ctc_lattice_logz(stay, move, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ctc_lattice_grads_pallas_match():
    T, N, n = 12, 2, 7
    k = jax.random.split(jax.random.key(7), 3)
    stay = jax.random.normal(k[0], (T, N, n), jnp.float32)
    move = jax.random.normal(k[1], (T, N, n - 1), jnp.float32)
    lengths = jnp.asarray([n, n - 1])
    ct = jax.random.normal(k[2], (N,), jnp.float32)

    d_stay, d_move, logz = crf_pallas.ctc_lattice_grads_pallas(
        stay, move, lengths, ct, interpret=True)

    want_logz = crf.ctc_lattice_logz(stay, move, lengths)
    np.testing.assert_allclose(np.asarray(logz), np.asarray(want_logz),
                               rtol=1e-5)

    want_ds, want_dm = jax.vjp(
        lambda st, mv: crf.ctc_lattice_logz_grad(st, mv, lengths),
        stay, move)[1](ct)
    np.testing.assert_allclose(np.asarray(d_stay), np.asarray(want_ds),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_move), np.asarray(want_dm),
                               rtol=1e-4, atol=1e-6)


def test_lstm_pallas_batch_tiled_matches_single_tile():
    """Batch-tiled grid (block_n < N) == untiled result; the h/c scratch
    must reset per batch tile (t==0 with time innermost)."""
    import jax.experimental.pallas as pl
    from xna_basecaller_tpu.ops import lstm_pallas

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = patched
    try:
        H, T, N = 32, 9, 16
        p = init_lstm_params(jax.random.key(0), H, H)
        x = jax.random.normal(jax.random.key(1), (T, N, H), jnp.float32)
        xp = (jnp.einsum("tni,ih->tnh", x, p["w_ih"]) + p["bias"])
        y_tiled = lstm_pallas.lstm_recurrence_pallas(
            xp, p["w_hh"], block_n=8)
        y_full = lstm_pallas.lstm_recurrence_pallas(xp, p["w_hh"])
        np.testing.assert_allclose(np.asarray(y_tiled), np.asarray(y_full),
                                   rtol=1e-5, atol=1e-5)
        y_ref = lstm_forward(p, x)
        np.testing.assert_allclose(np.asarray(y_tiled), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)
        # trainable forward kernel, tiled vs oracle
        ys, cs = lstm_pallas._pallas_fwd_with_cells(xp, p["w_hh"], block_n=8)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)
        assert cs.shape == (T, N, H)
    finally:
        pl.pallas_call = orig


def test_decode_paths_batch_tiled_matches_untiled():
    """decode_paths_pallas tiles big batches via lax.map; tiles must
    reproduce the untiled result exactly."""
    import jax.experimental.pallas as pl
    from xna_basecaller_tpu.ops import crf_pallas
    from xna_basecaller_tpu.ops import crf as crf_ops

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = patched
    try:
        n_base, state_len = 4, 2
        T, N = 12, 8
        C = (n_base + 1) * n_base ** state_len
        scores = jax.random.normal(jax.random.key(0), (T, N, C), jnp.float32)
        want = crf_ops.decode_paths(scores, n_base, state_len)
        # force the tiled path (bn=4 -> 2 tiles) through the impl helper
        tiles = jnp.transpose(scores.reshape(T, 2, 4, C), (1, 0, 2, 3))
        got = jax.lax.map(
            lambda s: crf_pallas._decode_paths_impl(
                s, n_base, state_len, True), tiles).reshape(N, -1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    finally:
        pl.pallas_call = orig


def test_full_model_grads_pallas_trainable_match_scan():
    """forward() on the (mocked) TPU training path — Pallas-trainable
    LSTM layers — must produce the same loss gradients as the CPU scan
    path for a multi-layer model."""
    import jax.experimental.pallas as pl
    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.models import crf_model
    from xna_basecaller_tpu.utils import platform

    orig_call = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    cfg = ModelConfig(encoder=EncoderConfig(features=32, num_rnn_layers=3))
    params = crf_model.init_params(jax.random.key(0), cfg)
    sig = jax.random.normal(jax.random.key(1), (4, 400), jnp.float32)

    def loss(p):
        scores = crf_model.forward(p, sig, cfg, compute_dtype=jnp.float32)
        return (scores ** 2).mean()

    g_scan = jax.grad(loss)(params)

    pl.pallas_call = patched
    orig_is_tpu = platform.is_tpu
    platform.is_tpu = lambda: True
    try:
        jax.clear_caches()  # forward() is jitted; force a re-trace
        g_pallas = jax.grad(loss)(params)
    finally:
        platform.is_tpu = orig_is_tpu
        pl.pallas_call = orig_call
        jax.clear_caches()

    flat1, _ = jax.tree.flatten(g_scan)
    flat2, _ = jax.tree.flatten(g_pallas)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_full_model_forward_int8_lstm_close_to_f32():
    """forward(lstm_int8=True) on the (mocked) TPU inference path: the
    int8 recurrence leaves the CRF score tensor within the decode margin
    of the f32 path."""
    import jax.experimental.pallas as pl
    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.models import crf_model
    from xna_basecaller_tpu.utils import platform

    orig_call = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    cfg = ModelConfig(encoder=EncoderConfig(features=64, num_rnn_layers=3))
    params = crf_model.init_params(jax.random.key(0), cfg)
    sig = jax.random.normal(jax.random.key(1), (2, 800), jnp.float32)

    ref = crf_model.forward(params, sig, cfg, compute_dtype=jnp.float32)

    pl.pallas_call = patched
    orig_is_tpu = platform.is_tpu
    platform.is_tpu = lambda: True
    try:
        jax.clear_caches()
        q = crf_model.forward(params, sig, cfg, compute_dtype=jnp.float32,
                              inference=True, lstm_int8=True)
    finally:
        platform.is_tpu = orig_is_tpu
        pl.pallas_call = orig_call
        jax.clear_caches()

    diff = np.abs(np.asarray(q) - np.asarray(ref))
    # scores live in [-5, 5] (tanh x scale)
    assert diff.mean() < 0.05, diff.mean()
    assert np.percentile(diff, 99) < 0.5, np.percentile(diff, 99)


@pytest.mark.parametrize("N", [3, 8, 96, 160])
def test_decode_paths_batch_tiling_shapes(N):
    """The decode kernels' (batch-tile, time) grid handles batch sizes
    that are not multiples of 128 (tile fallback = largest divisor)."""
    n_base, state_len, T = 6, 3, 12
    C = (n_base + 1) * n_base ** state_len
    s = jax.random.normal(jax.random.key(7), (T, N, C), jnp.float32)
    p_pal = crf_pallas.decode_paths_pallas(s, n_base, state_len,
                                           interpret=True)
    p_ref = crf.decode_paths(s, n_base, state_len)
    np.testing.assert_array_equal(np.asarray(p_pal), np.asarray(p_ref))


def test_int8_matmul_close_to_f32():
    """int8 x int8 -> int32 dense (per-column weight scales + dynamic
    per-tensor activation scale) vs the f32 matmul."""
    from xna_basecaller_tpu.ops.lstm_pallas import int8_matmul, quantize_w_hh

    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 33, 96)).astype(np.float32)
    w = (rng.normal(size=(96, 192)) *
         rng.uniform(0.2, 3.0, size=(1, 192))).astype(np.float32)
    w_q, w_s = quantize_w_hh(jnp.asarray(w))
    got = np.asarray(int8_matmul(jnp.asarray(x), w_q, w_s))
    want = x.reshape(-1, 96) @ w
    rel = np.abs(got.reshape(-1, 192) - want) / (np.abs(want).mean() + 1e-9)
    assert rel.mean() < 0.02, rel.mean()
    assert np.percentile(rel, 99.5) < 0.1


def test_pallas_lstm_odd_batch_pads_to_tile():
    """Batch sizes with no good tile divisor (the reference's quick-run
    batch 98 = 2*7*7) are padded to the next multiple of 64 inside the
    kernel entry points: an untiled 98-row block overflowed the scoped
    VMEM budget on chip (17.9MB > 16MB in the backward at H=768).
    Values and grads must match the scan oracle exactly as for friendly
    batch sizes."""
    import jax.experimental.pallas as pl
    from xna_basecaller_tpu.ops import lstm_pallas

    assert lstm_pallas._batch_pad_rows(98) == 30
    assert lstm_pallas._batch_pad_rows(128) == 0
    assert lstm_pallas._batch_pad_rows(96) == 0
    assert lstm_pallas._batch_pad_rows(3) == 0   # small batches unpadded
    assert lstm_pallas._batch_pad_rows(104) == 24

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = patched
    try:
        H, T, N = 32, 6, 98
        p = init_lstm_params(jax.random.key(0), H, H)
        x = jax.random.normal(jax.random.key(1), (T, N, H), jnp.float32)
        dy_seed = jax.random.normal(jax.random.key(2), (T, N, H),
                                    jnp.float32)
        # inference entry
        y_pal = lstm_pallas.lstm_forward_pallas(p, x)
        y_ref = lstm_forward(p, x)
        assert y_pal.shape == (T, N, H)
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                                   rtol=2e-3, atol=2e-4)
        # trainable entry: fwd + custom-VJP bwd through the padded path
        g1 = jax.grad(lambda p, x: jnp.sum(
            lstm_pallas.lstm_forward_pallas_trainable(p, x) * dy_seed),
            argnums=(0, 1))(p, x)
        g2 = jax.grad(lambda p, x: jnp.sum(
            lstm_forward(p, x) * dy_seed), argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)
    finally:
        pl.pallas_call = orig

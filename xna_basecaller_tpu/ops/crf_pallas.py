"""Pallas kernels for the CRF semiring scans (TPU).

The decode path runs three sequential scans over [T, N, n_state*(nb+1)]
score tensors (forward, backward, Viterbi-with-edge-posteriors — see
ops/crf.py).  These kernels fuse each scan step, keep the recurrent
alpha/beta state in VMEM across the whole scan, and stream one timestep
block per grid step — the TPU-native replacement for the reference's
seqdist CUDA kernels (SURVEY §2.3).

Layout: kernels work TRANSPOSED — [state..., batch] with the batch on the
minor (lane) axis — because Mosaic only supports reshapes/broadcasts on
major dimensions, and the transition expansion splits the 216-state axis
into (6, 36) factors.  The public entry points accept the standard
[T, N, C] layout and transpose at the XLA level once per call.

Numerics are bit-compatible with ops/crf.py's pure-JAX versions (same op
order per step); tests cross-check on CPU via interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lse_mid(x):
    """logsumexp over axis 1 of [ns, K, N]."""
    m = jnp.max(x, axis=1, keepdims=True)
    return (m + jnp.log(jnp.sum(jnp.exp(x - m), axis=1,
                                keepdims=True)))[:, 0, :]


def _max_mid(x):
    return jnp.max(x, axis=1)


def _expand_pred_t(alpha, n_base, ns):
    """alpha [ns, N] -> pred [ns, n_base, N]:
    pred[j, i, n] = alpha[i * nsd + j // n_base, n].
    Major-dim reshapes only (Mosaic-safe)."""
    nsd = ns // n_base
    N = alpha.shape[-1]
    a3 = alpha.reshape(n_base, nsd, N)          # [i, m, n]
    at = jnp.transpose(a3, (1, 0, 2))           # [m, i, n]
    ab = jnp.broadcast_to(at[:, None], (nsd, n_base, n_base, N))
    return ab.reshape(ns, n_base, N)            # j = m * n_base + r


def _fwd_step(n_base, ns, ms_t, alpha):
    """alpha_t -> alpha_{t+1} (Log semiring)."""
    stay = (alpha + ms_t[:, 0, :])[:, None]
    move = _expand_pred_t(alpha, n_base, ns) + ms_t[:, 1:, :]
    return _lse_mid(jnp.concatenate([stay, move], axis=1))


def _bwd_step(n_base, ns, ms_t, beta):
    """beta_{t+1} -> beta_t (Log semiring)."""
    nsd = ns // n_base
    N = beta.shape[-1]
    # Mr[m, b, i, n] = ms_t[m*nb + b, 1 + i, n]
    Mr = ms_t[:, 1:, :].reshape(nsd, n_base, n_base, N)
    br = beta.reshape(nsd, n_base, N)           # [m, b, n]
    vals = Mr + br[:, :, None, :]
    m = jnp.max(vals, axis=1, keepdims=True)
    summed = (m + jnp.log(jnp.sum(jnp.exp(vals - m), axis=1,
                                  keepdims=True)))[:, 0]   # [m, i, n]
    move = jnp.transpose(summed, (1, 0, 2)).reshape(ns, N)  # k = i*nsd+m
    stay = ms_t[:, 0, :] + beta
    return _lse_mid(
        jnp.concatenate([stay[:, None], move[:, None]], axis=1))


def _fwd_kernel(n_base, ns, ms_ref, alphas_ref, alpha_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        alpha_ref[:] = jnp.zeros_like(alpha_ref)

    alpha = alpha_ref[:]                        # [ns, N]
    alphas_ref[0] = alpha                       # alpha_t (pre-transition)
    alpha_ref[:] = _fwd_step(n_base, ns, ms_ref[0], alpha)


def _bwd_kernel(n_base, ns, ms_ref, betas_ref, beta_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        beta_ref[:] = jnp.zeros_like(beta_ref)

    beta = beta_ref[:]                          # [ns, N]
    betas_ref[0] = beta                         # beta_{t+1}
    beta_ref[:] = _bwd_step(n_base, ns, ms_ref[0], beta)


def _bwd_kernel_unrolled(n_base, ns, unroll, ms_ref, betas_ref, beta0_ref,
                         beta_ref):
    """unroll timesteps per grid step on a (batch-tile, time) grid, time
    blocks addressed in reverse order by the index maps
    (betas_ref[u] = beta_{t_u + 1})."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        beta_ref[:] = jnp.zeros_like(beta_ref)

    beta = beta_ref[:]
    for u in reversed(range(unroll)):
        betas_ref[u] = beta
        beta = _bwd_step(n_base, ns, ms_ref[u], beta)
    beta_ref[:] = beta
    beta0_ref[:] = beta


def _viterbi_kernel(n_base, ns, ms_ref, alpha_ref, beta_ref, logz_ref,
                    ks_ref, v_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        v_ref[:] = jnp.zeros_like(v_ref)

    ms_t = ms_ref[0]                            # [ns, nb+1, N]
    alpha_t = alpha_ref[0]                      # [ns, N]
    beta_n = beta_ref[0]                        # [ns, N]
    logz = logz_ref[:]                          # [1, N]
    pred_a = _expand_pred_t(alpha_t, n_base, ns)
    edge = jnp.concatenate([alpha_t[:, None], pred_a], axis=1) + ms_t \
        + beta_n[:, None, :] - logz[:, None, :]
    s2 = jnp.log(jnp.exp(edge) + 1e-8)
    v = v_ref[:]
    stay = (v + s2[:, 0, :])[:, None]
    move = _expand_pred_t(v, n_base, ns) + s2[:, 1:, :]
    full = jnp.concatenate([stay, move], axis=1)  # [ns, nb+1, N]
    ks_ref[0] = jnp.argmax(full, axis=1).astype(jnp.int32)
    v_ref[:] = jnp.max(full, axis=1)


def _scan_call(kernel, MsT, extra_inputs=(), extra_specs=(),
               interpret=False):
    """Common pallas_call wrapper: grid over T, [ns(+K), N] blocks."""
    T, ns, nb1, N = MsT.shape
    in_specs = [pl.BlockSpec((1, ns, nb1, N), lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM)] + list(extra_specs)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, ns, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, N), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, ns, N), jnp.float32),
            jax.ShapeDtypeStruct((ns, N), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(MsT, *extra_inputs)


def _transpose_scores(scores, n_base, ns):
    T, N, C = scores.shape
    Ms = scores.reshape(T, N, ns, n_base + 1)
    return jnp.transpose(Ms, (0, 2, 3, 1)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_base", "state_len",
                                             "interpret"))
def forward_scan_pallas(scores, n_base: int, state_len: int,
                        interpret: bool = False):
    """[T, N, C] -> (alphas_T [T, ns, N] pre-transition, logZ [N])."""
    ns = n_base ** state_len
    MsT = _transpose_scores(scores, n_base, ns)
    alphas, alpha_T = _scan_call(
        functools.partial(_fwd_kernel, n_base, ns), MsT,
        interpret=interpret)
    logz = jax.nn.logsumexp(alpha_T, axis=0)
    return alphas, logz


@functools.partial(jax.jit, static_argnames=("n_base", "state_len",
                                             "interpret"))
def backward_scan_pallas(scores, n_base: int, state_len: int,
                         interpret: bool = False):
    """[T, N, C] -> betas_T [T, ns, N] where betas_T[t] == beta_{t+1}."""
    ns = n_base ** state_len
    MsT = _transpose_scores(scores, n_base, ns)
    betas_rev, _ = _scan_call(
        functools.partial(_bwd_kernel, n_base, ns),
        jnp.flip(MsT, axis=0), interpret=interpret)
    return jnp.flip(betas_rev, axis=0)


@functools.partial(jax.jit, static_argnames=("n_base", "state_len",
                                             "interpret"))
def decode_paths_pallas(scores, n_base: int, state_len: int,
                        interpret: bool = False):
    """Fused reference decode chain on TPU: scores -> labels [N, T].

    Bit-compatible with ops.crf.decode_paths (same per-step op order).
    Arbitrary batch sizes are handled by the kernels' own batch-tile
    grid dimension (each tile's carries live in per-tile VMEM scratch).
    """
    return _decode_paths_impl(scores, n_base, state_len, interpret)


def _fwd_viterbi_kernel(n_base, ns, n_blocks, unroll, ms_ref, beta_ref,
                        logz_ref, ks_ref, vfin_ref, alpha_ref, v_ref):
    """Fused forward scan + Viterbi: one pass over MsT instead of two.

    At each timestep the alpha scratch holds alpha_t (pre-transition), so
    the edge posteriors and the Viterbi step use exactly the values the
    separate kernels used — same op order, bit-compatible."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        alpha_ref[:] = jnp.zeros_like(alpha_ref)
        v_ref[:] = jnp.zeros_like(v_ref)

    alpha = alpha_ref[:]                        # [ns, BN] == alpha_t
    v = v_ref[:]
    logz = logz_ref[:]                          # [1, BN]
    for u in range(unroll):
        ms_t = ms_ref[u]                        # [ns, nb+1, BN]
        beta_n = beta_ref[u]                    # beta_{t+1}
        pred_a = _expand_pred_t(alpha, n_base, ns)
        edge = jnp.concatenate([alpha[:, None], pred_a], axis=1) + ms_t \
            + beta_n[:, None, :] - logz[:, None, :]
        s2 = jnp.log(jnp.exp(edge) + 1e-8)
        stay = (v + s2[:, 0, :])[:, None]
        move = _expand_pred_t(v, n_base, ns) + s2[:, 1:, :]
        full = jnp.concatenate([stay, move], axis=1)  # [ns, nb+1, BN]
        ks_ref[u] = jnp.argmax(full, axis=1).astype(jnp.int32)
        v = jnp.max(full, axis=1)
        # alpha_{t+1} (identical math to _fwd_kernel)
        stay_a = (alpha + ms_t[:, 0, :])[:, None]
        alpha = _lse_mid(
            jnp.concatenate([stay_a, pred_a + ms_t[:, 1:, :]], axis=1))
    alpha_ref[:] = alpha
    v_ref[:] = v

    @pl.when(t == n_blocks - 1)
    def _():
        vfin_ref[:] = v_ref[:]


def _traceback_kernel(ns, nsd, n_base, unroll, jinit_ref, ks_ref, lab_ref,
                      j_ref):
    """Viterbi traceback as a reverse-indexed Pallas scan.

    The per-step gather labels[t] = ks[t][j, n] is a one-hot
    select-and-reduce over the 216-state (sublane) axis — Mosaic has no
    per-lane dynamic gather, but a [ns, BN] masked sum is cheap VPU work.
    Replaces a 720-step XLA scan of tiny dynamic gathers (dispatch-bound).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        j_ref[:] = jinit_ref[:]

    j = j_ref[:]                                # [1, BN] int32
    N = j.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ns, N), 0)
    for u in reversed(range(unroll)):
        k_t = ks_ref[u]                         # [ns, BN] int32
        k = jnp.sum(jnp.where(rows == j, k_t, 0), axis=0)[None, :]
        lab_ref[u] = k[0]
        j = jnp.where(k == 0, j, (k - 1) * nsd + j // n_base)
    j_ref[:] = j


def _pick_tiles(T, N, per_step_per_n, fixed_per_n,
                budget=12 * 2 ** 20, candidates=(4, 3, 2, 1)):
    """(batch tile BN, time unroll U): largest BN <= 128 dividing N, then
    the largest U dividing T whose double-buffered blocks plus per-tile
    temporaries fit the scoped VMEM budget."""
    bn = next((b for b in (128, 96, 64, 48, 32, 16, 8) if N % b == 0), N)
    for u in candidates:
        if T % u == 0 and (2 * u * per_step_per_n + fixed_per_n) * bn \
                <= budget:
            return bn, u
    return bn, 1


def _decode_paths_impl(scores, n_base: int, state_len: int,
                       interpret: bool = False):
    """Two passes over the transposed score tensor (down from five
    streamings in the naive chain): one XLA transpose; a backward scan
    addressed in reverse through the grid index maps (no flip copies)
    that also yields logZ = logsumexp(beta_0) (alpha_0 == 0, so this is
    the same partition function the forward scan ends with); a fused
    forward+Viterbi pass that never materialises the alphas; and a
    Pallas traceback scan (one-hot gathers).  All scans run on a
    (batch-tile, time) grid with several timesteps per grid step to
    amortise the per-iteration overhead within the VMEM budget."""
    scores = scores.astype(jnp.float32)
    T, N, C = scores.shape
    ns = n_base ** state_len
    nsd = ns // n_base
    MsT = _transpose_scores(scores, n_base, ns)
    nb1 = n_base + 1

    # backward scan, reverse-indexed: betas[t] == beta_{t+1}
    # fixed: one [ns, nb, nb, BN] temp chain in _bwd_step (~3 live copies)
    BN, u_b = _pick_tiles(T, N, ns * (nb1 + 1) * 4, 4 * ns * nb1 * 4)
    nb_blocks = T // u_b
    nbt = N // BN
    betas, beta0 = pl.pallas_call(
        functools.partial(_bwd_kernel_unrolled, n_base, ns, u_b),
        grid=(nbt, nb_blocks),
        in_specs=[pl.BlockSpec((u_b, ns, nb1, BN),
                               lambda b, t: (nb_blocks - 1 - t, 0, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((u_b, ns, BN),
                         lambda b, t: (nb_blocks - 1 - t, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, BN), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, ns, N), jnp.float32),
            jax.ShapeDtypeStruct((ns, N), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((ns, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(MsT)
    logz_row = jax.nn.logsumexp(beta0, axis=0)[None, :]  # [1, N]

    # fused forward+Viterbi; fixed: edge/s2/full temps [ns, nb1, BN] plus
    # the two carry scratches
    BN, u_v = _pick_tiles(T, N, ns * (nb1 + 2) * 4,
                          (4 * ns * nb1 + 2 * ns) * 4)
    nv_blocks = T // u_v
    ks, v_final = pl.pallas_call(
        functools.partial(_fwd_viterbi_kernel, n_base, ns, nv_blocks, u_v),
        grid=(N // BN, nv_blocks),
        in_specs=[
            pl.BlockSpec((u_v, ns, nb1, BN), lambda b, t: (t, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u_v, ns, BN), lambda b, t: (t, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((u_v, ns, BN), lambda b, t: (t, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, BN), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, ns, N), jnp.int32),
            jax.ShapeDtypeStruct((ns, N), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ns, BN), jnp.float32),
            pltpu.VMEM((ns, BN), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(MsT, betas, logz_row)

    j_final = jnp.argmax(v_final, axis=0).astype(jnp.int32)[None, :]

    BN, u_t = _pick_tiles(T, N, ns * 4 + 4, 4 * ns * 4,
                          candidates=(16, 12, 8, 6, 4, 3, 2, 1))
    nt_blocks = T // u_t
    labels = pl.pallas_call(
        functools.partial(_traceback_kernel, ns, nsd, n_base, u_t),
        grid=(N // BN, nt_blocks),
        in_specs=[
            pl.BlockSpec((1, BN), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u_t, ns, BN),
                         lambda b, t: (nt_blocks - 1 - t, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((u_t, BN),
                               lambda b, t: (nt_blocks - 1 - t, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(j_final, ks)
    return labels.T.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Training path: edge posteriors (the logZ VJP) and the stay/move lattice.
#
# The CRF loss gradient is (full-CRF edge posteriors) - (scattered lattice
# edge posteriors); in XLA both recursions run as lax.scan with per-step
# relayouts that dominate the train step (~2s of a 2.2s step at flagship
# batch 128).  These kernels run the same recursions in the transposed
# [state, N] layout with the carry pinned in VMEM.


def _post_kernel(n_base, ns, ms_ref, alpha_ref, beta_ref, logz_ref,
                 post_ref):
    """exp(alpha_t[pred] + Ms_t + beta_{t+1} - logZ) for one timestep —
    the [ns, nb+1, N] block of d logZ / d scores."""
    ms_t = ms_ref[0]
    alpha_t = alpha_ref[0]
    beta_n = beta_ref[0]
    logz = logz_ref[:]
    pred_a = _expand_pred_t(alpha_t, n_base, ns)
    edge = jnp.concatenate([alpha_t[:, None], pred_a], axis=1) + ms_t \
        + beta_n[:, None, :] - logz[:, None, :]
    post_ref[0] = jnp.exp(edge)


@functools.partial(jax.jit, static_argnames=("n_base", "state_len",
                                             "interpret"))
def edge_posteriors_pallas(scores, n_base: int, state_len: int,
                           interpret: bool = False):
    """[T, N, C] -> edge posteriors [T, N, C] (gradient of logZ)."""
    scores = scores.astype(jnp.float32)
    T, N, C = scores.shape
    ns = n_base ** state_len
    MsT = _transpose_scores(scores, n_base, ns)
    alphas, logz = forward_scan_pallas(scores, n_base, state_len,
                                       interpret=interpret)
    betas = backward_scan_pallas(scores, n_base, state_len,
                                 interpret=interpret)
    post = pl.pallas_call(
        functools.partial(_post_kernel, n_base, ns),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, ns, n_base + 1, N), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ns, n_base + 1, N),
                               lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, ns, n_base + 1, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(MsT, alphas, betas, logz[None, :])
    return jnp.transpose(post, (0, 3, 1, 2)).reshape(T, N, C)


def _lat_fwd_kernel(ms_ref, alphas_ref, alpha_ref):
    """One lattice step: alpha'[j] = logaddexp(alpha[j] + stay[j],
    alpha[j-1] + move[j-1->j]).  ms_ref rows: [0]=stay_t, [1]=move_sh_t
    (pre-shifted so row j holds the move INTO j; row 0 = -inf)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        # alpha_0: position 0 = one(0), rest = zero(-inf)
        row = jax.lax.broadcasted_iota(jnp.int32, alpha_ref.shape, 0)
        alpha_ref[:] = jnp.where(row == 0, 0.0, _NEG).astype(
            alpha_ref.dtype)

    alpha = alpha_ref[:]                          # [npad, N]
    alphas_ref[0] = alpha
    stayed = alpha + ms_ref[0, 0]
    neg = jnp.full((1,) + alpha.shape[1:], _NEG, alpha.dtype)
    moved = jnp.concatenate([neg, alpha[:-1]], axis=0) + ms_ref[0, 1]
    alpha_ref[:] = jnp.logaddexp(stayed, moved)


def _lat_bwd_kernel(ms_ref, beta0_ref, betas_ref, beta_ref):
    """Reverse lattice step: beta[j] = logaddexp(stay[j] + beta'[j],
    move[j->j+1] + beta'[j+1]); move row layout as in _lat_fwd_kernel."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        beta_ref[:] = beta0_ref[:]

    beta = beta_ref[:]
    betas_ref[0] = beta
    stay_term = ms_ref[0, 0] + beta
    neg = jnp.full((1,) + beta.shape[1:], _NEG, beta.dtype)
    shifted = jnp.concatenate([(ms_ref[0, 1] + beta)[1:], neg], axis=0)
    beta_ref[:] = jnp.logaddexp(stay_term, shifted)


_NEG = -1e38


def _lat_pack(stay, move):
    """[T, N, n] stay / [T, N, n-1] move -> [T, 2, npad, N] with the move
    plane pre-shifted down one row (row j = move into position j)."""
    T, N, n = stay.shape
    npad = -(-n // 8) * 8
    stay_t = jnp.transpose(stay, (0, 2, 1))            # [T, n, N]
    move_t = jnp.transpose(move, (0, 2, 1))            # [T, n-1, N]
    stay_p = jnp.pad(stay_t, ((0, 0), (0, npad - n), (0, 0)))
    move_p = jnp.pad(move_t, ((0, 0), (1, npad - n), (0, 0)),
                     constant_values=_NEG)
    return jnp.stack([stay_p, move_p], axis=1), npad   # [T, 2, npad, N]


def _lat_scan(kernel, packed, extra_inputs=(), extra_specs=(),
              interpret=False):
    T, _, npad, N = packed.shape
    in_specs = [pl.BlockSpec((1, 2, npad, N), lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM)] + list(extra_specs)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, npad, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, N), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, npad, N), jnp.float32),
            jax.ShapeDtypeStruct((npad, N), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, *extra_inputs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ctc_lattice_logz_pallas(stay, move, lengths, interpret: bool = False):
    """Lattice partition function [T,N,n]x[T,N,n-1] -> [N]."""
    packed, npad = _lat_pack(stay.astype(jnp.float32),
                             move.astype(jnp.float32))
    _, alpha_T = _lat_scan(_lat_fwd_kernel, packed, interpret=interpret)
    idx = jnp.clip(lengths - 1, 0, stay.shape[2] - 1)
    return jnp.take_along_axis(alpha_T.T, idx[:, None], axis=1)[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ctc_lattice_grads_pallas(stay, move, lengths, ct,
                             interpret: bool = False):
    """(d_stay, d_move, logz): lattice edge posteriors scaled by ct.

    Same recursion pair as ops.crf._ctc_lattice_bwd, with both scans as
    Pallas kernels and the combine as one fused elementwise pass.
    """
    T, N, n = stay.shape
    packed, npad = _lat_pack(stay.astype(jnp.float32),
                             move.astype(jnp.float32))
    alphas, alpha_T = _lat_scan(_lat_fwd_kernel, packed,
                                interpret=interpret)
    idx = jnp.clip(lengths - 1, 0, n - 1)
    logz = jnp.take_along_axis(alpha_T.T, idx[:, None], axis=1)[:, 0]

    pos = jnp.arange(npad)[:, None]                     # [npad, 1]
    beta0 = jnp.where(pos == idx[None, :], 0.0, _NEG).astype(jnp.float32)
    betas_rev, _ = _lat_scan(
        _lat_bwd_kernel, jnp.flip(packed, axis=0), (beta0,),
        (pl.BlockSpec((npad, N), lambda t: (0, 0),
                      memory_space=pltpu.VMEM),),
        interpret=interpret)
    betas = jnp.flip(betas_rev, axis=0)                 # beta_{t+1} at [t]

    stay_T = packed[:, 0]                               # [T, npad, N]
    norm = ct[None, None, :]
    d_stay_T = jnp.exp(alphas + stay_T + betas
                       - logz[None, None, :]) * norm
    move_T = packed[:, 1]                               # row j = move into j
    d_move_sh = jnp.exp(
        jnp.concatenate([jnp.full((T, 1, N), _NEG), alphas[:, :-1]], 1)
        + move_T + betas - logz[None, None, :]) * norm
    d_stay = jnp.transpose(d_stay_T, (0, 2, 1))[:, :, :n]
    d_move = jnp.transpose(d_move_sh, (0, 2, 1))[:, :, 1:n]
    return d_stay, d_move, logz

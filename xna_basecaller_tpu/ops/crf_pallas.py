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


def _fwd_kernel(n_base, ns, ms_ref, alphas_ref, alpha_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        alpha_ref[:] = jnp.zeros_like(alpha_ref)

    alpha = alpha_ref[:]                        # [ns, N]
    alphas_ref[0] = alpha                       # alpha_t (pre-transition)
    ms_t = ms_ref[0]                            # [ns, nb+1, N]
    stay = (alpha + ms_t[:, 0, :])[:, None]
    move = _expand_pred_t(alpha, n_base, ns) + ms_t[:, 1:, :]
    alpha_ref[:] = _lse_mid(jnp.concatenate([stay, move], axis=1))


def _bwd_kernel(n_base, ns, ms_ref, betas_ref, beta_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        beta_ref[:] = jnp.zeros_like(beta_ref)

    beta = beta_ref[:]                          # [ns, N]
    betas_ref[0] = beta                         # beta_{t+1}
    ms_t = ms_ref[0]
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
    beta_ref[:] = _lse_mid(
        jnp.concatenate([stay[:, None], move[:, None]], axis=1))


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
    """
    scores = scores.astype(jnp.float32)
    T, N, C = scores.shape
    ns = n_base ** state_len
    nsd = ns // n_base
    MsT = _transpose_scores(scores, n_base, ns)
    alphas, logz = forward_scan_pallas(scores, n_base, state_len,
                                       interpret=interpret)
    betas = backward_scan_pallas(scores, n_base, state_len,
                                 interpret=interpret)
    logz_row = logz[None, :]  # [1, N]

    T_, ns_, nb1, N_ = MsT.shape
    ks, v_final = pl.pallas_call(
        functools.partial(_viterbi_kernel, n_base, ns),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, ns, nb1, N), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ns, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, N), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, ns, N), jnp.int32),
            jax.ShapeDtypeStruct((ns, N), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(MsT, alphas, betas, logz_row)

    j_final = jnp.argmax(v_final, axis=0).astype(jnp.int32)   # [N]
    batch_idx = jnp.arange(N)

    def back(j, k_t):
        # k_t [ns, N]; pick k_t[j_n, n] per batch element
        k = k_t[j, batch_idx]
        prev = jnp.where(k == 0, j, (k - 1) * nsd + j // n_base)
        return prev, k

    _, labels = jax.lax.scan(back, j_final, ks, reverse=True)
    return labels.T.astype(jnp.int32)

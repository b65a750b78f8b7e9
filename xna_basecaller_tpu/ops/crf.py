"""k-mer CTC-CRF sequence distribution, TPU-first (pure JAX oracle).

Re-implements the semantics of the reference CRF over the expanded alphabet
(reference: ub-bonito/bonito/crf/model.py:24-135 + the external ont-seqdist
CUDA kernels it calls).  Everything here is dense, static-shape JAX built from
reshape/broadcast (no gathers in the hot recursion), so XLA can fuse the
semiring scan; a Pallas kernel version lives in crf_pallas.py.

State space: k-mers over ``n_base`` real bases with ``state_len`` context
(6**3 = 216 states for NACGTXY).  Scores have shape [T, N, C] with
C = n_state * (n_base + 1); reshaped to [T, N, n_state, n_base+1] the last
axis is laid out as (new_state, dropped_base): column 0 is the stay
transition, column 1+i is the move into ``new_state`` that dropped base ``i``
out of the k-mer window (reference: crf/model.py:31-36 builds the same
structure as an index table).

Posteriors are the gradient of logZ w.r.t. the scores — the same autograd
identity the reference's seqdist library uses; with the Max semiring the
gradient is the one-hot Viterbi traceback (reference: crf/model.py:92-95).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LOG = "log"
MAX = "max"

_NEG_INF = -1e38  # finite "zero" of the log semiring; avoids inf-inf NaNs


def semiring_sum(x, axis, semiring: str):
    if semiring == LOG:
        return jax.nn.logsumexp(x, axis=axis)
    elif semiring == MAX:
        return jnp.max(x, axis=axis)
    raise ValueError(semiring)


def _expand_pred(alpha, n_base, n_state):
    """alpha[N, n_state] -> pred[N, n_state, n_base].

    pred[n, j, i] = alpha[n, i * n_state//n_base + j // n_base]: the score of
    the predecessor state of ``j`` whose dropped base is ``i``.  Pure
    reshape/broadcast — maps to lane shuffles on TPU, no gather.
    """
    N = alpha.shape[0]
    nsd = n_state // n_base
    a = alpha.reshape(N, n_base, nsd)
    a = jnp.broadcast_to(a[:, :, :, None], (N, n_base, nsd, n_base))
    return jnp.swapaxes(a.reshape(N, n_base, n_state), 1, 2)


def _logz_scan(scores, n_base: int, state_len: int, semiring: str = LOG):
    """Partition function via the forward scan (autodiff-able reference
    implementation; the public logz_fwd wraps it with an explicit-recursion
    custom VJP — see below)."""
    T, N, C = scores.shape
    ns = n_base ** state_len
    Ms = scores.reshape(T, N, ns, n_base + 1)
    alpha0 = jnp.zeros((N, ns), scores.dtype)  # S.one == 0 in log space

    def step(alpha, ms_t):
        stay = (alpha + ms_t[..., 0])[..., None]
        move = _expand_pred(alpha, n_base, ns) + ms_t[..., 1:]
        full = jnp.concatenate([stay, move], axis=-1)
        return semiring_sum(full, -1, semiring), None

    alpha_t, _ = jax.lax.scan(step, alpha0, Ms)
    return semiring_sum(alpha_t, -1, semiring)


def _pallas_log_path(semiring: str) -> bool:
    """Route the Log-semiring recursions through the Pallas kernels on TPU.

    Default ON: measured +11% on the flagship train step on v5e (2.64M ->
    2.93M samples/s alone, 3.01M composed with the bf16 cell residuals —
    results/train_variants_r04.json), with a ~11 s one-time compile cost
    through this environment's remote compile service (absorbed by the
    persistent compilation cache).  Opt out with XNACALL_PALLAS_LOSS=0 to
    fall back to the XLA scans (whose gather VJP already runs as a one-hot
    MXU matmul).  The kernels are interpret-mode tested either way."""
    if semiring != LOG:
        return False
    from xna_basecaller_tpu.utils.platform import env_flag, is_tpu
    if not env_flag("XNACALL_PALLAS_LOSS", True):
        return False
    return is_tpu()


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def logz_fwd(scores, n_base: int, state_len: int, semiring: str = LOG):
    """Partition function of the CRF: [T, N, C] -> [N].

    Mirrors seqdist.sparse.logZ as invoked at reference crf/model.py:41-46
    (alpha_0 = beta_T = semiring one for every state).

    Custom VJP (the same trick as the reference's seqdist CUDA autograd):
    instead of differentiating through the scan — which stores stacked
    residuals and falls off a severe performance cliff on TPU at batch
    >= 64 — the backward pass runs the explicit backward recursion and
    returns edge posteriors (Log) or the one-hot Viterbi traceback (Max).
    """
    return _logz_fwd_fwd(scores, n_base, state_len, semiring)[0]


def _logz_fwd_fwd(scores, n_base, state_len, semiring):
    if _pallas_log_path(semiring):
        from xna_basecaller_tpu.ops import crf_pallas
        _, logz = crf_pallas.forward_scan_pallas(
            scores.astype(jnp.float32), n_base, state_len)
        return logz, scores
    return _logz_scan(scores, n_base, state_len, semiring), scores


def _logz_fwd_bwd(n_base, state_len, semiring, scores, ct):
    if _pallas_log_path(semiring):
        from xna_basecaller_tpu.ops import crf_pallas
        post = crf_pallas.edge_posteriors_pallas(
            scores.astype(jnp.float32), n_base, state_len)
    elif semiring == LOG:
        post = _edge_posteriors(scores, n_base, state_len)
    else:
        post = _viterbi_onehot(scores, n_base, state_len)
    return (post * ct[None, :, None].astype(post.dtype),)


def _edge_posteriors(scores, n_base: int, state_len: int):
    """Log-semiring edge marginals, explicitly:
    P(t, j, k) = exp(alpha_t[pred(j,k)] + Ms[t,j,k] + beta_{t+1}[j] - logZ).
    Returns the [T, N, C] tensor (d logZ / d scores)."""
    T, N, C = scores.shape
    ns = n_base ** state_len
    Ms = scores.reshape(T, N, ns, n_base + 1)
    alphas = forward_scores(scores, n_base, state_len, LOG)    # [T+1,N,ns]
    betas = backward_scores(scores, n_base, state_len, LOG)    # [T+1,N,ns]
    logz = semiring_sum(alphas[-1], -1, LOG)                   # [N]
    a = alphas[:-1]
    pred = _expand_pred(
        a.reshape(T * N, ns), n_base, ns).reshape(T, N, ns, n_base)
    stay = a[..., None]                                        # k = 0
    edge = jnp.concatenate([stay, pred], axis=-1) + Ms \
        + betas[1:][..., None] - logz[None, :, None, None]
    return jnp.exp(edge).reshape(T, N, C)


def _viterbi_traceback(scores, n_base: int, state_len: int):
    """Explicit Max-semiring traceback.

    Returns (labels [T, N] in 0..n_base, states [T, N]): the column k and
    new-state j of the transition taken at each frame on the best path.
    """
    T, N, C = scores.shape
    ns = n_base ** state_len
    nsd = ns // n_base
    Ms = scores.reshape(T, N, ns, n_base + 1)
    alpha0 = jnp.zeros((N, ns), scores.dtype)

    def fwd(alpha, ms_t):
        stay = (alpha + ms_t[..., 0])[..., None]
        move = _expand_pred(alpha, n_base, ns) + ms_t[..., 1:]
        full = jnp.concatenate([stay, move], axis=-1)  # [N, ns, nb+1]
        k = jnp.argmax(full, axis=-1).astype(jnp.int32)
        return jnp.max(full, axis=-1), k

    alpha_t, ks = jax.lax.scan(fwd, alpha0, Ms)        # ks: [T, N, ns]
    j_final = jnp.argmax(alpha_t, axis=-1).astype(jnp.int32)  # [N]
    batch_idx = jnp.arange(N)

    def back(j, k_t):
        k = k_t[batch_idx, j]                          # [N]
        prev = jnp.where(k == 0, j, (k - 1) * nsd + j // n_base)
        return prev, (k, j)

    _, (labels, states) = jax.lax.scan(back, j_final, ks, reverse=True)
    return labels, states


def _viterbi_onehot(scores, n_base: int, state_len: int):
    """One-hot [T, N, C] marking the best path's transition per frame —
    the gradient of the Max-semiring logZ (what torch autograd produces
    for the reference's traceback, crf/model.py:92-95)."""
    T, N, C = scores.shape
    labels, states = _viterbi_traceback(scores, n_base, state_len)
    flat = states * (n_base + 1) + labels              # [T, N] in [0, C)
    return jax.nn.one_hot(flat, C, dtype=scores.dtype)


logz_fwd.defvjp(_logz_fwd_fwd, _logz_fwd_bwd)


@partial(jax.jit, static_argnames=("n_base", "state_len", "semiring"))
def forward_scores(scores, n_base: int, state_len: int, semiring: str = LOG):
    """All forward partials alpha_t: [T, N, C] -> [T+1, N, n_state].

    Mirrors seqdist.sparse.fwd_scores as invoked at crf/model.py:51-55.
    """
    T, N, C = scores.shape
    ns = n_base ** state_len
    Ms = scores.reshape(T, N, ns, n_base + 1)
    alpha0 = jnp.zeros((N, ns), scores.dtype)

    def step(alpha, ms_t):
        stay = (alpha + ms_t[..., 0])[..., None]
        move = _expand_pred(alpha, n_base, ns) + ms_t[..., 1:]
        new = semiring_sum(jnp.concatenate([stay, move], -1), -1, semiring)
        return new, new

    _, alphas = jax.lax.scan(step, alpha0, Ms)
    return jnp.concatenate([alpha0[None], alphas], axis=0)


def _bwd_step(beta, ms_t, n_base, ns, semiring):
    """One step of the backward recursion.

    beta_t[k] = S.sum over transitions out of k:
      stay:   Ms[t, k, 0] + beta_{t+1}[k]
      move b: Ms[t, (k % nsd)*n_base + b, 1 + k//nsd] + beta_{t+1}[...]
    """
    N = beta.shape[0]
    nsd = ns // n_base
    # Mr[n, m, b, i] = Ms[n, m*n_base + b, 1 + i]
    Mr = ms_t[..., 1:].reshape(N, nsd, n_base, n_base)
    br = beta.reshape(N, nsd, n_base)
    # out[n, i, m] = S.sum_b( Mr[n, m, b, i] + br[n, m, b] )
    summed = semiring_sum(Mr + br[..., None], axis=2, semiring=semiring)
    move = jnp.swapaxes(summed, 1, 2).reshape(N, ns)  # k = i*nsd + m
    stay = ms_t[..., 0] + beta
    return semiring_sum(jnp.stack([stay, move], -1), -1, semiring)


@partial(jax.jit, static_argnames=("n_base", "state_len", "semiring"))
def backward_scores(scores, n_base: int, state_len: int, semiring: str = LOG):
    """All backward partials beta_t: [T, N, C] -> [T+1, N, n_state].

    Mirrors seqdist.sparse.bwd_scores as invoked at crf/model.py:57-61.
    """
    T, N, C = scores.shape
    ns = n_base ** state_len
    Ms = scores.reshape(T, N, ns, n_base + 1)
    betaT = jnp.zeros((N, ns), scores.dtype)

    def step(beta, ms_t):
        new = _bwd_step(beta, ms_t, n_base, ns, semiring)
        return new, new

    _, betas = jax.lax.scan(step, betaT, Ms, reverse=True)
    return jnp.concatenate([betas, betaT[None]], axis=0)


@partial(jax.jit, static_argnames=("n_base", "state_len", "semiring"))
def posteriors(scores, n_base: int, state_len: int, semiring: str = LOG):
    """Posterior transition probabilities: gradient of logZ wrt scores.

    For the Log semiring these are edge marginals; for Max, the one-hot
    Viterbi traceback (the identity seqdist relies on; used by the reference
    at crf/model.py:92-95 and 215-218).
    """
    def f(s):
        return logz_fwd(s, n_base, state_len, semiring).sum()
    return jax.grad(f)(scores)


@partial(jax.jit, static_argnames=("n_base", "state_len"))
def compute_transition_probs(scores, n_base: int, state_len: int):
    """Per-frame transition posteriors + initial-state posteriors.

    Mirrors the reference CTC_CRF.compute_transition_probs
    (crf/model.py:63-76), the score form consumed by the duplex pair
    decode (cli/duplex.py:219-228): edge scores plus backward partials,
    re-laid-out from (new_state, dropped_base) to (old_state,
    emitted_base), softmax-normalised per old state over the n_base+1
    choices {stay, emit b}.  Returns
    (trans [T, N, n_state, n_base+1], init [N, n_state]).
    """
    scores = scores.astype(jnp.float32)
    T, N, C = scores.shape
    ns = n_base ** state_len
    betas = backward_scores(scores, n_base, state_len, LOG)
    lt = scores.reshape(T, N, ns, n_base + 1) + betas[1:, :, :, None]
    # (new_state s, dropped d) -> (old_state d*ns/nb + s//nb, emitted s%nb)
    moves = jnp.swapaxes(lt[..., 1:], 3, 2).reshape(T, N, ns, n_base)
    lt = jnp.concatenate([lt[..., :1], moves], axis=-1)
    return jax.nn.softmax(lt, axis=-1), jax.nn.softmax(betas[0], axis=-1)


@partial(jax.jit, static_argnames=("n_base", "state_len"))
def viterbi_path(scores, n_base: int, state_len: int):
    """Most-likely per-frame labels: [T, N, C] -> [T, N] ints in [0, n_base].

    Replicates reference crf/model.py:92-95 (argmax over C of the
    Max-semiring traceback, modulo n_base+1) via the explicit traceback:
    the chosen transition's column IS that argmax-mod.  Label 0 is
    stay/blank; label k>=1 is alphabet[k] in the (new_state, dropped_base)
    layout.
    """
    labels, _ = _viterbi_traceback(scores, n_base, state_len)
    return labels


@partial(jax.jit, static_argnames=("n_base", "state_len"))
def decode_paths(scores, n_base: int, state_len: int):
    """Full reference decode chain: scores -> per-frame labels [N, T].

    Replicates SeqdistModel.decode_batch (reference crf/model.py:215-218):
    Log-semiring posteriors, + 1e-8, log, then Viterbi on the re-logged
    posteriors.  Runs in float32 (the reference CPU parity path).

    Fused implementation: the posterior edge scores are computed inside
    the Viterbi scan from the forward/backward partials — the [T, N, C]
    posterior tensor (and its log) are never materialised, saving several
    full HBM passes per batch.  The per-step math (exp then +1e-8 then
    log) matches the compositional path bit-for-bit.
    """
    scores = scores.astype(jnp.float32)
    T, N, C = scores.shape
    ns = n_base ** state_len
    nsd = ns // n_base
    Ms = scores.reshape(T, N, ns, n_base + 1)
    alphas = forward_scores(scores, n_base, state_len, LOG)   # [T+1,N,ns]
    betas = backward_scores(scores, n_base, state_len, LOG)   # [T+1,N,ns]
    logz = semiring_sum(alphas[-1], -1, LOG)                  # [N]

    v0 = jnp.zeros((N, ns), jnp.float32)

    def vstep(v, inp):
        ms_t, alpha_t, beta_n = inp
        pred_a = _expand_pred(alpha_t, n_base, ns)            # [N,ns,nb]
        edge = jnp.concatenate([alpha_t[..., None], pred_a], -1) + ms_t \
            + beta_n[..., None] - logz[:, None, None]
        s2 = jnp.log(jnp.exp(edge) + 1e-8)
        stay = (v + s2[..., 0])[..., None]
        move = _expand_pred(v, n_base, ns) + s2[..., 1:]
        full = jnp.concatenate([stay, move], axis=-1)
        k = jnp.argmax(full, axis=-1).astype(jnp.int32)
        return jnp.max(full, axis=-1), k

    v_final, ks = jax.lax.scan(vstep, v0, (Ms, alphas[:-1], betas[1:]))
    j_final = jnp.argmax(v_final, axis=-1).astype(jnp.int32)
    batch_idx = jnp.arange(N)

    def back(j, k_t):
        k = k_t[batch_idx, j]
        prev = jnp.where(k == 0, j, (k - 1) * nsd + j // n_base)
        return prev, k

    _, labels = jax.lax.scan(back, j_final, ks, reverse=True)
    return labels.T.astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_base", "state_len"))
def normalise(scores, n_base: int, state_len: int):
    """Globally normalise scores so logZ == 0 (reference crf/model.py:48-49)."""
    T = scores.shape[0]
    lz = logz_fwd(scores, n_base, state_len, LOG)
    return scores - (lz / T)[None, :, None]


def _gather_cols_matmul(scores, idx):
    """One-hot-matmul formulation of the per-sample column gather:
    stay_move[t,n,j] = sum_c scores[t,n,c] * [idx[n,j] == c].

    Exact (each row of the one-hot has a single 1.0), and its autodiff
    transpose is the reverse einsum — also a matmul.  On TPU this runs on
    the MXU in a few ms, whereas XLA lowers both take_along_axis over the
    score columns AND its scatter-add transpose to serialised custom
    fusions sustaining ~1.3 GB/s (~1.1s each at flagship shapes — they
    dominated the whole train step)."""
    C = scores.shape[2]
    onehot = (idx[:, :, None] == jnp.arange(C)[None, None, :]
              ).astype(scores.dtype)                      # [N, n, C]
    return jnp.einsum("tnc,njc->tnj", scores, onehot,
                      preferred_element_type=jnp.float32
                      ).astype(scores.dtype)


def _gather_cols(scores, idx):
    """scores [T, N, C], idx [N, n] -> [T, N, n]; MXU matmul on TPU,
    plain gather elsewhere (the matmul is O(T*N*n*C) FLOPs — free on the
    MXU, wasteful on CPU)."""
    from xna_basecaller_tpu.utils.platform import is_tpu
    if is_tpu():
        return _gather_cols_matmul(scores, idx)
    T, N, n = scores.shape[0], idx.shape[0], idx.shape[1]
    return jnp.take_along_axis(
        scores, jnp.broadcast_to(idx[None], (T, N, n)), axis=2)


def prepare_ctc_scores(scores, targets, n_base: int, state_len: int):
    """Gather stay/move lattice scores for target sequences.

    Replicates reference crf/model.py:102-116: targets are CTC codes
    (blank=0, bases 1..n_base) of shape [N, L]; returns stay [T, N, n] and
    move [T, N, n-1] with n = L - (state_len - 1).
    """
    T, N, C = scores.shape
    zt = jnp.clip(targets - 1, 0, None)
    L = targets.shape[1]
    n = L - (state_len - 1)
    stay_state = sum(
        zt[:, i:n + i] * (n_base ** (state_len - i - 1))
        for i in range(state_len)
    )
    stay_idx = stay_state * (n_base + 1)           # [N, n]
    move_idx = stay_idx[:, 1:] + zt[:, : n - 1] + 1  # [N, n-1]
    # one fused gather (and one one-hot matmul on the way back)
    both = _gather_cols(scores,
                        jnp.concatenate([stay_idx, move_idx], axis=1))
    return both[:, :, :n], both[:, :, n:]


def _ctc_step(alpha, stay_t, move_t, semiring):
    # Positions beyond a sample's length-1 never flow back into the
    # read-out position, so no per-sample masking is needed.
    stayed = alpha + stay_t
    moved = alpha[:, :-1] + move_t
    upper = semiring_sum(
        jnp.stack([stayed[:, 1:], moved], -1), -1, semiring)
    return jnp.concatenate([stayed[:, :1], upper], axis=1)


@partial(jax.jit, static_argnames=("semiring",))
def ctc_lattice_logz(stay, move, lengths, semiring: str = LOG):
    """logZ of the stay/move CTC alignment lattice.

    Equivalent of seqdist.ctc_simple.logZ_cupy as invoked at reference
    crf/model.py:122: paths start at k-mer position 0, each frame either
    stays or advances one position, and must end at position length-1.
    """
    T, N, n = stay.shape
    if _pallas_log_path(semiring):
        from xna_basecaller_tpu.ops import crf_pallas
        return crf_pallas.ctc_lattice_logz_pallas(stay, move, lengths)
    alpha = jnp.full((N, n), _NEG_INF, stay.dtype).at[:, 0].set(0.0)

    def step(alpha, inp):
        return _ctc_step(alpha, *inp, semiring), None

    alpha_t, _ = jax.lax.scan(step, alpha, (stay, move))
    idx = jnp.clip(lengths - 1, 0, n - 1)[:, None]
    return jnp.take_along_axis(alpha_t, idx, axis=1)[:, 0]


@jax.custom_vjp
def ctc_lattice_logz_grad(stay, move, lengths):
    """Log-semiring lattice logZ with an explicit-recursion VJP.

    The gradients w.r.t. stay/move scores are the lattice edge posteriors —
    computed by a backward scan instead of differentiating through the
    forward scan (same rationale as logz_fwd's custom VJP).
    """
    return ctc_lattice_logz(stay, move, lengths, LOG)


def _ctc_lattice_fwd(stay, move, lengths):
    return ctc_lattice_logz(stay, move, lengths, LOG), (stay, move, lengths)


def _ctc_lattice_bwd(res, ct):
    stay, move, lengths = res
    T, N, n = stay.shape
    if _pallas_log_path(LOG):
        from xna_basecaller_tpu.ops import crf_pallas
        d_stay, d_move, _ = crf_pallas.ctc_lattice_grads_pallas(
            stay, move, lengths, ct)
        return (d_stay.astype(stay.dtype), d_move.astype(move.dtype),
                np.zeros(lengths.shape, dtype=jax.dtypes.float0))
    # forward partials
    alpha0 = jnp.full((N, n), _NEG_INF, stay.dtype).at[:, 0].set(0.0)

    def fstep(alpha, inp):
        new = _ctc_step(alpha, *inp, LOG)
        return new, alpha  # store alpha_t (pre-transition)

    alpha_T, alphas = jax.lax.scan(fstep, alpha0, (stay, move))
    idx = jnp.clip(lengths - 1, 0, n - 1)[:, None]
    logz = jnp.take_along_axis(alpha_T, idx, axis=1)[:, 0]

    # backward partials: beta_T[l] = 0 iff l == length-1
    pos = jnp.arange(n)[None, :]
    betaT = jnp.where(pos == (lengths - 1)[:, None], 0.0, _NEG_INF
                      ).astype(stay.dtype)

    def bstep(beta, inp):
        stay_t, move_t = inp
        stay_term = stay_t + beta
        move_term = move_t + beta[:, 1:]
        new = jnp.concatenate([
            jnp.logaddexp(stay_term[:, :-1], move_term),
            stay_term[:, -1:],
        ], axis=1)
        return new, beta  # store beta_{t+1}

    _, betas = jax.lax.scan(bstep, betaT, (stay, move), reverse=True)

    norm = ct[None, :, None]
    d_stay = jnp.exp(alphas + stay + betas - logz[None, :, None]) * norm
    d_move = jnp.exp(alphas[:, :, :-1] + move + betas[:, :, 1:]
                     - logz[None, :, None]) * norm
    return (d_stay.astype(stay.dtype), d_move.astype(move.dtype),
            np.zeros(lengths.shape, dtype=jax.dtypes.float0))


ctc_lattice_logz_grad.defvjp(_ctc_lattice_fwd, _ctc_lattice_bwd)


@partial(jax.jit, static_argnames=("n_base", "state_len", "loss_clip",
                                   "reduction", "normalise_scores"))
def ctc_loss(scores, targets, target_lengths, n_base: int, state_len: int,
             loss_clip: float | None = None, reduction: str = "mean",
             normalise_scores: bool = True):
    """CTC-CRF loss: -(logZ_ctc - logZ_full) / target_length.

    Replicates reference crf/model.py:118-131.  ``scores`` [T, N, C] float32;
    ``targets`` [N, L] CTC codes; ``target_lengths`` [N].
    """
    scores = scores.astype(jnp.float32)
    if normalise_scores:
        scores = normalise(scores, n_base, state_len)
    stay, move = prepare_ctc_scores(scores, targets, n_base, state_len)
    logz = ctc_lattice_logz_grad(stay, move, target_lengths + 1 - state_len)
    loss = -(logz / target_lengths)
    if loss_clip:
        loss = jnp.clip(loss, 0.0, loss_clip)
    if reduction == "mean":
        return loss.mean()
    elif reduction in ("none", None):
        return loss
    raise ValueError(f"Unknown reduction type {reduction}")


@partial(jax.jit, static_argnames=("n_base", "state_len"))
def reverse_complement(scores, n_base: int, state_len: int):
    """Reverse-complement a score tensor for R-strand decoding.

    Exact transcription of reference crf/model.py:78-90 into jnp: reverses
    time, reverses k-mer base order within each state, and complements via
    index flips (base i -> n_base-1-i composes with the flip on the state
    axes and the emission axis).
    """
    T, N, C = scores.shape
    expand = (T, N) + (n_base,) * state_len + (n_base + 1,)
    s = scores.reshape(expand)
    blanks = jnp.flip(
        jnp.transpose(
            s[..., 0], (0, 1) + tuple(range(state_len + 1, 1, -1))
        ).reshape(T, N, -1, 1),
        axis=(0, 2),
    )
    emissions = jnp.flip(
        jnp.transpose(
            s[..., 1:],
            (0, 1) + tuple(range(state_len, 1, -1))
            + (state_len + 2, state_len + 1),
        ).reshape(T, N, -1, n_base),
        axis=(0, 2, 3),
    )
    return jnp.concatenate([blanks, emissions], axis=-1).reshape(T, N, -1)


@partial(jax.jit, static_argnames=())
def ctc_viterbi_alignments(stay, move, lengths):
    """Most-likely alignment through the stay/move lattice.

    Equivalent of seqdist.ctc_simple.viterbi_alignments as invoked at
    reference crf/model.py:133-135: returns a one-hot [T, N, n] tensor
    marking the occupied k-mer position at each frame on the best path.
    """
    T, N, n = stay.shape
    alpha = jnp.full((N, n), _NEG_INF, stay.dtype).at[:, 0].set(0.0)

    def fstep(alpha, inp):
        stay_t, move_t = inp
        stayed = alpha + stay_t
        moved = alpha[:, :-1] + move_t
        took_move = moved > stayed[:, 1:]
        upper = jnp.where(took_move, moved, stayed[:, 1:])
        new = jnp.concatenate([stayed[:, :1], upper], axis=1)
        return new, took_move

    alpha_T, took = jax.lax.scan(fstep, alpha, (stay, move))
    idx = jnp.clip(lengths - 1, 0, n - 1)
    batch = jnp.arange(N)

    def bstep(pos, took_t):
        moved = jnp.where(pos > 0, took_t[batch, jnp.maximum(pos - 1, 0)],
                          False)
        prev = jnp.where(moved, pos - 1, pos)
        return prev, pos

    _, positions = jax.lax.scan(bstep, idx, took, reverse=True)  # [T, N]
    return jax.nn.one_hot(positions, n, dtype=stay.dtype)


# Rolling-hash multipliers for beam identity (two independent 32-bit
# streams; a collision needs both to collide simultaneously).
_HASH_P1 = np.uint32(1000003)
_HASH_P2 = np.uint32(2654435761)


def _beam_merge_topk(state, h1, h2, score, beam_width):
    """Collapse candidates with identical (sequence-hash, state) identity by
    log-sum-exp, then keep the top ``beam_width``.

    Candidate counts are small (beam_width * (n_base+1)), so the merge is a
    dense pairwise-equality matrix — vectorised, fixed-shape, TPU-friendly.
    Returns (top_idx, merged_scores_at_top): indices into the candidate
    arrays plus the merged scores.
    """
    same = ((h1[:, None] == h1[None, :])
            & (h2[:, None] == h2[None, :])
            & (state[:, None] == state[None, :]))           # [M, M]
    merged = semiring_sum(
        jnp.where(same, score[None, :], _NEG_INF), -1, LOG)  # [M]
    # keep only the first occurrence of each identity class
    m = score.shape[0]
    idx = jnp.arange(m)
    first = jnp.min(jnp.where(same, idx[None, :], m), axis=1)
    merged = jnp.where(first == idx, merged, _NEG_INF)
    top_score, top_idx = jax.lax.top_k(merged, beam_width)
    return top_idx, top_score


@partial(jax.jit, static_argnames=("n_base", "state_len", "beam_width"))
def decode_beam(scores, n_base: int, state_len: int, beam_width: int = 8):
    """Path-collapsing beam search over the CRF posterior lattice:
    [T, N, C] -> per-frame labels [N, T] (0 = stay).

    The reference's 4-base decode uses koi's closed CUDA beam search
    (crf/basecall.py:43-46); koi has no 6-base variant, so the reference UB
    path falls back to single-path Viterbi (crf/model.py:215-218).  This is
    the TPU-native beam equivalent: beams are (emitted-sequence, k-mer
    state) classes, and paths that emit the same base sequence from the
    same state — i.e. the same call with different stay/move timing — are
    merged by log-sum-exp, so the winning beam maximises the SEQUENCE
    posterior rather than the single-alignment posterior.  At the end,
    beams are merged across states by sequence alone.

    Works on the same edge log-posteriors the Viterbi decode scans
    (alpha + score + beta - logZ), so beam_width=1 degenerates to greedy
    posterior following and large widths approach the exact max-sequence
    decode.  Labels are placed at their move frame, so the output drops
    into the same frame-accurate stitching as ``decode_paths``.
    """
    scores = scores.astype(jnp.float32)
    T, N, C = scores.shape
    ns = n_base ** state_len
    nsd = ns // n_base
    nb1 = n_base + 1
    Ms = scores.reshape(T, N, ns, nb1)
    alphas = forward_scores(scores, n_base, state_len, LOG)   # [T+1,N,ns]
    betas = backward_scores(scores, n_base, state_len, LOG)   # [T+1,N,ns]
    logz = semiring_sum(alphas[-1], -1, LOG)

    def edge_t(ms_t, alpha_t, beta_n):
        pred_a = _expand_pred(alpha_t, n_base, ns)
        return (jnp.concatenate([alpha_t[..., None], pred_a], -1) + ms_t
                + beta_n[..., None] - logz[:, None, None])   # [N,ns,nb1]

    # ---- t = 0: every (state, column) pair is a distinct beam identity
    e0 = edge_t(Ms[0], alphas[0], betas[1]).reshape(N, ns * nb1)
    if e0.shape[1] < beam_width:
        e0 = jnp.pad(e0, ((0, 0), (0, beam_width - e0.shape[1])),
                     constant_values=_NEG_INF)
    score0, idx0 = jax.lax.top_k(e0, beam_width)              # [N,B]
    idx0 = jnp.minimum(idx0, ns * nb1 - 1)
    label0 = (idx0 % nb1).astype(jnp.int32)
    state0 = (idx0 // nb1).astype(jnp.int32)
    h0 = label0.astype(jnp.uint32)

    def beam_step(carry, inp):
        state, h1, h2, score = carry                          # [N,B] each
        ms_t, alpha_t, beta_n = inp
        s2 = edge_t(ms_t, alpha_t, beta_n)                    # [N,ns,nb1]

        def one(state_b, h1_b, h2_b, score_b, s2_n):
            B = state_b.shape[0]
            dropped = state_b // nsd                          # [B]
            lab_mv = (dropped + 1).astype(jnp.int32)
            # stay: same identity, same state
            stay_sc = score_b + s2_n[state_b, 0]
            # moves: append base b2; emitted label is the dropped base + 1
            new_st = ((state_b % nsd)[:, None] * n_base
                      + jnp.arange(n_base)[None, :])          # [B,nb]
            mv_sc = score_b[:, None] + s2_n[new_st, 1 + dropped[:, None]]
            h1_mv = h1_b * _HASH_P1 + lab_mv.astype(jnp.uint32)
            h2_mv = h2_b * _HASH_P2 + lab_mv.astype(jnp.uint32)

            def cat(a_stay, a_mv):
                a_mv = jnp.broadcast_to(
                    a_mv.reshape(B, -1), (B, n_base))
                return jnp.concatenate(
                    [a_stay[:, None], a_mv], 1).reshape(-1)

            c_state = jnp.concatenate([state_b[:, None], new_st],
                                      1).reshape(-1)
            c_score = jnp.concatenate([stay_sc[:, None], mv_sc],
                                      1).reshape(-1)
            c_h1 = cat(h1_b, h1_mv[:, None])
            c_h2 = cat(h2_b, h2_mv[:, None])
            c_label = cat(jnp.zeros((B,), jnp.int32), lab_mv[:, None])
            c_parent = jnp.repeat(jnp.arange(B, dtype=jnp.int32), nb1)
            top, top_sc = _beam_merge_topk(
                c_state, c_h1, c_h2, c_score, B)
            return (c_state[top], c_h1[top], c_h2[top], top_sc,
                    c_parent[top], c_label[top])

        st, nh1, nh2, sc, parent, label = jax.vmap(one)(
            state, h1, h2, score, s2)
        return (st, nh1, nh2, sc), (parent, label)

    carry0 = (state0, h0, h0, score0)
    (stateT, h1T, h2T, scoreT), (parents, labels) = jax.lax.scan(
        beam_step, carry0, (Ms[1:], alphas[1:-1], betas[2:]))

    # ---- final: merge beams across states by sequence hash alone
    def pick_best(h1_b, h2_b, score_b):
        same = (h1_b[:, None] == h1_b[None, :]) & \
               (h2_b[:, None] == h2_b[None, :])
        merged = semiring_sum(
            jnp.where(same, score_b[None, :], _NEG_INF), -1, LOG)
        return jnp.argmax(merged).astype(jnp.int32), jnp.max(merged)

    best, best_score = jax.vmap(pick_best)(h1T, h2T, scoreT)

    def traceback(best_n, parents_n, labels_n, label0_n):
        def back(cur, pl):
            parent_t, label_t = pl
            return parent_t[cur], label_t[cur]
        cur, labs = jax.lax.scan(back, best_n, (parents_n, labels_n),
                                 reverse=True)                # [T-1]
        return jnp.concatenate([label0_n[cur][None], labs])

    out = jax.vmap(traceback, in_axes=(0, 1, 1, 0))(
        best, parents, labels, label0)                        # [N,T]
    return out.astype(jnp.int32), best_score


@dataclass(frozen=True)
class CTCCRF:
    """Convenience bundle mirroring the reference CTC_CRF object
    (crf/model.py:24) with alphabet bookkeeping."""

    state_len: int
    alphabet: str

    @property
    def n_base(self) -> int:
        return len(self.alphabet) - 1

    @property
    def n_state(self) -> int:
        return self.n_base ** self.state_len

    @property
    def n_score(self) -> int:
        return len(self.alphabet) * self.n_state

    def logZ(self, scores, semiring: str = LOG):
        return logz_fwd(scores, self.n_base, self.state_len, semiring)

    def normalise(self, scores):
        return normalise(scores, self.n_base, self.state_len)

    def posteriors(self, scores, semiring: str = LOG):
        return posteriors(scores, self.n_base, self.state_len, semiring)

    def viterbi(self, scores):
        return viterbi_path(scores, self.n_base, self.state_len)

    def decode_batch(self, scores) -> list[str]:
        paths = np.asarray(decode_paths(scores, self.n_base, self.state_len))
        return [self.path_to_str(p) for p in paths]

    def decode_beam_batch(self, scores, beam_width: int = 8) -> list[str]:
        paths, _ = decode_beam(scores, self.n_base, self.state_len,
                               beam_width)
        return [self.path_to_str(p) for p in np.asarray(paths)]

    def path_to_str(self, path) -> str:
        alpha = np.frombuffer("".join(self.alphabet).encode(), dtype="u1")
        path = np.asarray(path)
        return alpha[path[path != 0]].tobytes().decode()

    def ctc_loss(self, scores, targets, target_lengths, **kw):
        return ctc_loss(scores, targets, target_lengths,
                        self.n_base, self.state_len, **kw)

    def reverse_complement(self, scores):
        return reverse_complement(scores, self.n_base, self.state_len)

    def ctc_viterbi_alignments(self, scores, targets, target_lengths):
        """Reference crf/model.py:133-135."""
        stay, move = prepare_ctc_scores(
            scores, targets, self.n_base, self.state_len)
        return ctc_viterbi_alignments(
            stay, move, target_lengths + 1 - self.state_len)


@partial(jax.jit, static_argnames=("n_base", "state_len"))
def decode_paths_with_qual(scores, n_base: int, state_len: int):
    """Decode chain returning per-frame labels AND the posterior
    probability of each chosen transition: ([N, T] int32, [N, T] f32).

    The reference's UB path emits dummy qualities (crf/basecall.py:67);
    here the Log-semiring edge posterior of the Viterbi-selected
    transition gives a real per-base confidence.

    Calibration note: edge posteriors split probability mass over the
    exact transition FRAME (a confident base whose move could land on
    adjacent frames still gets p ~ 0.3-0.6), so these qualities are
    conservative — monotone in confidence but not calibrated phred.
    Window-aggregated calibration is future work.
    """
    scores = scores.astype(jnp.float32)
    T, N, C = scores.shape
    ns = n_base ** state_len
    nsd = ns // n_base
    Ms = scores.reshape(T, N, ns, n_base + 1)
    alphas = forward_scores(scores, n_base, state_len, LOG)
    betas = backward_scores(scores, n_base, state_len, LOG)
    logz = semiring_sum(alphas[-1], -1, LOG)

    v0 = jnp.zeros((N, ns), jnp.float32)

    def vstep(v, inp):
        ms_t, alpha_t, beta_n = inp
        pred_a = _expand_pred(alpha_t, n_base, ns)
        edge = jnp.concatenate([alpha_t[..., None], pred_a], -1) + ms_t \
            + beta_n[..., None] - logz[:, None, None]
        s2 = jnp.log(jnp.exp(edge) + 1e-8)
        stay = (v + s2[..., 0])[..., None]
        move = _expand_pred(v, n_base, ns) + s2[..., 1:]
        full = jnp.concatenate([stay, move], axis=-1)
        k = jnp.argmax(full, axis=-1).astype(jnp.int32)
        return jnp.max(full, axis=-1), (k, edge)

    v_final, (ks, edges) = jax.lax.scan(
        vstep, v0, (Ms, alphas[:-1], betas[1:]))
    j_final = jnp.argmax(v_final, axis=-1).astype(jnp.int32)
    batch_idx = jnp.arange(N)

    def back(j, inp):
        k_t, edge_t = inp
        k = k_t[batch_idx, j]
        p = jnp.exp(edge_t[batch_idx, j, k])
        prev = jnp.where(k == 0, j, (k - 1) * nsd + j // n_base)
        return prev, (k, p)

    _, (labels, probs) = jax.lax.scan(back, j_final, (ks, edges),
                                      reverse=True)
    return labels.T.astype(jnp.int32), probs.T

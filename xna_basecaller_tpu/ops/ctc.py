"""Plain CTC ops for the legacy QuartzNet model family.

TPU-first re-design of the reference CTC path (reference: ub-bonito/bonito/
ctc/model.py:39-54 — torch.nn.functional.ctc_loss + fast_ctc_decode
viterbi_search/beam_search):

* ``ctc_loss_logz``: the standard interleaved-blank forward recursion as a
  dense ``lax.scan`` over time with a [N, 2L+1] alpha carry.  The per-state
  emission gather (log_probs[t, n, ext[n, s]]) is formulated as a one-hot
  matmul so it runs on the MXU instead of lowering to the serialised TPU
  gather fusions (same trick as ops/crf.py::_gather_cols_matmul); its
  autodiff transpose is the reverse einsum — also a matmul.
* ``greedy_paths``: per-frame argmax decode on device (without transition
  scores the CTC Viterbi path IS the per-frame argmax).  Collapse to
  sequence + qstring happens on host (``collapse_path``) with vectorised
  numpy — it is O(T) bookkeeping, not FLOPs.
* ``beam_search``: prefix beam search on host over one read's posteriors —
  the fast-ctc-decode equivalent (native C++ via utils.native, with this
  module's pure-python fallback defining the semantics).

Blank is class 0 everywhere, matching the reference alphabet "NACGT..."
where N is the blank label (ctc/model.py:31 via config labels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _extended_targets(targets):
    """targets [N, L] (labels >= 1, 0-padded) -> ext [N, 2L+1] with blanks
    interleaved: [0, t0, 0, t1, 0, ..., 0]."""
    N, L = targets.shape
    ext = jnp.zeros((N, 2 * L + 1), targets.dtype)
    return ext.at[:, 1::2].set(targets)


def ctc_loss_logz(log_probs, targets, target_lengths):
    """Log-likelihood of each target under the CTC lattice.

    log_probs: [T, N, C] log-softmax scores (class 0 = blank)
    targets:   [N, L] int labels in 1..C-1, zero-padded
    target_lengths: [N] true target lengths (<= L)
    Returns [N] logZ (so the loss is ``-logZ``).
    """
    T, N, C = log_probs.shape
    ext = _extended_targets(targets)                      # [N, S]
    S = ext.shape[1]

    # Emission table via one-hot matmul: emit[t, n, s] = log_probs[t, n,
    # ext[n, s]].  MXU-friendly; the take_along_axis formulation lowers to
    # a ~1 GB/s serialised fusion on TPU (see ops/crf.py).
    onehot = (ext[:, :, None] == jnp.arange(C)[None, None, :]
              ).astype(log_probs.dtype)                   # [N, S, C]
    emit = jnp.einsum("tnc,nsc->tns", log_probs, onehot,
                      preferred_element_type=jnp.float32) # [T, N, S]

    # skip transition (s-2 -> s) allowed only into a non-blank state whose
    # label differs from the state two back (standard CTC rule)
    prev2 = jnp.pad(ext[:, :-2], ((0, 0), (2, 0)), constant_values=-1)
    allow_skip = (ext != 0) & (ext != prev2)              # [N, S]

    s_idx = jnp.arange(S)
    alpha0 = jnp.where(s_idx[None, :] < 2, emit[0], NEG_INF)

    def shift(a, k):
        return jnp.pad(a[:, :-k], ((0, 0), (k, 0)), constant_values=NEG_INF)

    def step(alpha, e):
        stay = alpha
        diag = shift(alpha, 1)
        skip = jnp.where(allow_skip, shift(alpha, 2), NEG_INF)
        m = jnp.maximum(stay, jnp.maximum(diag, skip))
        tot = (jnp.exp(stay - m) + jnp.exp(diag - m) + jnp.exp(skip - m))
        alpha = m + jnp.log(tot) + e
        return alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, emit[1:])       # [N, S]

    # end in the last blank (2L) or last label (2L - 1)
    ends = jnp.stack([2 * target_lengths - 1, 2 * target_lengths], axis=1)
    ends = jnp.clip(ends, 0, S - 1)
    fin = jnp.take_along_axis(alpha, ends, axis=1)        # [N, 2]
    return jax.scipy.special.logsumexp(fin, axis=1)


def ctc_loss(log_probs, targets, target_lengths, reduction: str = "mean"):
    """torch.nn.functional.ctc_loss semantics (reference ctc/model.py:52):
    per-sample -logZ, 'mean' divides each by its target length then
    averages over the batch."""
    nll = -ctc_loss_logz(log_probs, targets, target_lengths)
    if reduction == "none":
        return nll
    per = nll / jnp.maximum(target_lengths.astype(nll.dtype), 1.0)
    if reduction == "mean":
        return per.mean()
    if reduction == "sum":
        return nll.sum()
    raise ValueError(f"unknown reduction {reduction!r}")


def ctc_label_smoothing_loss(log_probs, targets, target_lengths,
                             weights=None):
    """CTC + label-smoothing loss (reference ctc/model.py:48-54): weight
    0.4 on blank, 0.1/(C-1) spread over the rest."""
    C = log_probs.shape[2]
    if weights is None:
        weights = jnp.concatenate([
            jnp.array([0.4], log_probs.dtype),
            jnp.full((C - 1,), 0.1 / (C - 1), log_probs.dtype)])
    loss = ctc_loss(log_probs, targets, target_lengths)
    smooth = -jnp.mean(log_probs * weights)
    return {"loss": loss + smooth, "ctc_loss": loss,
            "label_smooth_loss": smooth}


@jax.jit
def greedy_paths(log_probs):
    """[T, N, C] log-probs -> (paths [N, T] int32, probs [N, T] f32).

    The CTC best path without transition scores is the per-frame argmax;
    probs carries the winning class posterior for qscore computation."""
    path = jnp.argmax(log_probs, axis=2)                  # [T, N]
    prob = jnp.exp(jnp.max(log_probs, axis=2))
    return path.T.astype(jnp.int32), prob.T.astype(jnp.float32)


def collapse_path(path, probs=None, alphabet: str = "NACGT",
                  qscale: float = 1.0, qbias: float = 0.0):
    """Collapse a best path: drop blanks + merge repeats.

    Returns (sequence, qstring, moves): moves[t] = 1 where a new base is
    emitted at frame t (the reference's ``path`` output from
    viterbi_search, ctc/basecall.py:48-63).  qstring per emitted base uses
    the mean posterior over the base's frame run, phred-encoded with the
    model's qscale/qbias calibration.
    """
    path = np.asarray(path)
    prev = np.concatenate([[0], path[:-1]])
    emit = (path != 0) & (path != prev)                   # new-base frames
    labels = path[emit]
    seq = "".join(alphabet[i] for i in labels)
    if probs is None:
        return seq, "*", emit
    probs = np.asarray(probs)
    # mean prob over each run: frames belong to the most recent emission
    run_id = np.cumsum(emit) - 1                          # -1 before first
    valid = (run_id >= 0) & (path != 0)
    n_runs = int(emit.sum())
    if n_runs == 0:
        return "", "", emit
    sums = np.bincount(run_id[valid], weights=probs[valid],
                       minlength=n_runs)
    counts = np.bincount(run_id[valid], minlength=n_runs)
    mean_p = sums / np.maximum(counts, 1)
    err = np.clip(1.0 - mean_p, 1e-7, 1.0)
    q = np.clip(-10.0 * np.log10(err) * qscale + qbias, 1.0, 50.0)
    qstring = "".join(chr(int(round(x)) + 33) for x in q)
    return seq, qstring, emit


def beam_search(probs, alphabet: str = "NACGT", beamsize: int = 5,
                threshold: float = 1e-3):
    """Prefix beam search over one read's posteriors [T, C] (class 0 =
    blank).  Returns (sequence, path) where path[i] is the frame at which
    base i was first emitted — the fast-ctc-decode beam_search contract
    (reference ctc/model.py:44).

    Uses the native C++ kernel when available; this function body is the
    reference pure-python semantics and the fallback.
    """
    from xna_basecaller_tpu.utils import native
    probs = np.ascontiguousarray(probs, np.float32)
    if native.available() and hasattr(native, "ctc_beam_search"):
        out = native.ctc_beam_search(probs, alphabet, beamsize, threshold)
        if out is not None:
            return out
    return _beam_search_py(probs, alphabet, beamsize, threshold)


def _beam_search_py(probs, alphabet, beamsize, threshold):
    T, C = probs.shape
    # beams: prefix tuple -> (p_blank, p_non_blank); emission frame of each
    # prefix's last base is memoised at prefix creation (deterministic and
    # shared with the native kernel's trie representation)
    beams = {(): (1.0, 0.0)}
    first_frame: dict = {}
    for t in range(T):
        frame = probs[t]
        nxt: dict = {}

        def acc(prefix, pb, pnb):
            opb, opnb = nxt.get(prefix, (0.0, 0.0))
            nxt[prefix] = (opb + pb, opnb + pnb)

        for prefix, (pb, pnb) in beams.items():
            total = pb + pnb
            # blank extends both: prefix unchanged
            if frame[0] > threshold:
                acc(prefix, total * frame[0], 0.0)
            for c in range(1, C):
                p = frame[c]
                if p <= threshold:
                    continue
                if prefix and prefix[-1] == c:
                    # repeat: merges into the same prefix (non-blank path)
                    acc(prefix, 0.0, pnb * p)
                    # emit a NEW same base only after a blank
                    ext = prefix + (c,)
                    first_frame.setdefault(ext, t)
                    acc(ext, 0.0, pb * p)
                else:
                    ext = prefix + (c,)
                    first_frame.setdefault(ext, t)
                    acc(ext, 0.0, total * p)
        beams = dict(sorted(nxt.items(), key=lambda kv: -(kv[1][0] + kv[1][1])
                            )[:beamsize])
        if not beams:
            beams = {(): (1.0, 0.0)}
    best, _ = max(beams.items(), key=lambda kv: kv[1][0] + kv[1][1])
    seq = "".join(alphabet[c] for c in best)
    frames = [first_frame[best[:i + 1]] for i in range(len(best))]
    return seq, np.asarray(frames, np.int64)


@partial(jax.jit, static_argnames=("reverse",))
def log_softmax_scores(scores, reverse: bool = False):
    """Raw decoder output -> log-probs; optionally time-reversed for
    R-strand chunks (the plain-CTC analogue of CRF reverse_complement is
    handled at the label level by the caller)."""
    lp = jax.nn.log_softmax(scores, axis=-1)
    if reverse:
        lp = lp[::-1]
    return lp

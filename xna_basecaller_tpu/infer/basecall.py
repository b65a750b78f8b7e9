"""Basecalling pipeline: raw reads -> chunk -> batch -> score+decode -> stitch.

TPU-first re-design of the reference lazy pipeline (reference: ub-bonito/
bonito/crf/basecall.py:96-119):

* Host stages (chunking, batch packing, stitching) run in background threads
  over bounded queues; the device stage is one jitted function per fixed
  (batchsize, chunksize) shape — every batch is padded to that shape so XLA
  compiles exactly once.
* Decode runs on-device: Log-posteriors -> +1e-8 -> log -> Max-semiring
  Viterbi (the reference decode chain, crf/model.py:215-218), returning
  per-frame label paths [N, T'].
* Stitching is frame-accurate by default: per-frame label paths are stitched
  with the reference's overlap arithmetic and then compacted to strings.
  (The reference UB path stitches left-packed char arrays instead —
  crf/basecall.py:58-76 — which trims by char position, not frame;
  ``legacy_char_stitch=True`` replicates that behaviour for parity.)
* R-strand decoding reverse-complements the score tensor on device and
  stitches with reverse=True (reference crf/basecall.py:54-55, 15-24).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from time import perf_counter
from typing import Any, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from xna_basecaller_tpu.data import chunkops
from xna_basecaller_tpu.ops import crf as crf_ops
from xna_basecaller_tpu.utils.pipeline import (
    ordered_thread_map, thread_iter,
)


def _apply_ub_bias(scores, n_base: int, ub_bias: float):
    """Add ``ub_bias`` to every transition score whose emitted label is a
    UB (label index > 4 in the NACGTXY alphabet).  No-op at 0.0."""
    if not ub_bias:
        return scores
    T, N, C = scores.shape
    ns = C // (n_base + 1)
    Ms = scores.reshape(T, N, ns, n_base + 1)
    Ms = Ms.at[..., 5:].add(jnp.asarray(ub_bias, Ms.dtype))
    return Ms.reshape(T, N, C)


@partial(jax.jit, static_argnames=("n_base", "state_len", "reverse",
                                   "ub_bias"))
def _score_and_decode_qual(scores, n_base: int, state_len: int,
                           reverse: bool = False, ub_bias: float = 0.0):
    """Decode with per-frame posterior confidences (real qscores)."""
    if reverse:
        scores = crf_ops.reverse_complement(scores, n_base, state_len)
    scores = _apply_ub_bias(scores, n_base, ub_bias)
    paths, probs = crf_ops.decode_paths_with_qual(scores, n_base, state_len)
    return paths.astype(jnp.int8), probs.astype(jnp.float16)


@partial(jax.jit,
         static_argnames=("n_base", "state_len", "reverse", "beam_width",
                          "ub_bias"))
def _score_and_decode_beam(scores, n_base: int, state_len: int,
                           beam_width: int, reverse: bool = False,
                           ub_bias: float = 0.0):
    """Path-collapsing beam decode (ops/crf.py::decode_beam) — the
    TPU-native stand-in for koi's beam search (crf/basecall.py:43-46),
    available for the full XNA alphabet."""
    if reverse:
        scores = crf_ops.reverse_complement(scores, n_base, state_len)
    scores = _apply_ub_bias(scores, n_base, ub_bias)
    paths, _ = crf_ops.decode_beam(scores, n_base, state_len, beam_width)
    return paths.astype(jnp.int8)


@partial(jax.jit, static_argnames=("n_base", "state_len", "reverse",
                                   "ub_bias"))
def _score_and_decode(scores, n_base: int, state_len: int,
                      reverse: bool = False, ub_bias: float = 0.0):
    """CRF scores -> per-frame label paths [N, T'] int8.

    int8 on purpose: labels are 0..n_base and the device<->host link is the
    scarce resource (results leave the device; scores never do).

    ``ub_bias`` shifts the scores of every transition EMITTING an
    unnatural base (labels > 4) before Viterbi: the decode-time lever
    for trading UB recall against precision/FDR (the reference tunes
    the same trade at the analyzer threshold only,
    analyze_paf.py:1001-1022; here the decoder itself moves along the
    frontier).  Normalisation-free: a constant added per emitted label
    cancels in logZ differences that share the label count.
    """
    if reverse:
        scores = crf_ops.reverse_complement(scores, n_base, state_len)
    scores = _apply_ub_bias(scores, n_base, ub_bias)
    from xna_basecaller_tpu.utils.platform import is_tpu
    if is_tpu():
        from xna_basecaller_tpu.ops.crf_pallas import decode_paths_pallas
        paths = decode_paths_pallas(scores, n_base, state_len)
    else:
        paths = crf_ops.decode_paths(scores, n_base, state_len)
    return paths.astype(jnp.int8)


def _apply_maybe_ensemble(model, params, batch, compute_dtype,
                          lstm_int8: bool):
    """Forward one batch through one param tree — or, when ``params`` is
    a list/tuple of trees, through each and return the MEAN of the f32
    CRF scores (a product-of-experts over the per-model CRF
    distributions; per-model logZ offsets are per-sample constants, so
    averaging unnormalised scores changes no Viterbi argmax vs averaging
    normalised ones).  Checkpoint ensembling is an accuracy feature this
    framework adds over the reference (one model per basecall there)."""
    trees = params if isinstance(params, (list, tuple)) else (params,)
    sc = model.apply(trees[0], batch, compute_dtype=compute_dtype,
                     lstm_int8=lstm_int8)
    for p in trees[1:]:
        sc = sc + model.apply(p, batch, compute_dtype=compute_dtype,
                              lstm_int8=lstm_int8)
    return sc / len(trees) if len(trees) > 1 else sc


@partial(jax.jit, static_argnames=("model", "n_base", "state_len",
                                   "reverse", "compute_dtype", "lstm_int8",
                                   "ub_bias"))
def _super_forward_decode(params, dev, model, n_base: int, state_len: int,
                          reverse: bool, compute_dtype, lstm_int8: bool,
                          ub_bias: float = 0.0):
    """ONE device execution over a [G, N, T] superbatch -> paths [G, N, T'].

    lax.map serialises the G sub-batches inside the dispatch, so only one
    sub-batch's [T, N, C] float32 score tensor (~1 GB at N=256 for the
    flagship head) is ever live — reshaping to [G*N, T] instead stacked G
    of them plus decode workspace and exhausted a 16 GB chip at G=4.  The
    dispatch-count saving (the point of superbatching through the
    tunneled runtime, which pays fixed client cost per execution) is
    identical either way.
    """
    def one(batch):
        sc = _apply_maybe_ensemble(model, params, batch, compute_dtype,
                                   lstm_int8)
        return _score_and_decode(sc, n_base, state_len, reverse, ub_bias)

    return jax.lax.map(one, dev)


def compute_scores(model, params, batch, reverse: bool = False,
                   compute_dtype=jnp.bfloat16):
    """Run the network + decode for one padded batch.

    Returns per-chunk per-frame label paths as host numpy [N, T'] int8.
    The batch travels H2D as float16 (half the bytes; the encoder computes
    in bfloat16 anyway) and only the tiny label paths travel D2H.
    """
    if not isinstance(batch, jax.Array):
        batch = jax.device_put(np.asarray(batch, np.float16))
    scores = model.apply(params, batch, compute_dtype=compute_dtype)
    paths = _score_and_decode(
        scores, model.seqdist.n_base, model.seqdist.state_len, reverse)
    return {"path": np.asarray(paths)}


@dataclass
class BasecallResult:
    read: Any
    sequence: str
    qstring: str
    moves: np.ndarray = field(default=None)
    mean_qscore: float = 0.0


def _pad_batch(batch: np.ndarray, batchsize: int) -> tuple[np.ndarray, int]:
    n = len(batch)
    if n == batchsize:
        return batch, n
    pad = np.zeros((batchsize - n,) + batch.shape[1:], batch.dtype)
    return np.concatenate([batch, pad], axis=0), n


def basecall(model, params, reads: Iterable, chunksize: int = 3600,
             overlap: int = 500, batchsize: int = 256,
             reverse: bool = False, compute_dtype=jnp.bfloat16,
             legacy_char_stitch: bool = False,
             qscores: bool = False, cancel=None,
             stitch_workers: int = 4, quantize: bool = False,
             beam_width: int = 0, superbatch: int = 1,
             ub_bias: float = 0.0) -> Iterator:
    """Basecall reads lazily; yields (read, attrs dict) like the reference
    basecall generator (crf/basecall.py:96-119).

    ``reads`` yield objects with ``.signal`` (1-D float32) and ``.read_id``.
    ``qscores=True`` emits real per-base qualities from the Viterbi edge
    posteriors (the reference's UB path only has dummy qualities).
    ``cancel`` (a threading.Event, e.g. pipeline.cancel_on_sigint()) stops
    the read producer early for a clean Ctrl-C shutdown; the decode-side
    host work (stitch + string building) runs on ``stitch_workers`` ordered
    threads (reference ThreadMap, multiprocessing.py:231-266).
    ``quantize`` uploads the signal as int8 (round(sig * QUANT_SCALE),
    half the bytes of f16 over the relay-limited link; dequantised on
    device) and runs the fused LSTM recurrence with int8 weights/hidden
    state (2x MXU rate) — the TPU analog of the reference's --quantize
    (util.py:304-309 koi int8 graph).
    ``beam_width > 0`` decodes with the path-collapsing beam search
    instead of Viterbi (maximises sequence posterior; koi-equivalent).
    """
    stride = model.stride
    qbias = model.cfg.qscore.bias
    qscale = model.cfg.qscore.scale
    # uploads are f16 (half the bytes over the relay link) except in the
    # f32 parity mode, where the signal must reach the encoder unquantised
    up_dtype = np.int8 if quantize else (
        np.float32 if compute_dtype == jnp.float32 else np.float16)

    def gen_chunks():
        for read in reads:
            if cancel is not None and cancel.is_set():
                return
            sig = np.asarray(read.signal, dtype=np.float32)
            yield ((read, 0, len(sig)),
                   chunkops.chunk(sig, chunksize, overlap))

    chunks = thread_iter(gen_chunks())
    batches = thread_iter(chunkops.batchify(iter(chunks), batchsize))

    # superbatch: stack G fixed-shape batches into ONE upload + ONE
    # device execution ([G*N] rows through the encoder: bigger MXU
    # matmuls, and G-fold fewer executions — which matters through the
    # tunneled runtime, where each execution pays fixed client-side cost)
    G = max(1, int(superbatch)) if not (qscores or beam_width > 0) else 1
    if G != max(1, int(superbatch)):
        import sys
        print(f"[basecall] --superbatch {superbatch} ignored (runs as 1): "
              "qscores/beam decoding is not superbatched", file=sys.stderr)

    def gen_uploads():
        # dedicated H2D stage: pad to the fixed shape, cast to f16 (half
        # the bytes over the host<->device link; int8 with quantize=True,
        # half again) and upload ahead of compute
        gk, gn, ga = [], [], []
        for keys, batch in batches:
            padded, n = _pad_batch(np.asarray(batch), batchsize)
            if quantize:
                from xna_basecaller_tpu.models.crf_model import QUANT_SCALE
                padded = np.clip(np.rint(padded * QUANT_SCALE), -127, 127)
            if G == 1:
                yield [keys], [n], jax.device_put(
                    np.asarray(padded, up_dtype)[None])
                continue
            gk.append(keys)
            gn.append(n)
            ga.append(np.asarray(padded, up_dtype))
            if len(ga) == G:
                yield gk, gn, jax.device_put(np.stack(ga))
                gk, gn, ga = [], [], []
        if ga:
            # fixed [G, N, T] shape: pad the trailing group with empty
            # batches (n=0) so the compiled program is reused
            while len(ga) < G:
                gk.append(())
                gn.append(0)
                ga.append(np.zeros_like(ga[0]))
            yield gk, gn, jax.device_put(np.stack(ga))

    uploads = thread_iter(gen_uploads(), maxsize=3)

    def gen_compute():
        # dispatch-only stage: the device arrays are NOT synced here, so
        # the accelerator pipelines batch k+1 while batch k's results
        # drain device->host in the fetch stage below
        for keys_g, n_g, dev in uploads:
            g, N, T = dev.shape
            if g > 1:
                # superbatch: one dispatch, sub-batches serialised in-jit
                # (lax.map) so HBM holds one score tensor at a time
                paths = _super_forward_decode(
                    params, dev, model, model.seqdist.n_base,
                    model.seqdist.state_len, reverse, compute_dtype,
                    quantize, float(ub_bias))
                yield keys_g, n_g, N, paths, None
                continue
            # quantize also switches the fused LSTM recurrence to int8
            # weights/hidden (reference util.py:304-309: --quantize selects
            # the koi int8 graph), doubling the MXU rate on v5e
            sc = _apply_maybe_ensemble(model, params, dev[0],
                                       compute_dtype, quantize)
            if qscores:
                paths, probs = _score_and_decode_qual(
                    sc, model.seqdist.n_base, model.seqdist.state_len,
                    reverse, float(ub_bias))
            elif beam_width > 0:
                paths = _score_and_decode_beam(
                    sc, model.seqdist.n_base, model.seqdist.state_len,
                    beam_width, reverse, float(ub_bias))
                probs = None
            else:
                paths = _score_and_decode(
                    sc, model.seqdist.n_base, model.seqdist.state_len,
                    reverse, float(ub_bias))
                probs = None
            yield keys_g, n_g, N, paths, probs

    computed = thread_iter(gen_compute(), maxsize=3)

    def gen_fetch():
        for keys_g, n_g, N, paths, probs in computed:
            p_host = np.asarray(paths)
            if p_host.ndim == 3:  # superbatch [G, N, T'] -> [G*N, T']
                p_host = p_host.reshape(-1, p_host.shape[-1])
            q_host = None if probs is None else np.asarray(probs)
            for gi, (keys, n) in enumerate(zip(keys_g, n_g)):
                if not keys:
                    continue  # trailing-group padding
                lo = gi * N
                out = {"path": p_host[lo:lo + n]}
                if q_host is not None:
                    out["prob"] = q_host[lo:lo + n].astype(np.float32)
                yield keys, out

    scores = thread_iter(gen_fetch())

    def finish(item):
        (read, start, end), attrs = item
        path = attrs["path"]  # [n_chunks, T']
        if legacy_char_stitch:
            packed = _left_pack(path)
            stitched = chunkops.stitch(
                packed, chunksize, overlap, end - start, stride,
                reverse=reverse)
        else:
            stitched = chunkops.stitch(
                path, chunksize, overlap, end - start, stride,
                reverse=reverse)
        seq = model.seqdist.path_to_str(stitched)
        moves = (np.asarray(stitched) != 0)
        if "prob" in attrs:
            from xna_basecaller_tpu.data.writers import phred
            probs = chunkops.stitch(
                attrs["prob"], chunksize, overlap, end - start, stride,
                reverse=reverse)
            base_probs = np.asarray(probs)[moves]
            qstring = "".join(
                phred(p, scale=qscale, bias=qbias) for p in base_probs)
        else:
            # Parity with the reference UB path's dummy mid-scale
            # qstring (crf/basecall.py:67).
            qstring = "O" * len(seq)
        return read, {
            "sequence": seq,
            "qstring": qstring,
            "moves": moves,
            "stride": stride,
        }

    # NOTE: no cancel here — on Ctrl-C the read producer stops, but reads
    # already admitted to the pipeline drain through and are still emitted.
    return ordered_thread_map(
        finish, chunkops.unbatchify(scores), n_workers=stitch_workers,
        maxsize=4)


def _left_pack(paths: np.ndarray) -> np.ndarray:
    """Left-pack nonzero labels per chunk (reference crf/basecall.py:58-70):
    the decoded string's codes padded with zeros to frame length.

    Vectorised: a stable argsort of the zero-mask moves nonzeros left in
    order; the displaced entries are all zeros already."""
    order = np.argsort(paths == 0, axis=1, kind="stable")
    return np.take_along_axis(paths, order, axis=1)


def run_basecaller(model, params, reads, fastq_out, summary_out=None,
                   chunksize: int = 3600, overlap: int = 500,
                   batchsize: int = 256, reverse: bool = False,
                   quantize: bool = False, beam_width: int = 0,
                   **basecall_opts) -> dict:
    """Drive the full pipeline, writing FASTQ (+ summary); returns timing
    stats incl. the headline samples/s (reference cli/basecaller.py:153-161).

    Extra keyword options (e.g. ``legacy_char_stitch``, ``compute_dtype``)
    are forwarded to :func:`basecall` — the e2e parity test uses them to
    match the reference generator's f32 char-position stitch exactly.
    """
    t0 = perf_counter()
    n_reads = 0
    n_samples = 0
    for read, attrs in basecall(
            model, params, reads, chunksize=chunksize, overlap=overlap,
            batchsize=batchsize, reverse=reverse, quantize=quantize,
            beam_width=beam_width, **basecall_opts):
        n_reads += 1
        n_samples += len(read.signal)
        fastq_out.write(
            f"@{read.read_id}\n{attrs['sequence']}\n+\n{attrs['qstring']}\n")
        if summary_out is not None:
            summary_out.write(
                f"{read.read_id}\t{len(read.signal)}\t"
                f"{len(attrs['sequence'])}\n")
    dt = perf_counter() - t0
    return {
        "reads": n_reads,
        "samples": n_samples,
        "seconds": dt,
        "samples_per_s": n_samples / dt if dt > 0 else 0.0,
    }

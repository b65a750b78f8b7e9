"""Legacy CTC basecalling pipeline: chunk -> forward -> stitch scores ->
host decode (greedy / prefix beam search).

TPU-first re-design of the reference CTC pipeline (reference: ub-bonito/
bonito/ctc/basecall.py:14-64): same dataflow (scores are stitched at the
probability level and each read is decoded whole, so beam search sees the
full read), but the device stage is one jitted fixed-shape executable with
staged H2D/D2H threads like the CRF pipeline, and the per-read decode runs
on an ordered thread map (the reference uses process_map n_proc=4).

Decode parity (ctc/basecall.py:43-64): a greedy pass always produces the
qstring + mean qscore; with beamsize > 1 the emitted sequence comes from
beam search (native C++ prefix beam, ops/ctc.py fallback) and the qstring
degrades to '*' exactly like the reference.
"""

from __future__ import annotations

from functools import partial
from time import perf_counter
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from xna_basecaller_tpu.data import chunkops
from xna_basecaller_tpu.ops import ctc as ctc_ops
from xna_basecaller_tpu.utils.pipeline import ordered_thread_map, thread_iter


@partial(jax.jit, static_argnames=("cfg",))
def _forward_f16(params, batch, cfg):
    """Forward to log-probs, transposed [N, T', C] float16 for the D2H
    fetch (scores leave the device in this pipeline — halve the bytes)."""
    from xna_basecaller_tpu.models import ctc_model
    lp = ctc_model.forward(params, batch, cfg)        # [T, N, C] f32
    return jnp.transpose(lp, (1, 0, 2)).astype(jnp.float16)


def mean_qscore_from_qstring(qstring: str) -> float:
    """Mean error-probability -> phred (reference util.py:80-89)."""
    if not qstring or qstring == "*":
        return 0.0
    err = np.mean([10 ** ((ord(c) - 33) / -10) for c in qstring])
    return float(-10 * np.log10(max(err, 1e-10)))


def basecall_ctc(model, params, reads: Iterable, chunksize: int = 3600,
                 overlap: int = 500, batchsize: int = 64,
                 beamsize: int = 5, threshold: float = 1e-3,
                 qscores: bool = False, cancel=None,
                 decode_workers: int = 4) -> Iterator:
    """Basecall reads with a CTC model; yields (read, attrs) like the
    reference generator (ctc/basecall.py:14-29)."""
    cfg = model.cfg
    stride = model.stride
    alphabet = model.alphabet

    def gen_chunks():
        for read in reads:
            if cancel is not None and cancel.is_set():
                return
            sig = np.asarray(read.signal, dtype=np.float32)
            yield ((read, 0, len(sig)),
                   chunkops.chunk(sig, chunksize, overlap))

    chunks = thread_iter(gen_chunks())
    batches = thread_iter(chunkops.batchify(iter(chunks), batchsize))

    def gen_uploads():
        for keys, batch in batches:
            batch = np.asarray(batch)
            n = len(batch)
            if n < batchsize:
                batch = np.concatenate([
                    batch, np.zeros((batchsize - n,) + batch.shape[1:],
                                    batch.dtype)])
            yield keys, n, jax.device_put(np.asarray(batch, np.float16))

    uploads = thread_iter(gen_uploads(), maxsize=3)

    def gen_compute():
        for keys, n, dev in uploads:
            yield keys, n, _forward_f16(params, dev, cfg)

    computed = thread_iter(gen_compute(), maxsize=3)

    def gen_fetch():
        for keys, n, lp in computed:
            yield keys, {"scores": np.asarray(lp)[:n].astype(np.float32)}

    scores = thread_iter(gen_fetch())

    def finish(item):
        (read, start, end), attrs = item
        lp = chunkops.stitch(attrs["scores"], chunksize, overlap,
                             end - start, stride)     # [T_read, C]
        path = np.argmax(lp, axis=1)
        prob = np.exp(np.max(lp, axis=1))
        seq, qstring, moves = ctc_ops.collapse_path(
            path, prob, alphabet,
            qscale=cfg.qscore.scale, qbias=cfg.qscore.bias)
        mean_q = mean_qscore_from_qstring(qstring)
        if beamsize > 1 and not qscores:
            seq_beam, frames = ctc_ops.beam_search(
                np.exp(lp), alphabet, beamsize, threshold)
            if seq_beam:
                seq, qstring = seq_beam, "*"
                moves = np.zeros(len(lp), bool)
                moves[frames] = True
        sig_move = np.zeros(len(moves) * stride, bool)
        sig_move[np.where(moves)[0] * stride] = True
        return read, {
            "sequence": seq,
            "qstring": qstring,
            "mean_qscore": mean_q,
            "moves": moves,
            "sig_move": sig_move,
            "stride": stride,
        }

    return ordered_thread_map(
        finish, chunkops.unbatchify(scores), n_workers=decode_workers,
        maxsize=4)


def run_ctc_basecaller(model, params, reads, fastq_out, beamsize: int = 5,
                       chunksize: int = 3600, overlap: int = 500,
                       batchsize: int = 64) -> dict:
    """Drive the CTC pipeline to FASTQ; returns timing stats."""
    t0 = perf_counter()
    n_reads = n_samples = 0
    for read, attrs in basecall_ctc(model, params, reads, chunksize,
                                    overlap, batchsize, beamsize):
        n_reads += 1
        n_samples += len(read.signal)
        q = attrs["qstring"] if attrs["qstring"] != "*" \
            else "!" * len(attrs["sequence"])
        fastq_out.write(
            f"@{read.read_id}\n{attrs['sequence']}\n+\n{q}\n")
    dt = perf_counter() - t0
    return {"reads": n_reads, "samples": n_samples, "seconds": dt,
            "samples_per_s": n_samples / dt if dt > 0 else 0.0}

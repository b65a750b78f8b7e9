"""Chunk / stitch / batchify: the long-signal mechanism.

Reads of arbitrary length are split into fixed overlapping windows, decoded
independently (embarrassingly parallel — the TPU batch axis), and stitched
back by trimming semi-overlap margins.  The index arithmetic replicates the
reference exactly (reference: ub-bonito/bonito/util.py:152-225), since decode
parity depends on it; the implementation is host-side numpy feeding
fixed-shape device batches.
"""

from __future__ import annotations

from itertools import groupby
from operator import itemgetter

import numpy as np


def chunk(signal: np.ndarray, chunksize: int, overlap: int) -> np.ndarray:
    """Split a 1-D signal into overlapping chunks [n_chunks, chunksize].

    Replicates reference util.py:152-166: left-pad short signals; when a
    remainder ("stub") exists, the first window covers signal[:chunksize]
    and subsequent windows start at the stub offset.
    """
    signal = np.asarray(signal)
    T = signal.shape[0]
    if chunksize == 0:
        return signal[None, :]
    if T < chunksize:
        return np.pad(signal, (chunksize - T, 0))[None, :]
    stub = (T - overlap) % (chunksize - overlap)
    step = chunksize - overlap
    starts = np.arange(stub, T - chunksize + 1, step)
    chunks = np.stack([signal[s:s + chunksize] for s in starts])
    if stub > 0:
        chunks = np.concatenate([signal[None, :chunksize], chunks], axis=0)
    return chunks


def _concat(xs, dim=0):
    """Type-agnostic concat (reference util.py:66-81)."""
    if isinstance(xs[0], np.ndarray):
        return np.concatenate(xs, axis=dim)
    if isinstance(xs[0], list):
        return [x for l in xs for x in l]
    if isinstance(xs[0], str):
        return "".join(xs)
    if isinstance(xs[0], dict):
        return {k: _concat([x[k] for x in xs], dim) for k in xs[0].keys()}
    raise TypeError(type(xs[0]))


def stitch(chunks, chunksize: int, overlap: int, length: int, stride: int,
           reverse: bool = False):
    """Stitch per-chunk results back into one read.

    Replicates reference util.py:169-188: drop semi-overlap margins from
    interior chunks; the first chunk keeps up to the stub boundary; handles
    reverse-strand chunk ordering.
    """
    chunks = np.asarray(chunks) if not isinstance(chunks, (list, dict)) \
        else chunks
    if isinstance(chunks, dict):
        return {k: stitch(v, chunksize, overlap, length, stride, reverse)
                for k, v in chunks.items()}
    if len(chunks) == 1:
        return chunks[0]

    semi_overlap = overlap // 2
    start, end = semi_overlap // stride, (chunksize - semi_overlap) // stride
    stub = (length - overlap) % (chunksize - overlap)
    first_chunk_end = (stub + semi_overlap) // stride if (stub > 0) else end

    if reverse:
        chunks = list(chunks)
        return _concat([
            chunks[-1][:-start],
            *(x[-end:-start] for x in reversed(chunks[1:-1])),
            chunks[0][-first_chunk_end:],
        ])
    return _concat([
        chunks[0][:first_chunk_end],
        *(x[start:end] for x in chunks[1:-1]),
        chunks[-1][start:],
    ])


def batchify(items, batchsize: int):
    """Re-pack (key, array) pairs into fixed-size batches.

    Yields (sub_batches, batch) where sub_batches is a list of
    (key, (start, end)) locating each key's rows inside the batch
    (reference util.py:191-210).  The final short batch is yielded as-is;
    callers pad it to the fixed shape before hitting the device.
    """
    stack, pos = [], 0
    for k, v in items:
        n = len(v)
        breaks = range(batchsize - pos, n, batchsize)
        for start, end in zip([0, *breaks], [*breaks, n]):
            sub = v[start:end]
            stack.append(((k, (pos, pos + end - start)), sub))
            if pos + end - start == batchsize:
                ks, vs = zip(*stack)
                yield ks, _concat(list(vs), 0)
                stack, pos = [], 0
            else:
                pos += end - start
    if len(stack):
        ks, vs = zip(*stack)
        yield ks, _concat(list(vs), 0)


def unbatchify(batches):
    """Reassemble per-read results from batches (reference util.py:213-225)."""
    flat = (
        (k, _select(v, start, end))
        for sub_batches, v in batches
        for k, (start, end) in sub_batches
    )
    return (
        (k, _concat([v for _, v in group], 0))
        for k, group in groupby(flat, itemgetter(0))
    )


def _select(v, start, end):
    if isinstance(v, dict):
        return {k: _select(x, start, end) for k, x in v.items()}
    return v[start:end]

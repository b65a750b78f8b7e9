"""Data-parallel basecalling over a device mesh.

The reference has no multi-device inference (SURVEY §2.4: single GPU;
eval shards by *process* in train_and_eval.sh).  Here scoring+decode is
mesh-native: parameters replicate, the chunk batch shards on axis 0
across the ``data`` axis, and the jitted score+decode step runs SPMD —
per-chunk decode is embarrassingly parallel, so no collectives are
needed and throughput scales linearly over ICI-connected chips.

``sharded_compute_scores`` is a drop-in for infer.basecall.compute_scores
on a mesh; ``make_sharded_scorer`` returns a closure the pipeline's
compute stage can use directly.
"""

from __future__ import annotations

import jax
import numpy as np

from xna_basecaller_tpu.parallel import mesh as mesh_lib


def make_sharded_scorer(model, params, mesh, reverse: bool = False,
                        qscores: bool = False):
    """Returns scorer(batch [N, T] float16/32) -> paths [N, T'] int8
    (with qscores: (paths, probs)).  N must divide by the mesh size
    after padding — the pipeline's fixed batchsize should be a multiple
    of the device count.
    """
    from xna_basecaller_tpu.infer.basecall import (
        _score_and_decode, _score_and_decode_qual,
    )

    params = mesh_lib.replicate(mesh, params)
    n_dev = mesh.devices.size
    n_base = model.seqdist.n_base
    state_len = model.seqdist.state_len

    def scorer(batch):
        batch = np.asarray(batch, np.float16)
        padded, n = mesh_lib.pad_to_multiple(batch, n_dev)
        dev = mesh_lib.shard_batch(mesh, padded)
        scores = model.apply(params, dev)
        if qscores:
            paths, probs = _score_and_decode_qual(
                scores, n_base, state_len, reverse)
            return (np.asarray(paths)[:n], np.asarray(probs)[:n])
        paths = _score_and_decode(scores, n_base, state_len, reverse)
        return np.asarray(paths)[:n]

    return scorer


def sharded_compute_scores(model, params, batch, mesh,
                           reverse: bool = False) -> dict:
    """One-shot sharded scoring (compute_scores signature + mesh)."""
    scorer = make_sharded_scorer(model, params, mesh, reverse=reverse)
    return {"path": scorer(batch)}

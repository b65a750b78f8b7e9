"""Steady-state pipeline throughput vs (n_reads, batchsize, superbatch).

The bench headline pass uses 120 reads (~18 batches -> ~4.6 G=4
dispatches); with 3-deep stage buffers the pipeline fill/drain is a
non-trivial fraction of the pass, so this script measures longer passes
and alternative batch shapes to locate the honest steady-state number.

Writes results/perf_knobs_r05/pipeline_tweaks.json.
"""
from __future__ import annotations

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from xna_basecaller_tpu.utils.platform import ensure_tunnel_journal_compact

ensure_tunnel_journal_compact()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from xna_basecaller_tpu.core.config import ModelConfig  # noqa: E402
from xna_basecaller_tpu.data.simulate import simulate_reads  # noqa: E402
from xna_basecaller_tpu.infer.basecall import (  # noqa: E402
    compute_scores, run_basecaller,
)
from xna_basecaller_tpu.models.crf_model import Model  # noqa: E402


def main():
    cfg = ModelConfig()
    chunksize, overlap = 3600, 500
    model = Model(cfg)
    params = model.init(jax.random.key(0))
    out = {}

    cases = [
        # (tag, n_reads, batchsize, superbatch, repeats)
        ("B256_G4_r120", 120, 256, 4, 2),   # bench baseline shape
        ("B256_G4_r360", 360, 256, 4, 2),   # 3x pass length, same shape
        ("B256_G8_r360", 360, 256, 8, 2),   # G=8 with amortised fill
        ("B512_G2_r360", 360, 512, 2, 2),   # same rows/dispatch, bigger MXU
    ]
    for tag, n_reads, B, G, reps in cases:
        reads = list(simulate_reads(n_reads, mean_len=120_000, seed=7))
        total = sum(len(r.signal) for r in reads)
        warm = np.zeros((B, chunksize), np.float32)
        t0 = time.perf_counter()
        compute_scores(model, params, warm)
        print(f"[{tag}] warm {time.perf_counter() - t0:.1f}s "
              f"({total:,} samples)", flush=True)
        best = 0.0
        for i in range(reps + 1):  # +1: first pass pays superbatch compile
            fq = io.StringIO()
            stats = run_basecaller(
                model, params, iter(reads), fq, None,
                chunksize=chunksize, overlap=overlap, batchsize=B,
                superbatch=G)
            sps = stats["samples_per_s"]
            print(f"[{tag}] pass {i}: {sps:.3e} samples/s "
                  f"({stats['seconds']:.1f}s)", flush=True)
            if i > 0:
                best = max(best, sps)
        out[tag] = {"n_reads": n_reads, "batchsize": B, "superbatch": G,
                    "best_samples_per_s": round(best, 1)}
        path = "results/perf_knobs_r05/pipeline_tweaks.json"
        with open(path + ".tmp", "w") as f:
            json.dump(out, f, indent=2)
        os.replace(path + ".tmp", path)
        print(json.dumps({tag: out[tag]}), flush=True)


if __name__ == "__main__":
    main()

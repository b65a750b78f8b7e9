#!/usr/bin/env python
"""Standalone eval pipeline (reference eval_model.sh): basecall -> align ->
UB analysis for one model/split."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

from xna_basecaller_tpu.tools.eval_model import eval_model

p = argparse.ArgumentParser()
p.add_argument("exp")
p.add_argument("basecalls_dir")
p.add_argument("--split", default="test")
p.add_argument("--fastq", default=None)
p.add_argument("--model", default=None)
p.add_argument("--reads", default=None)
p.add_argument("--read-ids", default=None)
p.add_argument("--ubs", default="XY")
p.add_argument("--max-bc-dist", type=int, default=None)
p.add_argument("--weights", type=int, default=None)
p.add_argument("--n-proc", type=int, default=0)
p.add_argument("--beam", type=int, default=0,
               help="CRF beam width for basecalling (0 = Viterbi)")
a = p.parse_args()
summary = eval_model(a.exp, a.basecalls_dir, split=a.split,
                     reads_fastq=a.fastq, model_dir=a.model,
                     reads_dir=a.reads, read_ids=a.read_ids, ubs=a.ubs,
                     max_bc_dist=a.max_bc_dist, weights=a.weights,
                     n_proc=a.n_proc, beam_width=a.beam)
for k, v in summary.items():
    print(f"{k}: {v}")

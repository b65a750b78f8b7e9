#!/usr/bin/env python
"""Per-epoch validation sweep + best-epoch selection (reference
run_ub_validation.sh)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

from xna_basecaller_tpu.tools.train_and_eval import run_ub_validation

p = argparse.ArgumentParser()
p.add_argument("model_dir")
p.add_argument("--exp", default="POC")
p.add_argument("--reads", default=None)
p.add_argument("--read-ids", default=None)
p.add_argument("--ubs", default="XY")
a = p.parse_args()
best = run_ub_validation(a.model_dir, a.exp, reads_dir=a.reads,
                         read_ids=a.read_ids, ubs=a.ubs)
print(f"best_epoch: {best}")

#!/usr/bin/env python
"""Shell-replacement entry for the full train->validate->test pipeline
(reference train_and_eval.sh).  Example:

  python scripts/train_and_eval.py runs/spliced_xy \
      --data data/ctc --exp POC --ubs XY --stitch --epochs 5 \
      --val-reads data/reads --val-ids xna_libs/POC/split_reads-val.tsv \
      --test-reads data/reads --test-ids xna_libs/POC/split_reads-test.tsv
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

from xna_basecaller_tpu.tools.train_and_eval import train_and_eval

p = argparse.ArgumentParser()
p.add_argument("workdir")
p.add_argument("--data", required=True)
p.add_argument("--exp", default="POC")
p.add_argument("--epochs", type=int, default=5)
p.add_argument("--batch", type=int, default=64)
p.add_argument("--lr", type=float, default=5e-4)
p.add_argument("--ubs", default="XY")
p.add_argument("--spike", action="store_true")
p.add_argument("--stitch", action="store_true")
p.add_argument("--ub-prop", type=float, default=0.10)
p.add_argument("--pretrained", default="")
p.add_argument("--config", default=None)
p.add_argument("--val-reads", default=None)
p.add_argument("--val-ids", default=None)
p.add_argument("--test-reads", default=None)
p.add_argument("--test-ids", default=None)
a = p.parse_args()
out = train_and_eval(
    a.workdir, a.data, exp=a.exp, epochs=a.epochs, batch=a.batch, lr=a.lr,
    ubs=a.ubs, spike=a.spike, stitch=a.stitch, ub_prop=a.ub_prop,
    pretrained=a.pretrained, config=a.config,
    val_reads_dir=a.val_reads, val_read_ids=a.val_ids,
    test_reads_dir=a.test_reads, test_read_ids=a.test_ids)
print(out)

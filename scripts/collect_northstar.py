#!/usr/bin/env python
"""Copy the committed-artifact subset of a spliced_northstar run into
results/<name>/ (summary JSON, results_summ CSV chain, training curve)."""
import argparse
import os
import shutil

p = argparse.ArgumentParser()
p.add_argument("run_dir")
p.add_argument("name")
args = p.parse_args()

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out = os.path.join(repo, "results", args.name)
os.makedirs(out, exist_ok=True)

def cp(src, dst=None):
    if os.path.exists(src):
        shutil.copy(src, os.path.join(out, dst or os.path.basename(src)))
        return True
    return False

cp(os.path.join(args.run_dir, "northstar_summary.json"))
sm = os.path.join(args.run_dir, "spliced_model")
cp(os.path.join(sm, "training.csv"))
for key, exp, tag in (("val", "CPLX", "val"), ("test", "CPLX", "test"),
                      ("test-ind", "CPLX", "test-ind"),
                      ("POC-test", "POC", "test"),
                      ("val", "POC", "val"), ("test", "POC", "test")):
    for base in (os.path.join(sm, "basecalls"),
                 os.path.join(sm, f"basecalls-{key}")):
        suffix = "-x" if key == "POC-test" else ""
        cp(os.path.join(base, f"results_summ-{exp}-{tag}.csv"),
           f"results_summ-{exp}-{tag}{suffix}.csv")
        cp(os.path.join(base, f"results_summ-{exp}-{tag}-by_tar.csv"),
           f"results_summ-{exp}-{tag}{suffix}-by_tar.csv")
# per-epoch validation chain: keep the consolidated log if present
for name in ("validation_chain.log", "consolidated.csv"):
    cp(os.path.join(sm, name))
print("collected into", out)

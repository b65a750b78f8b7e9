#!/usr/bin/env python
"""Copy the committed-artifact subset of a spliced_northstar run into
results/<name>/ (summary JSON, results_summ CSV chain, training curves).

Understands single-seed runs (spliced_model/), multi-seed runs
(spliced_model_s{seed}/) and an ensemble winner (ensemble_*/)."""
import argparse
import json
import os
import shutil
from glob import glob

p = argparse.ArgumentParser()
p.add_argument("run_dir")
p.add_argument("name")
args = p.parse_args()

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out = os.path.join(repo, "results", args.name)
os.makedirs(out, exist_ok=True)


_copied = set()


def cp(src, dst=None):
    """Copy src to the results dir; first writer of a destination wins
    (with winner_dir absent the glob fallbacks can hit several stale
    membership-keyed ensemble/soup dirs — the sorted-first one must not
    be silently overwritten by later matches)."""
    dst = dst or os.path.basename(src)
    if dst in _copied:
        return False
    if os.path.exists(src):
        shutil.copy(src, os.path.join(out, dst))
        _copied.add(dst)
        return True
    return False


def _dir_tag(path):
    """'spliced_model_s25' -> '_s25', 'soup_x' -> '_soup_x', '' for the
    plain single-seed dir — always separator-prefixed, matching the
    'training_s25.csv' convention."""
    tag = os.path.basename(path).replace("spliced_model", "")
    if tag and not tag.startswith(("_", "-")):
        tag = "_" + tag
    return tag


summary_path = os.path.join(args.run_dir, "northstar_summary.json")
cp(summary_path)
summary = json.load(open(summary_path)) if os.path.exists(summary_path) \
    else {}

# training curves: every seed dir (single-seed runs keep the plain name)
seed_dirs = sorted(glob(os.path.join(args.run_dir, "spliced_model_s*"))) \
    or [os.path.join(args.run_dir, "spliced_model")]
for sd in seed_dirs:
    cp(os.path.join(sd, "training.csv"), f"training{_dir_tag(sd)}.csv")

# the winner's basecall/eval artifact chain: prefer the explicitly
# recorded dir (globs can hit stale membership-keyed ensemble/soup dirs
# left by resumed runs with different seeds/epochs)
best_seed = summary.get("best_seed")
if summary.get("winner_dir"):
    win_bases = [os.path.join(args.run_dir, summary["winner_dir"])]
elif best_seed == "ensemble":
    win_bases = sorted(glob(os.path.join(args.run_dir, "ensemble_*")))
elif best_seed == "soup":
    win_bases = sorted(glob(os.path.join(args.run_dir, "soup_*")))
elif best_seed is not None and len(seed_dirs) > 1:
    win_bases = [os.path.join(args.run_dir, f"spliced_model_s{best_seed}")]
else:
    win_bases = seed_dirs[:1]

for key, exp, tag in (("val", "CPLX", "val"), ("test", "CPLX", "test"),
                      ("test-ind", "CPLX", "test-ind"),
                      ("POC-test", "POC", "test"),
                      ("val", "POC", "val"), ("test", "POC", "test"),
                      ("test-ind", "POC", "test-ind")):
    for win in win_bases:
        for base in (os.path.join(win, "basecalls"),
                     os.path.join(win, f"basecalls-{key}"),
                     win):
            suffix = "-x" if key == "POC-test" else ""
            cp(os.path.join(base, f"results_summ-{exp}-{tag}.csv"),
               f"results_summ-{exp}-{tag}{suffix}.csv")
            cp(os.path.join(base, f"results_summ-{exp}-{tag}-by_tar.csv"),
               f"results_summ-{exp}-{tag}{suffix}-by_tar.csv")
# per-seed val consolidation + per-epoch chain logs if present
for sd in seed_dirs + win_bases:
    for name in ("validation_chain.log", "consolidated.csv"):
        stem, ext = os.path.splitext(name)
        cp(os.path.join(sd, name), f"{stem}{_dir_tag(sd)}{ext}")
print("collected into", out)

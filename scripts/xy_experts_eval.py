#!/usr/bin/env python
"""XY calling via an ensemble of per-ubs experts.

The per-ubs chains (r13 X, r14 Y) each beat the XY model on their own
UB; this evaluates whether score-averaging the X and Y winners (the
framework's checkpoint-ensemble decode) beats the dedicated XY soup on
the XY task — same read sets for every candidate, CPLX held-out + POC
cross-library, ubs=XY analysis.  Run only when the chip is free.

Writes results/xy_experts_r05/summary.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xna_basecaller_tpu.utils.platform import (  # noqa: E402
    ensure_tunnel_journal_compact,
)

ensure_tunnel_journal_compact()

import numpy as np  # noqa: E402

XY_SOUP = "runs/ns_r11/soup_s25e4-s26e8-s27e90"
X_SOUP = "runs/ns_r13_x/soup_s25e4-s26e90-s27e8"
Y_SOUP = "runs/ns_r14_y/soup_s25e4-s26e4-s27e4"

CANDIDATES = {
    "xy_soup_control": [XY_SOUP],
    "xpert_x_plus_y": [X_SOUP, Y_SOUP],
    "xpert_x_y_xy": [X_SOUP, Y_SOUP, XY_SOUP],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="results/xy_experts_r05")
    p.add_argument("--reads", type=int, default=2000)
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()

    from xna_basecaller_tpu.data.simulate import sim_library_reads
    from xna_basecaller_tpu.eval.xna_refs import XnaRefs
    from xna_basecaller_tpu.tools.eval_model import basecall_and_eval

    rng = np.random.default_rng(1313)
    cplx = XnaRefs("CPLX")
    poc = XnaRefs("POC")
    read_sets = {
        "CPLX-heldout": ("CPLX", list(sim_library_reads(
            cplx, rng, args.reads, True, "heldout", read_len_chunks=1))),
        "POC-heldout": ("POC", list(sim_library_reads(
            poc, rng, args.reads, True, "heldout", read_len_chunks=1))),
    }
    os.makedirs(args.out, exist_ok=True)
    summary = {}
    keep = ("ub_acc", "ub_acc_ci_lo", "ub_acc_ci_hi", "precision",
            "f1_score", "demux", "align", "num_aligned_reads",
            "true_pos", "false_pos", "false_neg")
    for cname, dirs in CANDIDATES.items():
        summary[cname] = {"members": dirs}
        for sname, (exp, reads) in read_sets.items():
            tag = f"{cname}-{sname}"
            s = basecall_and_eval(
                dirs if len(dirs) > 1 else dirs[0], reads, exp, sname,
                weights="99", batchsize=args.batch, ubs="XY",
                out_dir=os.path.join(args.out, tag))
            summary[cname][sname] = {k: s.get(k) for k in keep}
            print(f"[experts] {tag}: ub_acc {s.get('ub_acc'):.2f} "
                  f"[{s.get('ub_acc_ci_lo'):.2f}-{s.get('ub_acc_ci_hi'):.2f}]"
                  f" precision {s.get('precision'):.2f}", flush=True)
            with open(os.path.join(args.out, "summary.json"), "w") as fh:
                json.dump(summary, fh, indent=2)
    print(json.dumps({c: {s: v[s]["ub_acc"] for s in read_sets if s in v}
                      for c, v in summary.items()}))


if __name__ == "__main__":
    main()

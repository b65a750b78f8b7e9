#!/usr/bin/env python
"""UB-call precision/recall frontier: sweep the decode-time UB score
bias on the r11 north-star winner (VERDICT r4 #6).

For each bias the winner model basecalls the SAME held-out-regime read
set (fresh simulation, seed disjoint from training) and the analyzer
reports ub_acc (recall), precision, FDR, F1 — mapping the frontier the
reference only measures at one point (analyze_paf.py:1001-1022).

Writes results/ub_bias_frontier_r05/frontier.csv + chosen operating
point.  Run only when the chip is free.
"""

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xna_basecaller_tpu.utils.platform import (  # noqa: E402
    ensure_tunnel_journal_compact,
)

ensure_tunnel_journal_compact()

import numpy as np  # noqa: E402

BIASES = (-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="runs/ns_r11/soup_s25e4-s26e8-s27e90")
    p.add_argument("--out", default="results/ub_bias_frontier_r05")
    p.add_argument("--reads", type=int, default=1500)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--biases", default=None,
                   help="comma-separated override of the bias grid")
    args = p.parse_args()
    biases = (tuple(float(b) for b in args.biases.split(","))
              if args.biases else BIASES)

    from xna_basecaller_tpu.data.simulate import sim_library_reads
    from xna_basecaller_tpu.eval.xna_refs import XnaRefs
    from xna_basecaller_tpu.tools.eval_model import basecall_and_eval

    refs = XnaRefs("CPLX")
    rng = np.random.default_rng(991)
    reads = list(sim_library_reads(refs, rng, args.reads, True, "heldout",
                                   read_len_chunks=1))
    os.makedirs(args.out, exist_ok=True)
    frontier_csv = os.path.join(args.out, "frontier.csv")
    rows = []
    if args.biases and os.path.exists(frontier_csv):
        with open(frontier_csv) as fh:
            rows = [{k: (float(v) if v not in ("", "None") else None)
                     for k, v in r.items()}
                    for r in csv.DictReader(fh)]
        rows = [r for r in rows if r["ub_bias"] not in biases]
    for b in biases:
        tag = f"bias{b:+.1f}"
        summ = basecall_and_eval(
            args.model, reads, "CPLX", tag, weights="99",
            batchsize=args.batch, ubs="XY",
            out_dir=os.path.join(args.out, tag), ub_bias=b)
        row = {"ub_bias": b}
        for k in ("ub_acc", "ub_acc_ci_lo", "ub_acc_ci_hi", "precision",
                  "f1_score", "f2_score", "demux", "align", "true_pos",
                  "false_pos", "false_neg", "err_far_ub", "read_acc"):
            row[k] = summ.get(k)
        row["fdr"] = (100.0 - row["precision"]
                      if row.get("precision") is not None else None)
        rows.append(row)
        print(f"[sweep] {tag}: ub_acc {row['ub_acc']:.2f} "
              f"precision {row['precision']:.2f} f1 {row['f1_score']:.2f}",
              flush=True)
        rows.sort(key=lambda r: r["ub_bias"])
        with open(frontier_csv, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)

    best_f1 = max(rows, key=lambda r: r["f1_score"] or 0)
    summary = {
        "model": args.model,
        "n_reads": args.reads,
        "rows": rows,
        "best_f1_bias": best_f1["ub_bias"],
        "note": ("ub_acc is per-site recall; the default operating point "
                 "(bias 0) maximises the BASELINE headline metric, the "
                 "F1-optimal bias is the precision-balanced choice"),
    }
    with open(os.path.join(args.out, "frontier_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps({"best_f1_bias": best_f1["ub_bias"],
                      "rows": len(rows)}))


if __name__ == "__main__":
    main()

"""Compare evaluation results across training runs.

Re-implements the reference tool (reference: src/tools/
comp_basecalls_perf.py): read ``results_summ-{EXP}-{split}.csv`` from each
training directory's basecalls and tabulate UB / area / DNA accuracies
side by side (csv or pretty print).
"""

from __future__ import annotations

import os
from glob import glob

import pandas as pd

KEY_COLS = ["ub_acc", "ub_area_acc", "acc_xna", "acc_pc", "err_far_ub",
            "f1_score", "demux", "align", "num_aligned_reads"]


def collect_run_summaries(train_dirs: list[str], exp: str = "POC",
                          split: str = "test") -> pd.DataFrame:
    rows = []
    for d in train_dirs:
        pattern = os.path.join(
            d, "basecalls*", f"results_summ-{exp}-{split}.csv")
        files = sorted(glob(pattern))
        if not files:
            continue
        df = pd.read_csv(files[-1])
        df.insert(0, "run", os.path.basename(os.path.normpath(d)))
        rows.append(df)
    if not rows:
        return pd.DataFrame()
    return pd.concat(rows).reset_index(drop=True)


def comp_basecalls_perf(train_dirs: list[str], exp: str = "POC",
                        split: str = "test", out_csv: str | None = None,
                        log=print) -> pd.DataFrame:
    df = collect_run_summaries(train_dirs, exp=exp, split=split)
    if df.empty:
        log("[WARNING] no results found to compare")
        return df
    cols = ["run"] + [c for c in KEY_COLS if c in df.columns]
    view = df[cols]
    log(view.round(1).to_string(index=False))
    if out_csv:
        view.to_csv(out_csv, index=False)
    return view

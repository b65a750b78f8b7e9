"""Per-epoch validation consolidation and best-epoch selection.

Re-implements the reference tool (reference: src/tools/
consolidate_ub_validation.py:63-308): read every epoch's
``basecalls-weights_N/results_summ-*.csv``, tabulate UB / area / far
accuracies, pick the best epoch by ``err_only_ub`` (ties broken by
``err_far_ub``), and symlink ``weights_99`` -> best epoch plus
``basecalls`` -> best basecalls dir.
"""

from __future__ import annotations

import os
import re
from glob import glob

import pandas as pd


def collect_epoch_summaries(model_dir: str, exp: str | None = None,
                            split: str = "val") -> pd.DataFrame:
    """Gather results_summ CSVs across basecalls-weights_N dirs."""
    rows = []
    for d in sorted(glob(os.path.join(model_dir, "basecalls-weights_*"))):
        m = re.search(r"weights_(\d+)$", d)
        if not m:
            continue
        epoch = int(m.group(1))
        pattern = (f"results_summ-{exp}-{split}.csv" if exp
                   else f"results_summ-*-{split}.csv")
        files = glob(os.path.join(d, pattern))
        if not files:
            continue
        df = pd.read_csv(files[0])
        df["epoch"] = epoch
        rows.append(df)
    if not rows:
        return pd.DataFrame()
    return pd.concat(rows).set_index("epoch").sort_index()


def pick_best_epoch(summ_df: pd.DataFrame,
                    target_metric: str = "err_only_ub") -> int:
    """Best epoch by target metric, tie-broken by err_far_ub
    (reference consolidate_ub_validation.py:211-226)."""
    if target_metric.startswith("err"):
        best_val = summ_df[target_metric].min()
        cands = summ_df[summ_df[target_metric] == best_val]
    else:
        best_val = summ_df[target_metric].max()
        cands = summ_df[summ_df[target_metric] == best_val]
    if len(cands) > 1 and "err_far_ub" in cands:
        return int(cands["err_far_ub"].idxmin())
    return int(cands.index[0])


def consolidate_ub_validation(model_dir: str, exp: str | None = None,
                              split: str = "val",
                              target_metric: str = "err_only_ub",
                              symlink_best: bool = True,
                              weights_ext: str = "npz",
                              log=print) -> int | None:
    """Consolidate and (optionally) symlink the best epoch; returns it."""
    summ_df = collect_epoch_summaries(model_dir, exp=exp, split=split)
    if summ_df.empty:
        log("[WARNING] no per-epoch validation summaries found")
        return None
    show_cols = [c for c in ("err_only_ub", "err_close_ub", "err_far_ub",
                             "num_aligned_reads") if c in summ_df]
    log("Validation summary per epoch:")
    log(summ_df[show_cols].round(1).to_string())

    best_epoch = pick_best_epoch(summ_df, target_metric)
    log(f"Best epoch is {best_epoch} by {target_metric}="
        f"{summ_df.loc[best_epoch, target_metric]:.2f}")

    if symlink_best:
        link = os.path.join(model_dir, f"weights_99.{weights_ext}")
        target = f"weights_{best_epoch}.{weights_ext}"
        if os.path.islink(link) or os.path.exists(link):
            os.remove(link)
        os.symlink(target, link)
        log(f"> weights_99.{weights_ext} -> {target}")

        basecalls = os.path.join(model_dir, "basecalls")
        best_dir = f"basecalls-weights_{best_epoch}"
        if os.path.islink(basecalls):
            os.remove(basecalls)
        if not os.path.exists(basecalls):
            os.symlink(best_dir, basecalls)
            log(f"> basecalls -> {best_dir}")
    return best_epoch

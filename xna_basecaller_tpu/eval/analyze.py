"""UB evaluation engine: per-position error rates and UB-detection metrics.

Re-implements the reference's analyze_paf (reference: src/tools/
analyze_paf.py:538-1051 + the error-rate machinery in src/misc/utils.py):
barcode demux filtering, strand filtering (X reads are F, Y reads are R,
analyze_paf.py:652-658), per-read error vectors with UB-indel polish,
per-(target,strand) positional error rates, UB-distance-sliced statistics,
FPR/FDR/F1/F2, and the results_summ CSV family (+ -by_tar, -by_tar_pos).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from xna_basecaller_tpu.core.alphabet import reverse_complement_str
from xna_basecaller_tpu.eval import cs_align
from xna_basecaller_tpu.eval.xna_refs import EXP_REF_MAP, XnaRefs


def compute_stats_error_rate(error_rate, x_positions, kmer_len: int = 6,
                             max_dist: int = 10) -> dict[str, np.ndarray]:
    """Slice positional error rates by distance to UBs
    (reference analyze_paf.py:111-190)."""
    if len(x_positions) == 0:
        raise ValueError("x_positions is empty: " + str(x_positions))
    error_rate = np.asarray(error_rate)
    cuts = {}
    no_ub = np.ones(len(error_rate), bool)
    influence = np.zeros(len(error_rate), bool)
    for p in x_positions:
        influence[max(0, p + 1 - kmer_len): p + kmer_len] = True
    for p in x_positions:
        no_ub[p] = False
        influence[p] = True
    cuts["only_ub"] = error_rate[~no_ub]
    cuts["no_ub"] = error_rate[no_ub]
    cuts["outside_ub_area"] = error_rate[~influence]
    cuts["inside_ub_area"] = error_rate[influence & no_ub]
    cuts["ub_and_ub_area"] = error_rate[influence]
    positions = np.arange(len(error_rate))
    dists = np.array([min(abs(p - x) for x in x_positions)
                      for p in positions])
    for d in range(1, max_dist + 1):
        cuts[f"dist_ub_d-{d}"] = error_rate[dists == d]
    cuts[f"dist_ub_d-{max_dist + 1}+"] = error_rate[dists >= max_dist + 1]
    return cuts


def _oriented_read_seq(rec: dict, seq: str) -> str:
    """Aligned read sub-sequence in target-forward orientation
    (reference data_io.get_read_seq with read_info)."""
    sub = seq[rec["read_start"]:rec["read_end"]]
    if rec["strand"] in ("-", "R"):
        sub = reverse_complement_str(sub)
    return sub


def add_barcode_info(paf_df: pd.DataFrame, refs: XnaRefs,
                     reads: dict[str, str],
                     n_relax_bases: int = 3) -> pd.DataFrame:
    """Append barcode columns (reference utils.add_barcode_info:1436)."""
    rows = []
    for _, rec in paf_df.iterrows():
        barcode = refs.barcodes[rec["target_id"]]
        info = cs_align.barcode_match(
            rec, reads[rec["read_id"]], refs.left_primer_len, barcode,
            n_relax_bases=n_relax_bases)
        info["barcode"] = barcode
        info["barcode_cnt"] = refs.barcodes_cnt[rec["target_id"]]
        rows.append(info)
    bc_df = pd.DataFrame(rows, index=paf_df.index)
    return pd.concat([paf_df, bc_df], axis=1)


def tar_reads_count(paf_df: pd.DataFrame, targets_id,
                    agg_min_strands: bool = True) -> pd.DataFrame:
    """Per-(target, strand) read counts, zero-filled over the full template
    list; with agg_min_strands keep each target's minimum-count strand
    (reference utils.get_tar_reads_count:1546-1628)."""
    counts = paf_df.groupby(["target_id", "strand"]).size().rename("n_read")
    full = pd.DataFrame({
        "target_id": 2 * list(targets_id),
        "strand": len(targets_id) * ["F"] + len(targets_id) * ["R"],
        "n_read": 0,
    }).set_index(["target_id", "strand"])
    full.update(counts.to_frame())
    full = full.astype(int).reset_index().sort_values(
        ["target_id", "n_read"])
    if agg_min_strands:
        full = full.drop_duplicates("target_id", ignore_index=True)
    return full


def read_confusion_matrix(errors_tm: np.ndarray, target: str,
                          strand: str) -> np.ndarray:
    """Per-read base confusion counts over the full-length aligned read
    (reference analyze_paf.compute_read_confusion_matrix:520-536): rows are
    the true bases A,T,C,G,X,Y, columns the called A,T,C,G,X,Y,- (deletion).
    """
    from sklearn.metrics import confusion_matrix as _cm

    tm = "".join(errors_tm)
    if strand in ("-", "R"):
        tm = reverse_complement_str(tm)
        target = reverse_complement_str(target)
    cm = _cm(list(target), list(tm),
             labels=["A", "T", "C", "G", "X", "Y", "-"])
    return cm[:-1, :]  # drop the '-' true-base row


def analyze_paf(exp_name: str, paf_records, reads: dict[str, str],
                max_bc_dist: int | None = None, ubs: str = "XY",
                only_strand: str | None = None, max_dist: int = 4,
                out_dir: str | None = None, out_prefix: str = "results_summ",
                refs: XnaRefs | None = None, polish: bool = True,
                save_detailed_perf: bool = True,
                save_perf_per_read: bool = False,
                targets_list=None, include_list=None,
                min_reads_count: int | None = None, debug: bool = False,
                save_confusion_matrix: bool = False,
                read_quals: dict | None = None,
                oracle_demux: bool = False,
                log=print) -> dict:
    """Full evaluation; returns the summary dict and writes the CSV family.

    paf_records: list of PAF record dicts (eval.ref_align format).
    reads: read_id -> basecalled sequence (the fastq content).
    targets_list / include_list: optional target-id / read-id whitelists
    (reference analyze_paf.py:605-619); min_reads_count reports templates
    with insufficient reads and writes ``{prefix}-missing_templates.txt``
    (reference analyze_paf.py:694-706); debug analyzes only the first 1000
    alignments (analyze_paf.py:580-584); save_confusion_matrix writes the
    summed base confusion matrix as ``{prefix}-confusion_matrix.npy``
    (analyze_paf.py:728-737); read_quals (read_id -> phred array) adds
    mapped-region mean q-scores (analyze_paf.py:667-680).
    """
    ref_name = EXP_REF_MAP.get(exp_name, exp_name)
    refs = refs or XnaRefs(ref_name)
    paf_df = pd.DataFrame(list(paf_records))
    n_total_reads = max(len(reads), 1)
    if debug and len(paf_df) > 1000:
        log("[Warning] debug: using the first 1000 alignments")
        paf_df = paf_df.head(1000).copy()
    align_cnt = paf_df["read_id"].nunique() if len(paf_df) else 0
    log(f"* paf contains {align_cnt:,d} reads ({len(paf_df):,d} alignments)")

    if len(paf_df) == 0:
        return {"num_aligned_reads": 0}
    if targets_list is not None:
        paf_df = paf_df[paf_df["target_id"].isin(set(targets_list))]
        paf_df = paf_df.reset_index(drop=True)
        log(f"* after targets_list filter: {len(paf_df):,d} alignments")
    if include_list is not None:
        paf_df = paf_df[paf_df["read_id"].isin(set(include_list))]
        paf_df = paf_df.reset_index(drop=True)
        log(f"* after include_list filter: {len(paf_df):,d} alignments")
    if len(paf_df) == 0:
        return {"num_aligned_reads": 0}
    paf_df["is_pc"] = paf_df["target_id"].str.startswith("PC")
    paf_df["type"] = np.where(paf_df["is_pc"], "PC", "XNA")
    paf_df["read_alignment_length"] = (
        paf_df["read_end"] - paf_df["read_start"])

    demux_cnt = align_cnt
    demux_match_acc = None
    if oracle_demux:
        # Simulation oracle: the simulator names eval reads
        # "{target_id}_{i}" (data/simulate.py sim_library_reads), so the
        # true target of every read is known.  Bypassing barcode
        # assignment decomposes held-out ub_acc into demux-misassignment
        # vs UB-calling error; the real demux's per-read assignment
        # accuracy is measured alongside (reference demux gate:
        # eval_model.sh:64-68).
        tids = sorted(refs.targets_id, key=len, reverse=True)

        def _true_tid(rid):
            for t in tids:
                if rid.startswith(t + "_"):
                    return t
            return None

        true_map = {rid: _true_tid(rid)
                    for rid in paf_df["read_id"].unique()}
        if any(v is None for v in true_map.values()):
            n_bad = sum(v is None for v in true_map.values())
            log(f"[Warning] oracle demux: {n_bad} read ids carry no "
                "known target prefix (non-simulated reads?)")
        if max_bc_dist is not None:
            bc_df = add_barcode_info(paf_df.copy(), refs, reads)
            bc_df = bc_df[bc_df["barcode_distance"] <= max_bc_dist]
            bc_df = bc_df[bc_df["barcode_distance"] ==
                          bc_df.groupby("read_id")["barcode_distance"]
                          .transform("min")]
            sel = bc_df.groupby("read_id")["target_id"].agg(set)
            ok = [true_map.get(r) in s for r, s in sel.items()]
            demux_match_acc = (100 * float(np.mean(ok)) if ok
                               else float("nan"))
            log(f"* real-demux assignment accuracy: {demux_match_acc:.2f}"
                f"% of {len(ok):,d} demuxed reads")
        mask = np.asarray(
            [true_map.get(r) == t
             for r, t in zip(paf_df["read_id"], paf_df["target_id"])],
            bool)
        paf_df = paf_df[mask].reset_index(drop=True)
        demux_cnt = paf_df["read_id"].nunique()
        log(f"* After ORACLE demux: {demux_cnt:,d}")
    elif max_bc_dist is not None:
        log("Adding barcode information...")
        paf_df = add_barcode_info(paf_df, refs, reads)
        paf_df = paf_df[paf_df["barcode_distance"] <= max_bc_dist]
        paf_df = paf_df[paf_df["barcode_distance"] ==
                        paf_df.groupby("read_id")["barcode_distance"]
                        .transform("min")]
        paf_df = paf_df.reset_index(drop=True)
        demux_cnt = paf_df["read_id"].nunique()
        log(f"* After demux (max_bc_dist {max_bc_dist}): {demux_cnt:,d}")

    if len(paf_df) == 0:
        return {"num_aligned_reads": 0}

    paf_df["strand"] = paf_df["strand"].replace({"+": "F", "-": "R"})
    if ubs != "XY":
        only_strand = dict(X="F", Y="R")[ubs]
    if only_strand is not None:
        paf_df = paf_df[paf_df["strand"] == only_strand].reset_index(
            drop=True)
    if len(paf_df) == 0:
        return {"num_aligned_reads": 0}

    if min_reads_count is not None:
        count_df = tar_reads_count(paf_df, refs.targets_id)
        missing = count_df[count_df["n_read"] <= min_reads_count]
        log(f"Number of missing templates (<= {min_reads_count} reads "
            f"F and/or R): {len(missing)}")
        if out_dir is not None and len(missing):
            os.makedirs(out_dir, exist_ok=True)
            missing["target_id"].to_csv(
                os.path.join(out_dir,
                             out_prefix + "-missing_templates.txt"),
                header=False, index=False)

    if read_quals is not None:
        paf_df["mean_q_score"] = [
            float(np.mean(np.asarray(read_quals[r["read_id"]])
                          [r["read_start"]:r["read_end"]]))
            for _, r in paf_df.iterrows()]
        with pd.option_context("display.float_format", "{:.1f}".format):
            log(paf_df.groupby("strand")["mean_q_score"].describe(
                percentiles=[.01, .05, .10, .25]))

    # per-read errors + UB metrics
    errors_by_key: dict[tuple, list[np.ndarray]] = {}
    metric_rows = []
    n_match_est = []
    cm_total = np.zeros((6, 7), np.int64) if save_confusion_matrix else None
    for _, rec in paf_df.iterrows():
        tid = rec["target_id"]
        target = refs.targets[tid]
        if not rec["is_pc"]:
            target = target.replace("N", "X")
        seq = _oriented_read_seq(rec, reads[rec["read_id"]])
        errors, tm = cs_align.compute_errors(
            rec, target, read_seq=seq, polish=polish)
        m = cs_align.ub_metrics(errors, tm, target, rec)
        metric_rows.append(m)
        n_match_est.append(len(errors) - errors.sum())
        errors_by_key.setdefault((tid, rec["strand"]), []).append(errors)
        if cm_total is not None:
            cm_total += read_confusion_matrix(tm, target, rec["strand"])

    metrics_df = pd.DataFrame(metric_rows, index=paf_df.index)
    paf_df = pd.concat([paf_df, metrics_df], axis=1)
    paf_df["read_acc"] = np.asarray(n_match_est) \
        / paf_df["read_alignment_length"]
    paf_df["target_acc"] = np.asarray(n_match_est) / paf_df["target_length"]

    # per-(target,strand) positional error rates -> distance-sliced frame
    rows = []
    for (tid, strand), errs in errors_by_key.items():
        err_rate = np.nanmean(np.stack(errs), axis=0) * 100
        is_pc = tid.startswith("PC")
        xna_tid = refs.get_complement_target_id(tid) if is_pc else tid
        x_positions = (refs.x_pos[xna_tid] if strand == "F"
                       else refs.x_pos_rev[xna_tid])
        if not x_positions:
            continue
        cuts = compute_stats_error_rate(err_rate, x_positions,
                                        max_dist=max(10, max_dist))
        for label, values in cuts.items():
            for v in values:
                rows.append((xna_tid, label, v, is_pc, strand,
                             "PC" if is_pc else "XNA"))
    err_df = pd.DataFrame(rows, columns=[
        "target_id", "label", "error_rates", "is_pc", "strand", "type"])

    err_summary = err_df.groupby(["type", "label"])["error_rates"].mean()

    def _err(label):
        try:
            return float(err_summary.loc[("XNA", label)])
        except KeyError:
            return float("nan")

    summary = {
        "num_aligned_reads": int(paf_df["read_id"].nunique()),
        "target_acc": float(paf_df.loc[~paf_df.is_pc, "target_acc"].mean()
                            * 100),
        "read_acc": float(paf_df.loc[~paf_df.is_pc, "read_acc"].mean()
                          * 100),
        "err_far_ub": _err("outside_ub_area"),
        "err_close_ub": _err("inside_ub_area"),
        "err_only_ub": _err("only_ub"),
    }
    for d in range(1, max_dist + 1):
        summary[f"err_ub_d_{d}"] = _err(f"dist_ub_d-{d}")
    summary["acc_xna"] = float(
        paf_df.loc[~paf_df.is_pc, "percent_match"].mean() * 100)
    pc_mask = paf_df.is_pc
    summary["acc_pc"] = float(
        paf_df.loc[pc_mask, "percent_match"].mean() * 100) \
        if pc_mask.any() else float("nan")
    summary["ub_acc"] = 100 - summary["err_only_ub"]
    summary["ub_area_acc"] = 100 - summary["err_close_ub"]
    summary["demux"] = 100 * demux_cnt / n_total_reads
    summary["align"] = 100 * align_cnt / n_total_reads
    if oracle_demux:
        summary["oracle_demux"] = True
        if demux_match_acc is not None:
            summary["demux_match_acc"] = demux_match_acc

    # detection stats (reference analyze_paf.py:986-1022)
    mean_fpr = float(paf_df["fpr"].mean())
    mean_fdr = float(paf_df["fdr"].mean())
    summary["specificity"] = 100 * (1 - mean_fpr)
    summary["precision"] = 100 * (1 - mean_fdr) if np.isfinite(mean_fdr) \
        else float("nan")
    tp = int(paf_df["true_pos"].sum())
    fn = int(paf_df["false_neg"].sum())
    fp = int(paf_df["false_pos"].sum())
    tn = int(paf_df["true_neg"].sum())
    recall = tp / (tp + fn) if tp + fn else 0.0
    precision = tp / (tp + fp) if tp + fp else 0.0
    summary["f1_score"] = 100 * (2 * tp / (2 * tp + fp + fn)
                                 if tp + fp + fn else 0.0)
    beta = 2
    summary["f2_score"] = 100 * (
        (1 + beta ** 2) * precision * recall
        / (beta ** 2 * precision + recall)
        if precision + recall > 0 else 0.0)
    summary.update(true_pos=tp, false_neg=fn, false_pos=fp, true_neg=tn)
    # Wilson 95% CI on ub_acc: each aligned XNA read contributes one
    # Bernoulli observation per UB site (n = tp + fn sites), so the
    # interval tells whether the point estimate is statistically
    # distinguishable from a target band at this eval size.
    n_sites = tp + fn
    if n_sites and np.isfinite(summary["ub_acc"]):
        p_hat = summary["ub_acc"] / 100.0
        z = 1.959964
        denom = 1 + z * z / n_sites
        center = (p_hat + z * z / (2 * n_sites)) / denom
        half = (z * np.sqrt(p_hat * (1 - p_hat) / n_sites
                            + z * z / (4 * n_sites * n_sites))) / denom
        summary["ub_acc_ci_lo"] = float(100 * max(0.0, center - half))
        summary["ub_acc_ci_hi"] = float(100 * min(1.0, center + half))
    if read_quals is not None:
        summary["mean_q_score"] = float(paf_df["mean_q_score"].mean())

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        if cm_total is not None:
            np.save(os.path.join(out_dir,
                                 out_prefix + "-confusion_matrix.npy"),
                    cm_total)
        if save_perf_per_read:
            per_read_cols = [c for c in (
                "read_id", "target_id", "strand", "type", "percent_match",
                "read_acc", "target_acc", "ub_acc", "ub_area_acc",
                "non_ub_area_acc", "fdr", "fpr", "barcode_distance",
            ) if c in paf_df.columns]
            paf_df[per_read_cols].to_csv(
                os.path.join(out_dir, out_prefix + "-per_read.csv"),
                index=False, na_rep="nan", float_format="{:.4f}".format)
        pd.DataFrame([summary]).to_csv(
            os.path.join(out_dir, out_prefix + ".csv"), index=False,
            na_rep="nan", float_format="{:.3f}".format)
        if save_detailed_perf:
            by_tar = paf_df.groupby(["target_id", "strand", "type"]).agg(
                ub_acc=("ub_acc", "mean"),
                ub_area_acc=("ub_area_acc", "mean"),
                non_ub_area_acc=("non_ub_area_acc", "mean"),
                percent_match=("percent_match", "mean"),
                read_id=("read_id", "size"),
            ) * 1.0
            for col in ("ub_acc", "ub_area_acc", "non_ub_area_acc",
                        "percent_match"):
                by_tar[col] *= 100
            by_tar.to_csv(os.path.join(out_dir, out_prefix + "-by_tar.csv"),
                          na_rep="nan", float_format="{:.3f}".format)
            # per-UB-position breakdown: written when any target has >1 UB,
            # and then covers ALL XNA rows (reference analyze_paf.py:822-834
            # gates on label_per_pos.apply(len).max() > 1 but aggregates the
            # whole non-PC frame)
            multi = paf_df[~paf_df.is_pc]
            if len(multi) and multi["label_per_pos"].apply(len).max() > 1:
                rows = []
                for (strand, tid), grp in multi.groupby(
                        ["strand", "target_id"]):
                    accs = np.mean(np.stack(
                        grp["ub_acc_per_pos"].to_list()), axis=0)
                    areas = np.mean(np.stack(
                        grp["ub_area_acc_per_pos"].to_list()), axis=0)
                    labels = grp["label_per_pos"].iloc[0]
                    for order, (lab, a, ar) in enumerate(
                            zip(labels, accs, areas), 1):
                        rows.append((strand, tid, lab, order,
                                     100 * a, 100 * ar))
                pd.DataFrame(rows, columns=[
                    "strand", "target_id", "label", "ub_order",
                    "ub_acc", "ub_area_acc"]).to_csv(
                    os.path.join(out_dir, out_prefix + "-by_tar_pos.csv"),
                    index=False, float_format="{:.3f}".format)
    return summary

"""Signal & quality forensics over external artifacts: nanopolish
eventalign tables, demux CSVs, and per-position quality analysis.

Re-designs the research-utility tail of the reference's misc layer
(reference: src/misc/data_io.py — read_eventalign:395, read_demux:323,
read_tsv:600; src/misc/utils.py — slice_eventalign:1630,
reverse_eventalign:1724, invert/extract/count_samples:1803-1833,
extract_seq_samples:1835, filter_demux:1866, get_qual_per_pos:512,
get_ub_area_qual:544, get_all_ub_area_qual:602, get_tar_reads_count:1546).
The reference implementations are row-loop / apply-heavy pandas; these are
vectorised over columns, and the quality mapping works off cs-tag
operations from this framework's aligner (or minimap2) instead of
re-running a Biopython global alignment per read.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

from xna_basecaller_tpu.core.alphabet import reverse_complement_str
from xna_basecaller_tpu.eval.cs_align import parse_cs

# ---------------------------------------------------------------------------
# readers


def read_tsv(path: str) -> pd.DataFrame:
    """Tab-separated table (reference data_io.py:600-609)."""
    return pd.read_csv(path, sep="\t")


def read_demux(path: str, sample_list: str | None = None,
               exclude_list: str | None = None,
               include_list: str | None = None) -> pd.DataFrame:
    """Demultiplexing table keyed by read id (reference data_io.py:323-393):
    normalises the target column name and derives is_pc / type /
    read_alignment_cover / template_coverage when absent."""
    df = pd.read_csv(path, index_col=0)
    if exclude_list is not None:
        df = df[~df.index.isin(read_tsv(exclude_list).read_id)]
    if include_list is not None:
        df = df[df.index.isin(read_tsv(include_list).read_id)]
    if sample_list is not None:
        df = df.loc[read_tsv(sample_list).read_id]
    if "barcode_name" in df:
        df = df.rename(columns={"barcode_name": "target_id"})
    if "is_pc" not in df:
        df["is_pc"] = df.target_id.str.startswith("PC")
    if "type" not in df:
        df["type"] = np.where(df.is_pc, "PC", "XNA")
    if "read_alignment_length" not in df:
        df["read_alignment_length"] = df.read_end - df.read_start
    if "read_alignment_cover" not in df:
        df["read_alignment_cover"] = (
            df.n_matches.astype(float)
            / df.read_alignment_length.astype(float))
    if "template_coverage" not in df:
        df["template_coverage"] = (
            df.read_alignment_length / df.target_length).clip(upper=1)
    return df


def filter_demux(demux_df: pd.DataFrame,
                 read_len_interval: tuple[int, int] | None = None,
                 max_barcode_dist: float | None = None,
                 min_target_cover: float | None = None,
                 use_tpl_coverage: bool = True,
                 min_target_acc: float | None = None,
                 max_ub_area_acc: float | None = None,
                 read_type: str | None = None,
                 output_dir: str | None = None,
                 log=None) -> pd.DataFrame:
    """Chained demux-quality filters (reference utils.py:1866-1955); the
    output filename encodes the applied filters exactly like the
    reference's `demux-k_15-w_5-...csv.gz` convention."""
    df = demux_df
    name = "demux-k_15-w_5"
    steps = []
    if read_type is not None:
        name += f"-{read_type}_only"
        steps.append((f"type == {read_type.upper()}",
                      lambda d: d.type == read_type.upper()))
    if read_len_interval is not None:
        lo, hi = read_len_interval
        name += f"-l_{lo}_{hi}"
        steps.append((f"{lo} <= read_length <= {hi}",
                      lambda d: d.read_length.between(lo, hi)))
    if min_target_cover is not None:
        key = "template_coverage" if use_tpl_coverage else "target_cover"
        name += f"-t_{min_target_cover}" + ("_tpl" if use_tpl_coverage else "")
        steps.append((f"{key} >= {min_target_cover}",
                      lambda d: d[key] >= min_target_cover))
    if max_barcode_dist is not None:
        name += f"-d_{max_barcode_dist}"
        steps.append((f"barcode_distance <= {max_barcode_dist}",
                      lambda d: d.barcode_distance <= max_barcode_dist))
    if min_target_acc is not None:
        name += f"-tar_acc_{min_target_acc}"
        steps.append((f"target_acc >= {min_target_acc}",
                      lambda d: d.target_acc >= min_target_acc))
    if max_ub_area_acc is not None:
        name += f"-ub_area_acc_{max_ub_area_acc}"
        steps.append((f"ub_area_acc <= {max_ub_area_acc}",
                      lambda d: d.ub_area_acc <= max_ub_area_acc))
    for what, pred in steps:
        kept = df[pred(df)]
        if log:
            log(f"filter_demux: {what}: removed {len(df) - len(kept):,d}")
        df = kept
    if output_dir is not None:
        out = os.path.join(output_dir, name + ".csv.gz")
        df.to_csv(out)
        if log:
            log(f"filter_demux: saved {out}")
    return df


def read_eventalign(path: str, sample_list: str | None = None,
                    reverse: bool = False, target_len: int | None = None,
                    target_id_strand: tuple[str, str] | None = None,
                    file_tpl: str = "{}_{}_eventalign.dat.gz",
                    fix_reversed_kmers: bool = True) -> pd.DataFrame:
    """Nanopolish eventalign table (reference data_io.py:395-487).

    Renames contig/read_name to target_id/read_id, optionally filters to a
    read-id sample list, optionally flips `position` to reverse-strand
    coordinates, and repairs reverse-complemented `reference_kmer` values
    on polished rows (NaN event_index) — detected, as in the reference, by
    comparing the k-mer overlap direction of consecutive positions."""
    if target_id_strand is not None:
        path = os.path.join(path, file_tpl.format(*target_id_strand))
    df = pd.read_csv(path, sep="\t")
    df = df.drop(columns=["Unnamed: 0", "Unnamed: 0.1"], errors="ignore")
    df = df.rename(columns={"contig": "target_id", "read_name": "read_id"})
    if sample_list is not None:
        df = df[df.read_id.isin(read_tsv(sample_list).read_id)]
    if reverse:
        if target_len is None:
            raise ValueError("reverse=True requires target_len")
        df["position"] = -df.position + target_len - 1
    if fix_reversed_kmers and df.event_index.isna().any():
        df = _fix_reversed_reference_kmers(df)
    return df


def _fix_reversed_reference_kmers(df: pd.DataFrame) -> pd.DataFrame:
    """Reference data_io.py:436-477: polished UB rows (NaN event_index)
    were sometimes written with reverse-complement k-mers; detect by the
    overlap direction against the next position and fix all such rows."""
    nan_rows = df.index[df.event_index.isna()]
    need_fix = False
    for idx in nan_rows:
        row = df.loc[idx]
        if "N" not in row.reference_kmer or idx + 1 not in df.index:
            continue
        nxt = df.loc[idx + 1]
        if row.position != nxt.position - 1:
            continue
        if row.reference_kmer[:-1] == nxt.reference_kmer[1:]:
            need_fix = True  # k-mer slides the wrong way -> rc'd
        break
    if need_fix:
        mask = df.event_index.isna()
        df = df.copy()
        df.loc[mask, "reference_kmer"] = [
            reverse_complement_str(k) for k in df.loc[mask, "reference_kmer"]]
    return df


# ---------------------------------------------------------------------------
# eventalign transforms


def slice_eventalign(df: pd.DataFrame, refs, target_id: str,
                     kmer_len: int = 6, margin: int = 0,
                     pc_majority: bool = True) -> pd.DataFrame:
    """Rows whose k-mer window covers a UB position (reference
    utils.py:1630-1674); PC targets focus the positions of their XNA
    complement.  With pc_majority, keep only the majority model_kmer per
    position (drops odd NNNNNN events, reference behaviour)."""
    xna_tid = (refs.get_complement_target_id(target_id)
               if target_id.startswith("PC") else target_id)
    focus: set[int] = set()
    for p in refs.x_pos[xna_tid]:
        focus.update(range(p - kmer_len + 1 - margin, p + 1 + margin))
    out = df[df.position.isin(focus)]
    if pc_majority and len(out):
        counts = out.groupby(["position", "model_kmer"]).size()
        keep = counts.sort_values().groupby(level=0).tail(1).index
        out = out[out.set_index(["position", "model_kmer"]).index.isin(keep)]
    return out


def reverse_eventalign(df: pd.DataFrame, target_len: int,
                       kmer_len: int = 6) -> pd.DataFrame:
    """Flip positions to signal (reverse-strand) order (reference
    utils.py:1724-1757)."""
    out = df.copy()
    out["position"] = -df.position + target_len - kmer_len
    return out.sort_values(["read_id", "position", "event_index"],
                           ignore_index=True)


def unreverse_eventalign(df: pd.DataFrame, target_len: int,
                         kmer_len: int = 6) -> pd.DataFrame:
    """Inverse of :func:`reverse_eventalign` (reference utils.py:1759-1788)."""
    out = df.copy()
    out["position"] = -df.position + target_len - kmer_len
    return out.sort_values(["read_id", "position", "event_index"],
                           ascending=[True, True, False], ignore_index=True)


def invert_samples(df: pd.DataFrame) -> pd.DataFrame:
    """Reverse each row's comma-joined signal samples (reference
    utils.py:1803-1822) — used with reverse-strand eventalign."""
    out = df.copy()
    out["samples"] = [",".join(s.split(",")[::-1]) for s in df.samples]
    return out


def extract_samples(df: pd.DataFrame) -> np.ndarray:
    """All signal samples of the rows as one float array (utils.py:1824)."""
    if not len(df):
        return np.empty(0)
    return np.asarray(",".join(df.samples).split(","), dtype=float)


def count_samples(df: pd.DataFrame, sum_all: bool = False):
    """Per-row (or total) sample counts (utils.py:1829-1833)."""
    n = df.samples.str.count(",") + 1
    return int(n.sum()) if sum_all else n


def extract_seq_samples(read_df: pd.DataFrame, x_pos: int,
                        kmer_len: int = 6, margin: int = 3) -> pd.DataFrame:
    """Long-format per-position signal levels around one UB position
    (reference utils.py:1835-1864): one row per raw sample with
    target_id/position/signal_level/is_pc columns."""
    lo, hi = x_pos - kmer_len + 1 - margin, x_pos + margin
    window = read_df[read_df.position.between(lo, hi)]
    target_id = read_df.target_id.iloc[0]
    frames = []
    for position, grp in window.groupby("position"):
        samples = extract_samples(grp)
        frames.append(pd.DataFrame({
            "target_id": grp.target_id.iloc[0],
            "position": position,
            "signal_level": samples,
            "is_pc": target_id.startswith("PC"),
        }))
    if not frames:
        return pd.DataFrame(
            columns=["target_id", "position", "signal_level", "is_pc"])
    return pd.concat(frames, ignore_index=True)


# ---------------------------------------------------------------------------
# quality forensics


def qual_per_pos(reads_df: pd.DataFrame | pd.Series,
                 reads_qual) -> pd.DataFrame:
    """Explode per-read quality arrays into one row per (read, position)
    (reference utils.py:512-542); position is 1-based like the reference."""
    if isinstance(reads_df, pd.Series):
        reads_df = reads_df.to_frame().T
        reads_qual = [reads_qual]
    out = reads_df.copy()
    out["qual_score"] = [np.asarray(q) for q in reads_qual]
    out["position"] = [np.arange(1, len(q) + 1) for q in reads_qual]
    return out.explode(["qual_score", "position"], ignore_index=True)


def _target_to_read_index(record: dict, n_read: int) -> np.ndarray:
    """Map each target position to the nearest aligned read index, from
    the record's cs operations (replaces the reference's global-alignment
    reconstruction + pandas nearest-interpolation, utils.py:569-585)."""
    t_len = record["target_length"]
    idx = np.full(t_len, -1, np.int64)
    t = record["target_start"]
    r = record.get("read_start", 0)
    for op in parse_cs(record["cs"]):
        sym, val = op[0], op[1:]
        if sym in (":", "="):
            ln = int(val) if sym == ":" else len(val)
            idx[t:t + ln] = np.arange(r, r + ln)
            t += ln
            r += ln
        elif sym == "*":
            idx[t] = r
            t += 1
            r += 1
        elif sym == "+":
            r += len(val)
        elif sym == "-":
            t += len(val)
    # nearest-fill unaligned target positions
    aligned = np.flatnonzero(idx >= 0)
    if not len(aligned):
        return idx
    nearest = aligned[np.clip(
        np.searchsorted(aligned, np.arange(t_len)), 0, len(aligned) - 1)]
    left = aligned[np.clip(
        np.searchsorted(aligned, np.arange(t_len)) - 1, 0, len(aligned) - 1)]
    pick = np.where(np.abs(left - np.arange(t_len))
                    <= np.abs(nearest - np.arange(t_len)), left, nearest)
    out = idx.copy()
    out[idx < 0] = idx[pick[idx < 0]]
    return np.clip(out, 0, n_read - 1)


def ub_area_qual(record: dict, read_qual: np.ndarray, ub_pos,
                 margin: int = 5) -> np.ndarray | None:
    """Quality-score windows around each UB position of the aligned target
    (reference get_ub_area_qual, utils.py:544-600).  Returns
    [n_ubs, 2*margin+1] or None when a window falls off the read (the
    reference asserts; callers here can skip such reads)."""
    read_qual = np.asarray(read_qual, float)
    idx = _target_to_read_index(record, len(read_qual))
    rows = []
    for p in ub_pos:
        c = idx[p]
        # strict bounds match the reference's sanity assert (utils.py:592)
        if c - margin <= 0 or c + 1 + margin >= len(read_qual):
            return None
        rows.append(read_qual[c - margin:c + 1 + margin])
    return np.asarray(rows)


def all_ub_area_qual(records, refs, quals: dict[str, np.ndarray],
                     margin: int = 5) -> dict[str, np.ndarray]:
    """UB-area quality windows for every record (reference
    get_all_ub_area_qual, utils.py:602-659); `quals` maps read_id to its
    phred array (e.g. from data.writers.read_fastq_quals)."""
    out = {}
    for rec in records:
        q = quals.get(rec["read_id"])
        if q is None or rec["target_id"] not in refs.x_pos:
            continue
        ub_pos = refs.x_pos[rec["target_id"]]
        if rec.get("strand") in ("-", "R"):
            ub_pos = refs.x_pos_rev[rec["target_id"]]
        if not ub_pos:  # PC templates carry no UBs
            continue
        win = ub_area_qual(rec, q, ub_pos, margin=margin)
        if win is not None:
            out[rec["read_id"]] = win
    return out


# ---------------------------------------------------------------------------
# read-count summaries


def reads_count_per_target(reads_df: pd.DataFrame, targets_id,
                           agg_min_strands: bool = True) -> pd.DataFrame:
    """Per-target read counts split by strand, with zero rows for missing
    templates (reference get_tar_reads_count, utils.py:1546-1628).  With
    agg_min_strands, adds the min(F,R) column the reference uses to judge
    usable per-template depth."""
    df = reads_df
    strand = df.strand.replace({"+": "F", "-": "R"})
    counts = (pd.crosstab(df.target_id, strand)
              .reindex(targets_id, fill_value=0))
    for col in ("F", "R"):
        if col not in counts:
            counts[col] = 0
    counts["total"] = counts["F"] + counts["R"]
    if agg_min_strands:
        counts["min_strands"] = counts[["F", "R"]].min(axis=1)
    return counts


def reads_stats(reads_df: pd.DataFrame, refs=None) -> dict:
    """Aggregate read statistics (reference print_reads_stats,
    utils.py:1505-1544): totals, per-type counts, alignment identity."""
    out = {"n_reads": int(len(reads_df)),
           "n_targets": int(reads_df.target_id.nunique())}
    if "type" in reads_df:
        out.update({f"n_{t.lower()}": int(c) for t, c in
                    reads_df.type.value_counts().items()})
    if "n_matches" in reads_df and "alignment_block_length" in reads_df:
        out["mean_identity"] = float(
            (reads_df.n_matches / reads_df.alignment_block_length).mean())
    if refs is not None:
        counts = reads_count_per_target(reads_df, refs.targets_id)
        out["templates_covered"] = int((counts.total > 0).sum())
        out["min_reads_per_template"] = int(counts.total.min())
    return out

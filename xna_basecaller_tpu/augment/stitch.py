"""Stitch (splice) augmentation: insert real-XNA signal slices, device-side.

TPU-first re-design of the reference's splice augmentation (reference:
ub-bonito/bonito/stitch_chunks.py) — the best-performing training mode and
its documented CPU bottleneck (per-sample pandas candidate search).

Offline (host, once per dataset): ``slice_xna_tables`` scans the real-XNA
ctc-data for single-UB reads and packs the signal slice around each UB into
dense device tables, bucketed exactly like the reference's groupby
(stitch_chunks.py:226-234): per_kmer buckets are (ub, kmer_ub_pos,
template-code) where template is the 5 natural bases before the UB
(base-4 coded); the lookup side reconstructs the same key by rotating the
insert k-mer (stitch_chunks.py:364-377) — valid because the XNA library
templates mirror the 5 bases on both sides of the UB (the per_slice mode's
``x[:5] == x[6:]`` check, stitch_chunks.py:468).

Online (device, jitted + vmapped): choose insert positions (same rules as
spike), pick a UB, and for each of the 6 k-mers covering it gather a
candidate bucket, sample ``cand_sample_size`` candidates and keep the one
closest in length to the local dwell span (stitch_chunks.py:392-407), then
resample it to the span and splice.

Documented deviation: length adaptation resamples each k-mer slice to its
exact local dwell span by linear index mapping (instead of the composite
boundary-aware interp of prepare_slice_chunk, stitch_chunks.py:241-271) —
same intent (no cross-k-mer interpolation), simpler fixed shapes.
The in-window permute transform (transform_chunk, stitch_chunks.py:294-297)
and the noise transforms are both implemented device-side.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xna_basecaller_tpu.data.ctc_data import load_numpy_datasets

KMER_LEN = 6
MAX_KMER_SPAN = 100     # max_kmer_cnt filter (stitch_chunks.py:158-160)
MAX_SPAN = 360          # max spliced signal span (6 k-mers)
N_TPL = 4 ** 5          # 1024 natural 5-base contexts


@dataclass
class StitchTables:
    """Dense per_kmer slice tables.

    signals [2, 6, 1024, cap, MAX_KMER_SPAN] f32 — (ub-5, kmer_ub_pos,
    tpl_code, candidate, samples); lens [..., cap] i32; counts [...] i32.
    """

    signals: np.ndarray
    lens: np.ndarray
    counts: np.ndarray

    @property
    def cap(self) -> int:
        return self.signals.shape[3]


def _tpl_code(bases: np.ndarray) -> int:
    """5 natural base codes (1..4) -> base-4 context code."""
    out = 0
    for b in bases:
        out = out * 4 + (int(b) - 1)
    return out


def slice_xna_tables(xna_ctc_dir: str, cap: int = 32, edge_len: int = 5,
                     max_kmer_cnt: int = MAX_KMER_SPAN,
                     seed: int = 0) -> StitchTables:
    """Scan single-UB XNA ctc-data into dense per_kmer slice tables
    (replaces slice_xna + pandas groupby, stitch_chunks.py:127-239).

    When a bucket overflows ``cap``, reservoir sampling keeps a uniform
    subset (the reference keeps all candidates and samples at lookup time;
    with cap >= cand_sample_size the sampled distribution matches).
    """
    chunks, targets, lengths, bkps = load_numpy_datasets(
        xna_ctc_dir, load_bkps=True)
    rng = np.random.default_rng(seed)
    signals = np.zeros((2, KMER_LEN, N_TPL, cap, MAX_KMER_SPAN), np.float32)
    lens = np.zeros((2, KMER_LEN, N_TPL, cap), np.int32)
    counts = np.zeros((2, KMER_LEN, N_TPL), np.int64)

    for read_idx in range(len(lengths)):
        length = int(lengths[read_idx])
        target = np.asarray(targets[read_idx, :length])
        bkp = np.asarray(bkps[read_idx, :length]).astype(np.int64)
        ub_hits = np.argwhere(target > 4)
        if len(ub_hits) == 0:
            continue
        ub_pos = int(ub_hits[0, 0])  # first UB (reference line 148)
        if not edge_len < ub_pos < length - edge_len:
            continue
        slice_bkp = bkp[ub_pos - KMER_LEN: ub_pos + 1]
        kmer_cnts = np.diff(slice_bkp)
        if max_kmer_cnt and kmer_cnts.max() > max_kmer_cnt:
            continue
        context = target[ub_pos - 5: ub_pos]
        if np.any(context > 4) or np.any(context == 0):
            continue  # multi-UB context or blank: not representable base-4
        tpl = _tpl_code(context)
        ub_idx = int(target[ub_pos]) - 5
        chunk = np.asarray(chunks[read_idx], np.float32)
        for kmer_idx in range(KMER_LEN):
            kmer_ub_pos = KMER_LEN - kmer_idx - 1
            st, en = int(slice_bkp[kmer_idx]), int(slice_bkp[kmer_idx + 1])
            seg = chunk[st:en]
            n = counts[ub_idx, kmer_ub_pos, tpl]
            if n < cap:
                slot = n
            else:  # reservoir
                j = rng.integers(0, n + 1)
                if j >= cap:
                    counts[ub_idx, kmer_ub_pos, tpl] += 1
                    continue
                slot = j
            L = min(len(seg), MAX_KMER_SPAN)
            signals[ub_idx, kmer_ub_pos, tpl, slot, :L] = seg[:L]
            signals[ub_idx, kmer_ub_pos, tpl, slot, L:] = 0
            lens[ub_idx, kmer_ub_pos, tpl, slot] = L
            counts[ub_idx, kmer_ub_pos, tpl] += 1
    return StitchTables(signals, lens,
                        np.minimum(counts, cap).astype(np.int32))


def build_relax_fallback(counts: np.ndarray) -> np.ndarray:
    """[2, 6, 1024] int32: per (ub, kmer_ub_pos), map every context code
    to an OCCUPIED context code — identity where the bucket has donors,
    else the occupied bucket sharing the deepest low-order digit suffix.

    The low-order base-4 digits of a context code are the bases nearest
    the UB on the 5' side (availability_mask builds codes in that order),
    which dominate the pore signal of the central k-mers — so the
    fallback donor's context agrees with the acceptor where it matters
    most.  Sparse-library rescue (``relax`` / --stitch-relax): a
    20-template library like POC occupies 10-27 of 1024 buckets and the
    exact-context match then inserts ~nothing (measured 0.03 UB/chunk,
    results/northstar_poc_r12/DIAGNOSIS.md); with full occupancy (CPLX)
    the fallback is the identity and behavior is unchanged.  The
    reference has no equivalent — its exact-match KeyError skip
    (stitch_chunks.py:392-430) is what starves its own POC quick-run
    (~15% UB acc, README.md:106).
    """
    n_ub, n_kup, n_tpl = counts.shape
    fb = np.tile(np.arange(n_tpl, dtype=np.int32), (n_ub, n_kup, 1))
    for u in range(n_ub):
        for k in range(n_kup):
            occ = np.flatnonzero(counts[u, k] > 0)
            if len(occ) == 0:
                continue  # no donors at all: counts stay 0 either way
            filled = counts[u, k] > 0
            for depth in range(4, -1, -1):
                mod = 4 ** depth
                reps: dict[int, int] = {}
                for o in occ:
                    s = int(o % mod)
                    if s not in reps or counts[u, k, o] > \
                            counts[u, k, reps[s]]:
                        reps[s] = int(o)
                unfilled = np.flatnonzero(~filled)
                for c in unfilled:
                    s = int(c % mod)
                    if s in reps:
                        fb[u, k, c] = reps[s]
                        filled[c] = True
    return fb


def _noise_transform(key, sig, noise_std: float, noise_mode: str):
    """transform_chunk noise modes (stitch_chunks.py:299-319)."""
    if not noise_std:
        return sig
    k1, k2 = jax.random.split(key)
    if noise_mode == "single":
        return sig + jax.random.truncated_normal(
            k1, -3.0, 3.0, sig.shape) * noise_std
    if noise_mode == "single_variable":
        s = jax.random.uniform(k2, (), minval=0.0, maxval=noise_std)
        return sig + jax.random.truncated_normal(k1, -3.0, 3.0, sig.shape) * s
    if noise_mode == "block_add":
        return sig + jax.random.uniform(
            k1, (), minval=-noise_std, maxval=noise_std)
    if noise_mode == "block_mult":
        return sig * (1.0 + jax.random.uniform(
            k1, (), minval=-noise_std, maxval=noise_std))
    raise ValueError(f"Invalid noise mode = {noise_mode}")


def _permute_transform(key, sig, valid_len, win: int):
    """In-window sample permutation (reference transform_chunk,
    stitch_chunks.py:294-297): shuffle samples within fixed-size windows
    of the composed slice, leaving the padding tail in place.  Implemented
    as one argsort over (window_id, random) sort keys — the reference's
    array_split uses near-equal window sizes; fixed windows are the
    fixed-shape equivalent (distributional augmentation, not bit parity).
    """
    idx = jnp.arange(sig.shape[0])
    rand = jax.random.uniform(key, sig.shape)
    sort_key = jnp.where(idx < valid_len,
                         (idx // win).astype(jnp.float32) + rand * 0.99,
                         1e6 + idx.astype(jnp.float32))
    return sig[jnp.argsort(sort_key)]


def availability_mask(target, length, tbl_counts, ub_codes,
                      kmer_len: int = KMER_LEN, tbl_fallback=None):
    """[n_codes, L] bool: positions whose 6 covering-k-mer donor buckets
    are all non-empty, per UB code in ``ub_codes``.

    The reference picks positions blind and falls back unmodified when a
    bucket has no exact-k-mer candidate (stitch_chunks.py:392-430) — cheap
    there because its slice library (~190k reads) covers nearly all 1024
    contexts.  With a bootstrapped (sparser) library, blind picking wastes
    most insertion attempts; masking the choice up front keeps the
    requested UB exposure without relaxing the exact-context match.
    Per-code masks (not ANDed over codes) so a donor table populated for
    only one of the requested codes still yields that code's insertions.
    """
    L = target.shape[0]
    zt = jnp.clip(target - 1, 0, 5)
    natural = (target >= 1) & (target <= 4)
    pos_idx = jnp.arange(L)

    ok = jnp.ones((len(ub_codes), L), bool)
    for ki in range(kmer_len):
        # context code for the k-mer with the UB at kmer_ub_pos = 5-ki:
        # after (t[pos+1 .. pos+ki]) then before (t[pos-(5-ki) .. pos-1])
        ctx = jnp.zeros(L, jnp.int32)
        good = jnp.ones(L, bool)
        rel = [1 + j for j in range(ki)] + \
              [-(kmer_len - 1 - ki) + j for j in range(kmer_len - 1 - ki)]
        for r in rel:
            p = pos_idx + r
            pc = jnp.clip(p, 0, L - 1)
            ctx = ctx * 4 + jnp.clip(zt[pc], 0, 3)
            good = good & natural[pc] & (p >= 0) & (p < length)
        kup = kmer_len - 1 - ki
        for ci, code in enumerate(ub_codes):
            eff = (ctx if tbl_fallback is None
                   else tbl_fallback[code - 5, kup, ctx])
            ok = ok.at[ci].set(
                ok[ci] & good & (tbl_counts[code - 5, kup, eff] > 0))
    return ok


@partial(jax.jit, static_argnames=("prop_ubs", "max_stitches", "pad",
                                   "cand_sample_size", "ub_codes",
                                   "noise_std", "noise_mode",
                                   "permute_win_size"))
def stitch_batch(key, chunks, targets, lengths, breakpoints,
                 tbl_signals, tbl_lens, tbl_counts,
                 prop_ubs: float = 0.10, max_stitches: int = 64,
                 pad: int = 5, cand_sample_size: int = 5,
                 ub_codes: tuple = (5, 6), noise_std: float = 0.0,
                 noise_mode: str = "single", weight_table=None,
                 permute_win_size: int = 0, tbl_fallback=None):
    """Vectorised per_kmer stitch over a batch; returns
    (chunks', targets', success [B] bool).

    ``weight_table`` [6, 1024] enables k-mer-frequency-weighted insert
    position picking (reference weighted_pos_pick, stitch_chunks.py:46).
    """
    if pad < KMER_LEN - 1:
        # picks are only guaranteed pad+1 apart; the single-scatter write
        # needs the [bkps[pos-6], bkps[pos]) spans pairwise disjoint
        raise ValueError(
            f"stitch pad must be >= {KMER_LEN - 1} (got {pad}): smaller "
            "pads allow overlapping insertion spans")
    B, T = chunks.shape
    keys = jax.random.split(key, B)

    def one(k, c, t, l, b):
        return _stitch_one(k, c, t, l, b, tbl_signals, tbl_lens, tbl_counts,
                           prop_ubs, max_stitches, pad, cand_sample_size,
                           ub_codes, noise_std, noise_mode, T,
                           targets.shape[1], weight_table, permute_win_size,
                           tbl_fallback)

    return jax.vmap(one)(keys, chunks, targets, lengths, breakpoints)


def _stitch_one(key, chunk, target, length, bkps, tbl_signals, tbl_lens,
                tbl_counts, prop_ubs, max_stitches, pad, cand_sample_size,
                ub_codes, noise_std, noise_mode, T, L, weight_table=None,
                permute_win_size: int = 0, tbl_fallback=None):
    from xna_basecaller_tpu.augment.spike import _choose_positions

    k_pos, k_ub, k_cand, k_noise = jax.random.split(key, 4)
    pos_idx = jnp.arange(L)
    in_len = pos_idx < length
    bkps = jnp.where(in_len, bkps, T + 1)

    is_ub = (target > 4) & in_len
    width = 4 * pad + 1
    dil = jnp.convolve(is_ub.astype(jnp.float32),
                       jnp.ones((width,), jnp.float32), mode="same")
    ub_window = dil > 0

    n_existing = is_ub.sum()
    n_pos = jnp.maximum(
        jnp.round(length * prop_ubs).astype(jnp.int32) - n_existing, 1)
    n_pos = jnp.minimum(n_pos, max_stitches)
    avail = availability_mask(target, length, tbl_counts, ub_codes,
                              tbl_fallback=tbl_fallback)
    pos_w = avail.any(axis=0).astype(jnp.float32)
    if weight_table is not None:
        pos_w = pos_w * position_weights(target, length, weight_table)
    picks = _choose_positions(k_pos, length, n_pos, max_stitches, pad,
                              ub_window, L, weights=pos_w)
    picked = picks >= 0
    safe_picks = jnp.clip(picks, 0, L - 1)

    # UB code per stitch: uniform over the codes actually available at
    # the picked position (a one-code donor table still inserts that code)
    codes = jnp.asarray(ub_codes, jnp.int32)
    code_ok = avail[:, safe_picks].T                  # [M, n_codes]
    r_code = jax.random.uniform(k_ub, (max_stitches, len(ub_codes)))
    r_code = jnp.where(code_ok, r_code, 2.0)
    ub_choice = jnp.argmin(r_code, axis=1)
    spiked_ubs = codes[ub_choice]                     # [M]

    zt = jnp.clip(target - 1, 0, 5)  # 0-based base codes
    cap = tbl_lens.shape[3]
    M = max_stitches

    # ------------------------------------------------------------------
    # All insertions are computed as one batched block (positions from
    # _choose_positions are >= pad+1 apart, so their half-open signal
    # spans [bkps[pos-6], bkps[pos]) are pairwise disjoint and a single
    # masked scatter replaces the former sequential fori_loop — ~3x
    # cheaper on TPU where tiny per-iteration VPU steps don't pipeline).
    # ------------------------------------------------------------------
    pos = safe_picks                                   # [M]
    ub_idx = spiked_ubs - 5                            # [M]

    ins_st = bkps[jnp.clip(pos - KMER_LEN, 0, L - 1)]  # [M]
    ins_en = bkps[pos]                                 # [M]

    # per-k-mer dwell spans from the original read's breakpoints
    kb = bkps[jnp.clip(pos[:, None] - KMER_LEN
                       + jnp.arange(KMER_LEN + 1)[None, :], 0, L - 1)]
    reps = jnp.clip(jnp.diff(kb, axis=1), 1, MAX_KMER_SPAN)      # [M, 6]

    # context codes for each covering k-mer (rotated template):
    # tpl(kmer_idx) = target[pos+1 .. pos+kmer_idx]
    #               + target[pos-(5-kmer_idx) .. pos-1], base-4
    rel = np.array([[1 + j for j in range(ki)]
                    + [-(KMER_LEN - 1 - ki) + j
                       for j in range(KMER_LEN - 1 - ki)]
                    for ki in range(KMER_LEN)])        # [6, 5] static
    ctx = jnp.clip(zt[jnp.clip(pos[:, None, None] + rel[None], 0, L - 1)],
                   0, 3)                               # [M, 6, 5]
    tpls = ((((ctx[..., 0] * 4 + ctx[..., 1]) * 4 + ctx[..., 2]) * 4
             + ctx[..., 3]) * 4 + ctx[..., 4])         # [M, 6]
    kmer_ub_pos = jnp.arange(KMER_LEN - 1, -1, -1)     # [6]
    if tbl_fallback is not None:
        # sparse-library rescue: redirect empty exact-context buckets to
        # the deepest-suffix occupied bucket (identity when occupied)
        tpls = tbl_fallback[ub_idx[:, None], kmer_ub_pos[None, :], tpls]

    # candidate selection per (stitch, k-mer): sample cand_sample_size
    # from the bucket, keep the closest in length to the local dwell span
    cnt = tbl_counts[ub_idx[:, None], kmer_ub_pos[None, :], tpls]  # [M,6]
    valid = jnp.arange(cap)[None, None, :] < cnt[..., None]    # [M,6,cap]
    r = jax.random.uniform(k_cand, (M, KMER_LEN, cap))
    r = jnp.where(valid, r, 1e9)
    order = jnp.argsort(r, axis=-1)[..., :cand_sample_size]    # [M,6,S]
    cl_full = tbl_lens[ub_idx[:, None], kmer_ub_pos[None, :], tpls]
    cl = jnp.take_along_axis(cl_full, order, axis=-1)          # [M,6,S]
    sampled_valid = jnp.take_along_axis(valid, order, axis=-1)
    diff = jnp.where(sampled_valid,
                     jnp.abs(cl - reps[..., None]), 10 ** 6)
    best = jnp.take_along_axis(
        order, jnp.argmin(diff, axis=-1)[..., None], axis=-1)[..., 0]
    all_ok = jnp.all(cnt > 0, axis=-1)                 # [M]
    do_it = picked & all_ok                            # [M]

    src_sig = tbl_signals[ub_idx[:, None], kmer_ub_pos[None, :],
                          tpls, best]                  # [M, 6, MAXK]
    src_len = jnp.take_along_axis(cl_full, best[..., None],
                                  axis=-1)[..., 0]     # [M, 6]

    # compose each span: k-mer slices resampled to their dwell spans.
    # Boundary-aware linear resampling: linear interpolation WITHIN the
    # k-mer only — the reference's composite interpolation builds
    # per-kmer linspace sample points for exactly this reason ("Avoid
    # interpolation between different kmers", stitch_chunks.py:247-261);
    # fractional positions are lerped like its np.interp, never across
    # a k-mer boundary.
    offsets = jnp.concatenate(
        [jnp.zeros((M, 1), reps.dtype), jnp.cumsum(reps, axis=1)], axis=1)
    total = offsets[:, -1]                             # [M]
    samp = jnp.arange(MAX_SPAN)
    which = jnp.clip(
        jnp.sum(samp[None, :, None] >= offsets[:, None, 1:-1], axis=-1),
        0, KMER_LEN - 1)                               # [M, MAX_SPAN]
    off_g = jnp.take_along_axis(offsets, which, axis=1)
    within = samp[None, :] - off_g                     # [M, MAX_SPAN]
    reps_g = jnp.take_along_axis(reps, which, axis=1)
    len_g = jnp.take_along_axis(src_len, which, axis=1)
    pos_f = within * len_g / jnp.maximum(reps_g, 1)
    i0 = jnp.clip(jnp.floor(pos_f).astype(jnp.int32), 0, MAX_KMER_SPAN - 1)
    i1 = jnp.minimum(i0 + 1, jnp.maximum(len_g - 1, 0))
    frac = jnp.clip(pos_f - i0, 0.0, 1.0)
    m_idx = jnp.arange(M)[:, None]
    span_sig = (src_sig[m_idx, which, i0] * (1.0 - frac)
                + src_sig[m_idx, which, i1] * frac)    # [M, MAX_SPAN]

    if permute_win_size or noise_std:
        t_keys = jax.random.split(k_noise, 2 * M).reshape(M, 2, -1)
        if permute_win_size:
            span_sig = jax.vmap(
                lambda k, s, t: _permute_transform(k, s, t,
                                                   permute_win_size)
            )(t_keys[:, 1, 0], span_sig, total)
        if noise_std:
            span_sig = jax.vmap(
                lambda k, s: _noise_transform(k, s, noise_std, noise_mode)
            )(t_keys[:, 0, 0], span_sig)

    # one masked scatter for all spans (disjoint; masked lanes -> drop)
    write_len = jnp.minimum(total, ins_en - ins_st)    # [M]
    write_mask = (samp[None, :] < write_len[:, None]) & do_it[:, None]
    tgt_idx = jnp.where(write_mask, ins_st[:, None] + samp[None, :], T)
    out_chunk = chunk.at[tgt_idx.reshape(-1)].set(
        span_sig.reshape(-1).astype(chunk.dtype), mode="drop")
    tpos = jnp.where(do_it, pos, L)
    out_target = target.at[tpos].set(spiked_ubs, mode="drop")
    return out_chunk, out_target, do_it.any()


_UB_CODE_MAP = {"X": (5,), "Y": (6,), "XY": (5, 6)}


def make_stitch_augment(xna_ctc_dir: str, ubs: str = "XY",
                        prop_ubs: float = 0.10, cand_sample_size: int = 5,
                        cap: int = 32, noise_std: float = 0.0,
                        noise_mode: str = "single",
                        tables: StitchTables | None = None,
                        weighted_pos_pick: bool = False,
                        weights_dir: str | None = None,
                        permute_win_size: int = 0, pad: int = 5,
                        relax: bool = False):
    """Build a ChunkDataset-compatible augment closure (stitch then done).

    Pass a precomputed ``tables`` to skip the ctc-data scan (e.g. in
    tests); otherwise the xna_ctc_dir is sliced once at build time, like
    the reference's slice_xna pre-index (data.py:24-26).
    """
    if tables is None:
        tables = slice_xna_tables(xna_ctc_dir, cap=cap)
    sig = jnp.asarray(tables.signals)
    lens = jnp.asarray(tables.lens)
    counts = jnp.asarray(tables.counts)
    ub_codes = _UB_CODE_MAP[ubs]
    fallback = None
    if relax:
        fallback = jnp.asarray(
            build_relax_fallback(np.asarray(tables.counts)))
    weight_table = None
    if weighted_pos_pick:
        weight_table = jnp.asarray(load_kmer_weight_table(
            weights_dir or xna_ctc_dir))

    def augment(chunks, targets, lengths, breakpoints, rng):
        seed = int(rng.integers(0, 2 ** 31 - 1))
        key = jax.random.key(seed)
        c, t, _ = stitch_batch(
            key, jnp.asarray(chunks), jnp.asarray(targets, jnp.int32),
            jnp.asarray(lengths, jnp.int32),
            jnp.asarray(breakpoints, jnp.int32),
            sig, lens, counts,
            prop_ubs=prop_ubs, cand_sample_size=cand_sample_size,
            ub_codes=ub_codes, noise_std=noise_std, noise_mode=noise_mode,
            weight_table=weight_table, permute_win_size=permute_win_size,
            pad=pad, tbl_fallback=fallback)
        return np.asarray(c), np.asarray(t)

    return augment


# ---------------------------------------------------------------------------
# k-mer-frequency-weighted insert position picking
# (reference load_kmers_weight + choose_positions_weighted,
#  stitch_chunks.py:26-102)

def count_kmers(ctc_dir: str, kmer_len: int = KMER_LEN,
                out_csv: bool = True):
    """Count natural 6-mers in a ctc-data directory's references and write
    ``kmer_count-len_6.csv`` (the artifact the reference expects,
    SURVEY §2.5).  Returns {kmer_code(base-4): count}."""
    import os
    _, targets, lengths = load_numpy_datasets(ctc_dir)[:3]
    counts = np.zeros(4 ** kmer_len, np.int64)
    pows = 4 ** np.arange(kmer_len - 1, -1, -1)
    for i in range(len(lengths)):
        t = np.asarray(targets[i, : int(lengths[i])], np.int64)
        valid = (t >= 1) & (t <= 4)
        z = t - 1
        for s in range(len(t) - kmer_len + 1):
            win = slice(s, s + kmer_len)
            if valid[win].all():
                counts[int((z[win] * pows).sum())] += 1
    if out_csv:
        from xna_basecaller_tpu.core.alphabet import BASES
        path = os.path.join(ctc_dir, f"kmer_count-len_{kmer_len}.csv")
        with open(path, "w") as fh:
            fh.write("kmer,cnt\n")
            for code in np.nonzero(counts)[0]:
                kmer = ""
                c = int(code)
                for _ in range(kmer_len):
                    kmer = BASES[1 + c % 4] + kmer
                    c //= 4
                fh.write(f"{kmer},{counts[code]}\n")
    return counts


def load_kmer_weight_table(ctc_dir: str,
                           kmer_len: int = KMER_LEN) -> np.ndarray:
    """Balanced N-kmer weights as a dense [kmer_len, 4**(kmer_len-1)] table.

    Mirrors reference load_kmers_weight (stitch_chunks.py:26-44): each
    6-mer contributes its count to the 6 N-substituted variants; weight =
    (total / (n_groups * group_count)) ** 2.  Index: (N position within
    the k-mer, base-4 code of the 5 natural bases in order).
    """
    import os
    path = os.path.join(ctc_dir, f"kmer_count-len_{kmer_len}.csv")
    if not os.path.exists(path):
        count_kmers(ctc_dir, kmer_len)
    n_ctx = 4 ** (kmer_len - 1)
    sums = np.zeros((kmer_len, n_ctx), np.float64)
    from xna_basecaller_tpu.core.alphabet import CODE
    with open(path) as fh:
        header = fh.readline()
        for line in fh:
            kmer, cnt = line.strip().split(",")
            cnt = float(cnt)
            codes = [CODE[c] - 1 for c in kmer]
            for p in range(kmer_len):
                ctx = 0
                for q, b in enumerate(codes):
                    if q == p:
                        continue
                    ctx = ctx * 4 + b
                sums[p, ctx] += cnt
    n_groups = (sums > 0).sum()
    total = sums.sum() / kmer_len  # each kmer counted once per N position
    with np.errstate(divide="ignore"):
        w = np.where(sums > 0, total * kmer_len / (n_groups * sums), 0.0)
    return (w ** 2).astype(np.float32)


def position_weights(target, length, weight_table, kmer_len: int = KMER_LEN):
    """Per-position insert weights [L]: geometric mean of the 6 N-kmer
    weights covering each position (stitch_chunks.py:53-73); 0 at edges
    and where any covering k-mer leaves the natural alphabet."""
    L = target.shape[0]
    zt = jnp.clip(target - 1, 0, 5)
    natural = (target >= 1) & (target <= 4)
    pos_idx = jnp.arange(L)

    log_w_sum = jnp.zeros(L)
    ok = jnp.ones(L, bool)
    for kmer_idx in range(kmer_len):
        # k-mer covering pos with N at kmer_ub_pos = kmer_len-1-kmer_idx
        kup = kmer_len - 1 - kmer_idx
        ctx = jnp.zeros(L, jnp.int32)
        good = jnp.ones(L, bool)
        for j in range(kmer_len):
            if j == kup:
                continue
            p = pos_idx - kup + j
            pc = jnp.clip(p, 0, L - 1)
            ctx = ctx * 4 + jnp.clip(zt[pc], 0, 3)
            good = good & natural[pc] & (p >= 0) & (p < length)
        w = weight_table[kup][ctx]
        ok = ok & good & (w > 0)
        log_w_sum = log_w_sum + jnp.log(jnp.maximum(w, 1e-30))
    weights = jnp.exp(log_w_sum / kmer_len)
    in_range = (pos_idx >= kmer_len - 1) & (pos_idx < length - kmer_len + 1)
    return jnp.where(ok & in_range, weights, 0.0)

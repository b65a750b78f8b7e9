"""Spike augmentation: synthetic-signal UB insertion, device-side.

TPU-first re-design of the reference's per-item CPU augmentation
(reference: ub-bonito/bonito/spike_chunks.py) — the documented training
bottleneck (reference README.md:116 recommends 32 worker processes).  Here
the whole batch is augmented by one jitted, vmapped transform:

* UB positions are drawn by iterative masked sampling (reference
  choose_positions, spike_chunks.py:194-215: avoid 10-base edges, a +-pad
  window around each pick, and +-2*pad around pre-existing UBs).
* For each spiked position the signal span breakpoints[pos-6]..
  breakpoints[pos] is replaced by a synthetic squiggle of the 11-mer around
  the UB: per-k-mer dwell repetitions from the breakpoints, level means
  from the pore-model table, within-event std sampling per ``std_dist``
  plus truncated-normal noise (sim_signals, spike_chunks.py:54-134),
  normalised by the med/MAD of a simulated full-read squiggle
  (compute_med_mad_squiggly, spike_chunks.py:44-52).
* ``fully_synth`` replaces the whole chunk with simulated signal
  (sim_target, spike_chunks.py:217-245).

Fixed-shape implementation notes: spikes per chunk are capped at a static
``max_spikes``; each spike writes into a static ``MAX_SPAN``-sample window
with masking; med/MAD uses a reduced dwell replication (statistically
equivalent to the reference's kmer_rep=100; documented deviation —
numerical RNG parity with numpy is not a goal, distributional parity is).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xna_basecaller_tpu.data.pore_model import load_pore_model

KMER_LEN = 6
MAX_SPAN = 160          # max signal samples replaced per spike
MEDMAD_REPS = 8         # dwell reps for the med/MAD simulation (ref: 100)
MAD_FACTOR = 1.4826


def _kmer_codes_from_target(target, n_base: int = 6, k: int = KMER_LEN):
    """Dense k-mer codes per position from base codes [L] (1..6 -> 0..5).

    code[i] indexes the pore model for target[i:i+k]; positions whose
    k-mer window runs past L-k use the AT-tail convention of the reference
    (get_kmers_model, spike_chunks.py:21-42) only approximately: the window
    is clamped (tail k-mers repeat the last full window).
    """
    L = target.shape[0]
    z = jnp.clip(target - 1, 0, n_base - 1)
    pows = n_base ** jnp.arange(k - 1, -1, -1)
    padded = jnp.concatenate(
        [z, jnp.tile(jnp.array([0, 3], z.dtype), (k + 1) // 2)[:k]])
    idx = jnp.arange(L)[:, None] + jnp.arange(k)[None, :]
    windows = padded[idx]                       # [L, k]
    return (windows * pows[None, :]).sum(-1)


def _sample_event_stds(key, stds, std_dist: str):
    """Within-event std sampling (reference sim_signals std_dist modes,
    spike_chunks.py:66-110).  ``stds`` [n] -> offsets [n]."""
    if std_dist == "uniform":
        return jax.random.uniform(key, stds.shape, minval=-1.0, maxval=1.0
                                  ) * stds
    if std_dist.startswith("uniform_shift_"):
        _, _, std_len, shift_range = std_dist.split("_")
        std_len, shift_range = float(std_len), float(shift_range)
        k1, k2 = jax.random.split(key)
        n_choices = int(round(2 * shift_range / 0.5)) + 1
        shift = -shift_range + 0.5 * jax.random.randint(
            k1, (), 0, n_choices).astype(stds.dtype)
        u = jax.random.uniform(k2, stds.shape,
                               minval=-std_len, maxval=std_len) + shift
        return u * stds
    if std_dist.startswith("truncnorm_shift_"):
        _, _, std_len, shift_range = std_dist.split("_")
        std_len, shift_range = float(std_len), float(shift_range)
        k1, k2 = jax.random.split(key)
        n_choices = int(round(2 * shift_range / 0.5)) + 1
        shift = -shift_range + 0.5 * jax.random.randint(
            k1, (), 0, n_choices).astype(stds.dtype)
        t = jax.random.truncated_normal(
            k2, -std_len + shift, std_len + shift, stds.shape)
        return t * stds
    if std_dist == "truncnorm":
        t = jax.random.truncated_normal(key, -2.0, 2.0, stds.shape)
        return t * stds
    if std_dist == "normal":
        t = jnp.clip(jax.random.normal(key, stds.shape) * 0.5, -2.0, 2.0)
        return t * stds
    raise ValueError(f"unsupported std_dist {std_dist!r}")


def _med_mad_squiggly(key, means, stds, valid):
    """med/MAD of a simulated full-read squiggle (reference
    compute_med_mad_squiggly, spike_chunks.py:44-52), with masked invalid
    positions and reduced dwell reps."""
    reps_means = jnp.tile(means[:, None], (1, MEDMAD_REPS)).reshape(-1)
    reps_stds = jnp.tile(stds[:, None], (1, MEDMAD_REPS)).reshape(-1)
    reps_valid = jnp.tile(valid[:, None], (1, MEDMAD_REPS)).reshape(-1)
    noise = jax.random.uniform(key, reps_means.shape, minval=-1.0,
                               maxval=1.0) * reps_stds
    sig = reps_means + noise
    # masked median: push invalid entries to the ends symmetrically by
    # replacing half with -inf-ish and half with +inf-ish sentinels
    n_valid = reps_valid.sum()
    big = 1e6
    half = (jnp.arange(sig.shape[0]) % 2 == 0)
    sig_m = jnp.where(reps_valid, sig, jnp.where(half, -big, big))
    med = jnp.median(sig_m)
    dev = jnp.where(reps_valid, jnp.abs(sig - med),
                    jnp.where(half, -big, big))
    mad = jnp.median(dev) * MAD_FACTOR + 1e-7
    return med, mad


@partial(jax.jit, static_argnames=("max_spikes", "prop_ubs", "pad",
                                   "std_dist", "noise_std", "fully_synth",
                                   "ub_codes", "legacy_pos", "var_prop_ubs",
                                   "mix_ubs"))
def spike_batch(key, chunks, targets, lengths, breakpoints,
                kmer_means, kmer_stds,
                prop_ubs: float = 0.10, max_spikes: int = 64,
                pad: int = 5, std_dist: str = "truncnorm_shift_1.5_0.5",
                noise_std: float = 1.0, fully_synth: bool = False,
                ub_codes: tuple = (5, 6), legacy_pos: bool = False,
                var_prop_ubs: float = 0.0, mix_ubs: bool = True):
    """Vectorised spike augmentation over a batch.

    chunks [B, T] f32, targets [B, L] i32, lengths [B] i32,
    breakpoints [B, L] i32 cumulative; returns (chunks', targets').
    """
    if pad < KMER_LEN - 1:
        # picks are only guaranteed pad+1 apart; the single-scatter write
        # needs the [bkps[pos-6], bkps[pos]) spans pairwise disjoint
        raise ValueError(
            f"spike pad must be >= {KMER_LEN - 1} (got {pad}): smaller "
            "pads allow overlapping replacement spans")
    B, T = chunks.shape
    L = targets.shape[1]
    keys = jax.random.split(key, B)

    def one(key, chunk, target, length, bkps):
        return _spike_one(key, chunk, target, length, bkps,
                          kmer_means, kmer_stds, prop_ubs, max_spikes, pad,
                          std_dist, noise_std, fully_synth, ub_codes,
                          legacy_pos, T, L, var_prop_ubs, mix_ubs)

    return jax.vmap(one)(keys, chunks, targets, lengths, breakpoints)


def _choose_positions(key, length, n_pos, max_spikes, pad, ubs_pos_mask, L,
                      weights=None):
    """Masked iterative sampling of spike positions (reference
    choose_positions, spike_chunks.py:194-215; with ``weights`` the
    k-mer-frequency-weighted variant, stitch_chunks.py:46-102)."""
    pos_idx = jnp.arange(L)
    valid = (pos_idx >= 10) & (pos_idx < length - 10)
    valid = valid & ~ubs_pos_mask

    def body(i, carry):
        valid, picks, key = carry
        key, sub = jax.random.split(key)
        w = valid.astype(jnp.float32)
        if weights is not None:
            w = w * weights
        any_valid = w.sum() > 0
        p = jnp.where(any_valid, w / jnp.maximum(w.sum(), 1e-30),
                      jnp.full((L,), 1.0 / L))
        pick = jax.random.choice(sub, L, p=p)
        active = (i < n_pos) & any_valid
        pick = jnp.where(active, pick, -1)
        window = (pos_idx >= pick - pad) & (pos_idx <= pick + pad)
        valid = jnp.where(active, valid & ~window, valid)
        picks = picks.at[i].set(pick)
        return valid, picks, key

    picks0 = jnp.full((max_spikes,), -1, jnp.int32)
    _, picks, _ = jax.lax.fori_loop(
        0, max_spikes, body, (valid, picks0, key))
    return picks


def _spike_one(key, chunk, target, length, bkps, kmer_means, kmer_stds,
               prop_ubs, max_spikes, pad, std_dist, noise_std, fully_synth,
               ub_codes, legacy_pos, T, L, var_prop_ubs=0.0, mix_ubs=True):
    k_pos, k_ub, k_med, k_sig, k_noise, k_prop = jax.random.split(key, 6)
    pos_idx = jnp.arange(L)
    in_len = pos_idx < length
    # padded breakpoint entries are zeros — replace with a large sentinel so
    # searchsorted over the cumulative boundaries stays well-defined
    bkps = jnp.where(in_len, bkps, T + 1)

    # existing UBs: avoid spiking near them (2*pad window)
    is_ub = (target > 4) & in_len
    ub_window = jnp.zeros((L,), bool)
    # dilate the UB mask by 2*pad via a correlation trick
    width = 4 * pad + 1
    kernel = jnp.ones((width,), jnp.float32)
    dil = jnp.convolve(is_ub.astype(jnp.float32), kernel, mode="same")
    ub_window = dil > 0

    n_existing = is_ub.sum()
    prop = prop_ubs
    if var_prop_ubs > 0:
        # per-item proportion jitter (reference spike_read,
        # spike_chunks.py:256-257)
        prop = prop_ubs + jax.random.uniform(
            k_prop, (), minval=-var_prop_ubs, maxval=var_prop_ubs)
    n_pos = jnp.maximum(
        jnp.round(length * prop).astype(jnp.int32) - n_existing, 1)
    n_pos = jnp.minimum(n_pos, max_spikes)

    picks = _choose_positions(k_pos, length, n_pos, max_spikes, pad,
                              ub_window, L)
    picked = picks >= 0

    codes = jnp.asarray(ub_codes, jnp.int32)
    if mix_ubs:
        # mixed UBs: alternate through ub_codes, shuffled
        reps = jnp.tile(
            codes, (max_spikes + len(ub_codes) - 1) // len(ub_codes)
        )[:max_spikes]
        spiked_ubs = jax.random.permutation(k_ub, reps)
    else:
        # one UB type for the whole chunk (reference spike_chunks.py:278-279)
        one_ub = codes[jax.random.randint(k_ub, (), 0, len(ub_codes))]
        spiked_ubs = jnp.full((max_spikes,), one_ub, jnp.int32)

    # spike the target
    safe_picks = jnp.clip(picks, 0, L - 1)
    new_target = target
    if tuple(ub_codes) != (0,):  # ubs == ['N'] -> signal-only spiking
        new_target = new_target.at[safe_picks].set(
            jnp.where(picked, spiked_ubs, new_target[safe_picks]))

    # per-position k-mer codes AFTER UB insertion (b: spike-then-simulate,
    # reference spike_chunk:177-183)
    kcodes = _kmer_codes_from_target(new_target)
    means = kmer_means[kcodes]
    stds = kmer_stds[kcodes]

    med, mad = _med_mad_squiggly(k_med, means, stds, in_len)

    if fully_synth:
        return _sim_full(k_sig, k_noise, chunk, new_target, length, bkps,
                         means, stds, med, mad, std_dist, noise_std, T, L), \
            new_target

    # per-spike signal replacement — all spikes as one batched block +
    # a single masked scatter (positions are >= pad+1 apart so the
    # half-open spans [bkps[pos-6], bkps[pos]) are pairwise disjoint;
    # same vectorisation as augment/stitch._stitch_one)
    M = max_spikes
    sig_keys = jax.random.split(k_sig, M)
    noise_keys = jax.random.split(k_noise, M)
    pos = safe_picks                                   # [M]
    start = jnp.where(pos >= KMER_LEN,
                      bkps[jnp.maximum(pos - KMER_LEN, 0)], 0)
    end = bkps[pos]
    span = jnp.clip(end - start, 0, MAX_SPAN)          # [M]
    samp = jnp.arange(MAX_SPAN)
    abs_pos = start[:, None] + samp[None, :]           # [M, S]
    # which k-mer does each sample belong to: the span covers kmers
    # pos-5..pos with boundaries bkps[pos-6..pos]
    koff = jnp.arange(KMER_LEN + 1)
    kmer_starts = jnp.where(
        pos[:, None] - KMER_LEN + koff[None, :] >= 0,
        bkps[jnp.clip(pos[:, None] - KMER_LEN + koff[None, :], 0, L - 1)],
        0)                                             # [M, 7]
    which = jnp.clip(
        jnp.sum(abs_pos[..., None] >= kmer_starts[:, None, :], axis=-1) - 1,
        0, KMER_LEN - 1)                               # [M, S]
    kmer_pos = jnp.clip(pos[:, None] - (KMER_LEN - 1) + which, 0, L - 1)
    m = means[kmer_pos]
    s = stds[kmer_pos]
    # per-spike keys (vmap) keep the reference's per-position std-shift
    # draw (sim_signals called per spike, spike_chunks.py:166-190)
    offs = jax.vmap(
        lambda k, sv: _sample_event_stds(k, sv, std_dist))(sig_keys, s)
    sig = m + offs
    if noise_std > 0:
        tn = jax.vmap(
            lambda k, sh: jax.random.truncated_normal(k, -3.0, 3.0,
                                                      sh.shape))(
            noise_keys, sig)
        sig = sig + tn * noise_std
    sig = (sig - med) / mad
    write_mask = (samp[None, :] < span[:, None]) & picked[:, None]
    idx = jnp.where(write_mask, start[:, None] + samp[None, :], T)
    new_chunk = chunk.at[idx.reshape(-1)].set(
        sig.reshape(-1).astype(chunk.dtype), mode="drop")
    return new_chunk, new_target


def _sim_full(k_sig, k_noise, chunk, target, length, bkps, means, stds,
              med, mad, std_dist, noise_std, T, L):
    """Whole-chunk synthetic signal (reference sim_target,
    spike_chunks.py:217-245), dwell reps from breakpoints."""
    samp = jnp.arange(T)
    # base index per signal sample from cumulative breakpoints
    which = jnp.clip(jnp.searchsorted(bkps, samp, side="right"), 0, L - 1)
    m = means[which]
    s = stds[which]
    offs = _sample_event_stds(k_sig, s, std_dist)
    sig = m + offs
    if noise_std > 0:
        tn = jax.random.truncated_normal(k_noise, -3.0, 3.0, sig.shape)
        sig = sig + tn * noise_std
    sig = (sig - med) / mad
    total = bkps[jnp.clip(length - 1, 0, L - 1)]
    return jnp.where(samp < total, sig, chunk)


_UB_CODE_MAP = {"X": (5,), "Y": (6,), "XY": (5, 6), "N": (0,)}


def make_spike_augment(ubs: str = "XY", prop_ubs: float = 0.10,
                       noise_std: float = 1.0,
                       std_dist: str = "truncnorm_shift_1.5_0.5",
                       fully_synth: bool = False, pore_model_path=None,
                       max_spikes: int = 64, pad: int = 5,
                       var_prop_ubs: float = 0.0, mix_ubs: bool = True):
    """Build a ChunkDataset-compatible augment(chunks, targets, lengths,
    breakpoints, rng) -> (chunks, targets) closure running on device."""
    pore = load_pore_model(pore_model_path)
    kmer_means = jnp.asarray(pore.means)
    kmer_stds = jnp.asarray(pore.stds)
    ub_codes = _UB_CODE_MAP[ubs]

    def augment(chunks, targets, lengths, breakpoints, rng):
        seed = int(rng.integers(0, 2 ** 31 - 1))
        key = jax.random.key(seed)
        c, t = spike_batch(
            key, jnp.asarray(chunks), jnp.asarray(targets, jnp.int32),
            jnp.asarray(lengths, jnp.int32),
            jnp.asarray(breakpoints, jnp.int32),
            kmer_means, kmer_stds,
            prop_ubs=prop_ubs, max_spikes=max_spikes, pad=pad,
            std_dist=std_dist, noise_std=noise_std,
            fully_synth=fully_synth, ub_codes=ub_codes,
            var_prop_ubs=var_prop_ubs, mix_ubs=mix_ubs)
        return np.asarray(c), np.asarray(t)

    return augment

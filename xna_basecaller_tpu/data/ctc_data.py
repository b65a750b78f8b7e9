"""ctc-data (.npy) loading and batch iteration.

Speaks the reference's on-disk training-data contract exactly (SURVEY §2.5;
reference ub-bonito/bonito/data.py:129-163): ``chunks.npy [N, 3600] f16``,
``references.npy [N, Lmax] u8``, ``reference_lengths.npy``, optional
``indices.npy`` subsampling and ``breakpoints.npy`` for augmentation; a
``validation/`` subdir or a 97/3 split fallback (data.py:112-115).

Batching is host-side numpy with a per-epoch shuffle and an augmentation
hook; the device side always sees fixed [B, T] / [B, L] shapes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


def load_numpy_datasets(directory: str, limit: int | None = None,
                        load_bkps: bool = False):
    """Load (chunks, targets, lengths[, breakpoints]) with indices.npy
    subsampling (reference data.py:129-163)."""
    chunks = np.load(os.path.join(directory, "chunks.npy"), mmap_mode="r")
    targets = np.load(os.path.join(directory, "references.npy"),
                      mmap_mode="r")
    lengths = np.load(os.path.join(directory, "reference_lengths.npy"),
                      mmap_mode="r")
    indices_path = os.path.join(directory, "indices.npy")
    bkps = None
    if load_bkps:
        bkps = np.load(os.path.join(directory, "breakpoints.npy"),
                       mmap_mode="r")
    if os.path.exists(indices_path):
        idx = np.load(indices_path, mmap_mode="r")
        idx = idx[idx < lengths.shape[0]]
        if limit:
            idx = idx[:limit]
        out = (chunks[idx, :], targets[idx, :], lengths[idx])
        if load_bkps:
            out = out + (bkps[idx, :],)
        return out
    if limit:
        chunks, targets, lengths = (
            chunks[:limit], targets[:limit], lengths[:limit])
        if bkps is not None:
            bkps = bkps[:limit]
    out = (np.array(chunks), np.array(targets), np.array(lengths))
    if load_bkps:
        out = out + (np.array(bkps),)
    return out


def atomic_np_save(path: str, arr) -> None:
    """np.save via tmp-file + rename: a process killed mid-write (tunnel
    drop, watchdog) must never leave a truncated .npy that a resumed
    chain mistakes for a complete artifact."""
    from xna_basecaller_tpu.utils.fileio import atomic_output
    with atomic_output(path, "wb") as fh:
        np.save(fh, arr)


def save_ctc_data(directory: str, chunks, targets, lengths,
                  breakpoints=None, indices=None) -> None:
    os.makedirs(directory, exist_ok=True)
    # chunks.npy doubles as the directory's existence/skip marker in the
    # resumable chains — write it LAST so its presence implies the rest
    atomic_np_save(os.path.join(directory, "references.npy"),
                   np.asarray(targets, np.uint8))
    atomic_np_save(os.path.join(directory, "reference_lengths.npy"),
                   np.asarray(lengths, np.uint16))
    if breakpoints is not None:
        atomic_np_save(os.path.join(directory, "breakpoints.npy"),
                       np.asarray(breakpoints, np.uint16))
    if indices is not None:
        atomic_np_save(os.path.join(directory, "indices.npy"),
                       np.asarray(indices))
    atomic_np_save(os.path.join(directory, "chunks.npy"),
                   np.asarray(chunks, np.float16))


@dataclass
class ChunkDataset:
    """In-memory/mmap dataset with optional per-item augmentation.

    ``augment`` is called per batch as augment(chunks, targets, lengths,
    breakpoints, rng) -> (chunks, targets) — batch-level (vectorised),
    unlike the reference's per-item worker-pool __getitem__ (data.py:53-84),
    because augmentation here runs as device-side jit.
    ``epoch_reset_seed`` fixes the RNG each epoch for comparable validation
    loss (reference data.py:50-67; seeds 1910 val / 2012 train).
    """

    chunks: np.ndarray
    targets: np.ndarray
    lengths: np.ndarray
    breakpoints: np.ndarray | None = None
    augment: object = None
    epoch_reset_seed: bool = False
    replace_6_letter: bool = False

    def __post_init__(self):
        self.seed = 1910 if self.epoch_reset_seed else 2012
        self.rng = np.random.default_rng(self.seed)

    def __len__(self):
        return len(self.lengths)

    def batches(self, batchsize: int, shuffle: bool = False,
                seed: int = 0, drop_last: bool = False):
        """Yield (chunks [B,T] f32, targets [B,L] i32, lengths [B] i32)."""
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        if self.epoch_reset_seed:
            self.rng = np.random.default_rng(self.seed)
        for start in range(0, n, batchsize):
            idx = order[start:start + batchsize]
            if drop_last and len(idx) < batchsize:
                return
            idx_sorted = np.sort(idx)  # mmap-friendly fancy indexing
            c = np.asarray(self.chunks[idx_sorted], np.float32)
            t = np.asarray(self.targets[idx_sorted], np.int32)
            l = np.asarray(self.lengths[idx_sorted], np.int32)
            if self.augment is not None:
                b = (np.asarray(self.breakpoints[idx_sorted], np.int32)
                     if self.breakpoints is not None else None)
                c, t = self.augment(c, t, l, b, self.rng)
            if self.replace_6_letter:
                t = np.where(t == 6, 5, t)
            yield c, t, l


def load_datasets(directory: str, limit: int | None = None,
                  load_bkps: bool = False, valid_split: float = 0.97,
                  augment=None, valid_augment=None,
                  valid_limit: int | None = None):
    """(train, valid) ChunkDatasets with validation/ subdir or split
    fallback (reference data.py:100-126); ``valid_limit`` caps the
    validation set (reference --valid-chunks)."""
    arrays = load_numpy_datasets(directory, limit=limit, load_bkps=load_bkps)
    valid_dir = os.path.join(directory, "validation")
    if os.path.exists(valid_dir):
        train_arrays = arrays
        valid_arrays = load_numpy_datasets(valid_dir, load_bkps=load_bkps,
                                           limit=valid_limit)
    else:
        split = int(np.floor(len(arrays[0]) * valid_split))
        train_arrays = tuple(x[:split] for x in arrays)
        valid_arrays = tuple(x[split:] for x in arrays)
        if valid_limit:
            valid_arrays = tuple(x[:valid_limit] for x in valid_arrays)
    train = ChunkDataset(*train_arrays, augment=augment)
    valid = ChunkDataset(*valid_arrays, augment=valid_augment,
                         epoch_reset_seed=True)
    return train, valid


def load_script(directory: str, name: str = "dataset",
                suffix: str = ".py", **kwargs):
    """Custom-dataset escape hatch (reference data.py:89-96): import
    ``<directory>/dataset.py``, instantiate its ``Loader``, and return
    (train, valid) datasets.

    The Loader may expose either the TPU-idiomatic
    ``train_dataset(**kw)/valid_dataset(**kw)`` (returning ChunkDataset-
    shaped objects) or the reference's
    ``train_loader_kwargs/valid_loader_kwargs`` (dicts whose ``dataset``
    entry is used)."""
    import importlib.util

    filepath = os.path.join(directory, name + suffix)
    spec = importlib.util.spec_from_file_location(name, filepath)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    loader = module.Loader()
    if hasattr(loader, "train_dataset"):
        return loader.train_dataset(**kwargs), loader.valid_dataset(**kwargs)
    return (loader.train_loader_kwargs(**kwargs)["dataset"],
            loader.valid_loader_kwargs(**kwargs)["dataset"])


def merge_ctc_dirs(out_dir: str, *dirs: str, limits=None,
                   load_bkps: bool = True, seed: int = 25) -> int:
    """Merge several ctc-data directories into one (shuffled).

    The "hybrid" training mode (BASELINE config: real XNA chunks + DNA
    chunks; the reference pre-mixes npy packs for it).  Handles differing
    target widths by padding to the widest; optional per-dir limits.
    """
    rng = np.random.default_rng(seed)
    parts = []
    for i, d in enumerate(dirs):
        limit = None if limits is None else limits[i]
        parts.append(load_numpy_datasets(d, limit=limit,
                                         load_bkps=load_bkps))
    width = max(p[1].shape[1] for p in parts)
    chunk_len = parts[0][0].shape[1]
    if any(p[0].shape[1] != chunk_len for p in parts):
        raise ValueError("chunk lengths differ between directories")

    def pad_w(a):
        if a.shape[1] == width:
            return np.asarray(a)
        out = np.zeros((a.shape[0], width), a.dtype)
        out[:, : a.shape[1]] = a
        return out

    chunks = np.concatenate([np.asarray(p[0]) for p in parts])
    targets = np.concatenate([pad_w(p[1]) for p in parts])
    lengths = np.concatenate([np.asarray(p[2]) for p in parts])
    order = rng.permutation(len(chunks))
    bkps = None
    if load_bkps:
        bkps = np.concatenate([pad_w(p[3]) for p in parts])[order]
    save_ctc_data(out_dir, chunks[order], targets[order], lengths[order],
                  breakpoints=bkps)
    return len(chunks)

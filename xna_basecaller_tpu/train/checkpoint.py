"""Checkpoint save/load with the reference's epoch-numbered contract.

Keeps the reference naming and resume semantics (reference: ub-bonito/
bonito/training.py:24-69, 204-207): ``weights_{epoch}.npz`` every epoch,
``optim_{epoch}.npz`` every ``save_optim_every``, resume from the max common
epoch found in the workdir, and best-epoch selection by symlinking
``weights_99`` (consolidate_ub_validation.py:228-250 semantics).

Format: flat npz keyed by '/'-joined pytree paths — dependency-free,
mmap-friendly, and stable across jax versions.
"""

from __future__ import annotations

import os
import re
from glob import glob

import jax
import numpy as np


def _flatten(tree) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(template, flat: dict[str, np.ndarray]):
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in leaves_paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing key {key}")
        val = flat[key]
        if hasattr(leaf, "shape") and tuple(leaf.shape) != tuple(val.shape):
            raise ValueError(
                f"shape mismatch for {key}: {val.shape} vs {leaf.shape}")
        if hasattr(leaf, "dtype"):
            val = val.astype(leaf.dtype)
        leaves.append(val)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_tree(tree, path: str) -> None:
    """Atomic write: weights_N.npz presence is the resume marker for
    trainings and chains — a kill mid-save must not leave a truncated
    archive that a relaunch mistakes for a complete checkpoint.

    The tmp name is PREFIXED (".tmp-weights_N.npz", via atomic_output):
    a suffixed "weights_N.npz.tmp.npz" would match the "weights_*.npz"
    resume globs and crash every relaunch on the leftover."""
    from xna_basecaller_tpu.utils.fileio import atomic_output
    with atomic_output(path, "wb") as fh:
        np.savez(fh, **_flatten(tree))


def load_tree(template, path: str):
    with np.load(path) as npz:
        flat = {k: npz[k] for k in npz.files}
    return _unflatten(template, flat)


def save_checkpoint(workdir: str, epoch: int, params,
                    opt_state=None, save_optim: bool = True) -> None:
    os.makedirs(workdir, exist_ok=True)
    save_tree(params, os.path.join(workdir, f"weights_{epoch}.npz"))
    if opt_state is not None and save_optim:
        save_tree(opt_state, os.path.join(workdir, f"optim_{epoch}.npz"))


# Pseudo-epoch ids that are candidates/aliases, not training progress:
# 99 = best-epoch symlink (link_best_epoch, reference consolidate
# semantics), 90 = the north-star chain's SWA tail-average candidate.
# Inference "latest" loading includes them on purpose (loading the
# consolidated best is the reference's util.py:261 behavior); training
# RESUME must ignore them or an epoch-extension run on a consolidated
# dir reports "already trained to epoch 99".
RESERVED_EPOCHS = frozenset({90, 99})


def mark_reserved(workdir: str, epoch: int) -> None:
    """Sidecar marker declaring weights_{epoch} a pseudo-epoch artifact.

    The r-1-adjacency heuristic in latest_epoch misfires when a real
    training reaches epoch r-1 and THEN a pseudo-epoch artifact lands at
    r (e.g. --epochs 89 + SWA at 90): the marker makes the exclusion
    explicit instead of inferred."""
    with open(os.path.join(workdir, f"weights_{epoch}.reserved"), "w"):
        pass


def _is_marked_reserved(workdir: str, epoch: int) -> bool:
    return os.path.exists(
        os.path.join(workdir, f"weights_{epoch}.reserved"))


def _epochs(workdir: str, prefix: str) -> set[int]:
    files = glob(os.path.join(workdir, f"{prefix}_*.npz"))
    return {int(re.sub(r".*_([0-9]+)\.npz", r"\1", f)) for f in files}


def latest_epoch(workdir: str, with_optim: bool = False,
                 exclude_reserved: bool = False) -> int | None:
    weights = _epochs(workdir, "weights")
    if exclude_reserved:
        # Explicit sidecar markers first; for unmarked dirs (written
        # before the markers existed) fall back to the adjacency
        # heuristic: a reserved id standing alone is a pseudo-epoch,
        # while weights_90 with weights_89 beside it is genuine
        # progress of a real >=90-epoch training and must resume.
        weights -= {r for r in RESERVED_EPOCHS & weights
                    if _is_marked_reserved(workdir, r)
                    or r - 1 not in weights}
    if with_optim:
        weights &= _epochs(workdir, "optim")
    return max(weights, default=None)


def load_checkpoint(workdir: str, params_template, opt_template=None,
                    epoch: int | None = None):
    """Resume state: returns (epoch, params, opt_state or None).

    epoch=None picks the latest real epoch (max common with optim if
    opt_template given, reference training.py:32-43), never a reserved
    pseudo-epoch; epoch=0 if nothing to load.
    """
    if epoch is None:
        epoch = latest_epoch(workdir, with_optim=opt_template is not None,
                             exclude_reserved=True)
    if epoch is None:
        return 0, params_template, opt_template
    params = load_tree(
        params_template, os.path.join(workdir, f"weights_{epoch}.npz"))
    opt_state = opt_template
    if opt_template is not None:
        opath = os.path.join(workdir, f"optim_{epoch}.npz")
        if os.path.exists(opath):
            opt_state = load_tree(opt_template, opath)
    return epoch, params, opt_state


def link_best_epoch(workdir: str, epoch: int, alias: int = 99) -> None:
    """Symlink weights_{alias} -> best epoch weights (reference
    consolidate_ub_validation.py:228-250)."""
    target = f"weights_{epoch}.npz"
    link = os.path.join(workdir, f"weights_{alias}.npz")
    if os.path.islink(link) or os.path.exists(link):
        os.remove(link)
    os.symlink(target, link)
    mark_reserved(workdir, alias)

"""Model directory loading: config.toml + weights_{N}.npz.

Mirrors the reference load_model contract (reference: ub-bonito/bonito/
util.py:261-366): pick the latest checkpoint unless one is named, let CLI
flags override config basecaller params, support ``skip_top`` partial loads
(CRF head reinit for alphabet transfer, util.py:330-356).
"""

from __future__ import annotations

import os
from dataclasses import replace

import jax

from xna_basecaller_tpu.core import config as config_lib
from xna_basecaller_tpu.models.crf_model import Model, init_params
from xna_basecaller_tpu.train import checkpoint as ckpt


def load_model(dirname: str, weights: int | None = None,
               chunksize: int | None = None, batchsize: int | None = None,
               overlap: int | None = None, skip_top: bool = False,
               drop_rate: float | None = None,
               drop_rate_bottom: float | None = None, seed: int = 0):
    """Returns (model, params, config) from a model directory."""
    cfg = config_lib.load(dirname)
    bc = cfg.basecaller
    bc = replace(
        bc,
        chunksize=chunksize or bc.chunksize,
        overlap=overlap if overlap is not None else bc.overlap,
        batchsize=batchsize or bc.batchsize,
    )
    enc = cfg.encoder
    if drop_rate is not None or drop_rate_bottom is not None:
        enc = replace(
            enc,
            drop_rate=drop_rate if drop_rate is not None else enc.drop_rate,
            drop_rate_bottom=(drop_rate_bottom if drop_rate_bottom is not None
                              else enc.drop_rate_bottom),
        )
    cfg = replace(cfg, basecaller=bc, encoder=enc)

    # model family dispatch (reference load_symbol on config["model"]
    # ["package"], util.py:228-233/295): QuartzNet CTC vs flagship CRF
    if cfg.is_ctc:
        from xna_basecaller_tpu.models import ctc_model
        model = ctc_model.CtcModel(cfg)
        template = ctc_model.init_params(jax.random.key(seed), cfg)
    else:
        model = Model(cfg)
        template = init_params(jax.random.key(seed), cfg)
    epoch = weights if weights is not None else ckpt.latest_epoch(dirname)
    if epoch is None:
        # fall back to reference-format torch checkpoints (weights_N.tar)
        import re
        from glob import glob

        tars = glob(os.path.join(dirname, "weights_*.tar"))
        if tars:
            tar_epochs = {int(re.sub(r".*_(\d+)\.tar$", r"\1", f))
                          for f in tars}
            tar_epoch = weights if weights is not None else max(tar_epochs)
            from xna_basecaller_tpu.utils.torch_import import (
                load_torch_checkpoint,
            )
            params = load_torch_checkpoint(
                os.path.join(dirname, f"weights_{tar_epoch}.tar"), cfg)
            if skip_top:
                for key in (("decoder",) if cfg.is_ctc
                            else ("head", "head_ext")):
                    if key in template:
                        params[key] = template[key]
            import jax.numpy as jnp
            params = jax.tree.map(jnp.asarray, params)
            return model, params, cfg
        raise FileNotFoundError(
            f"no model weights found in '{dirname}'")
    path = os.path.join(dirname, f"weights_{epoch}.npz")
    if skip_top:
        # load everything except the CRF head (and extra linear), which keep
        # their fresh init — alphabet-transfer checkpoints have a different
        # head shape, so they must not even be shape-checked.
        sub_template = {k: v for k, v in template.items()
                        if k not in (("decoder",) if cfg.is_ctc
                                     else ("head", "head_ext"))}
        params = {**template, **ckpt.load_tree(sub_template, path)}
    else:
        params = ckpt.load_tree(template, path)
    return model, params, cfg

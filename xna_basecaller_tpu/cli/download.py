"""``xnacall download`` — model installer / registry.

Reference surface: ub-bonito/bonito/cli/download.py (box.com fetcher +
model registry).  This environment has zero egress, so "download" means
installing from local media instead: ``--from`` copies a model directory
into the registry after validating its structure, and reference torch
checkpoints (``weights_N.tar``) are converted through
``utils/torch_import`` on the way in — the air-gapped equivalent of
fetching an ONT release.
"""

from __future__ import annotations

import argparse
import os
import shutil

MODELS = {
    "xna_r9.4.1_e8_sup@v3.3": {
        "description": "6-base (NACGTXY) CRF sup model, r9.4.1",
        "url": None,  # distributed with the reference release
    },
}


def install_model(src: str, directory: str, name: str | None = None,
                  log=print) -> str:
    """Copy/convert a model directory into the registry.

    Accepts either this framework's layout (config.toml + weights_N.npz)
    or the reference's (config.toml + weights_N.tar, converted via the
    torch importer). Returns the installed path.
    """
    from glob import glob

    if not os.path.isdir(src):
        raise SystemExit(f"{src} is not a directory")
    if not os.path.exists(os.path.join(src, "config.toml")):
        raise SystemExit(f"{src} has no config.toml")
    name = name or os.path.basename(os.path.normpath(src))
    dst = os.path.join(directory, name)
    os.makedirs(dst, exist_ok=True)
    shutil.copy(os.path.join(src, "config.toml"), dst)

    npz = sorted(glob(os.path.join(src, "weights_*.npz")))
    tars = sorted(glob(os.path.join(src, "weights_*.tar")))
    if npz:
        for f in npz:
            shutil.copy(f, dst)
        log(f"> installed {name} ({len(npz)} checkpoints)")
    elif tars:
        from xna_basecaller_tpu.core import config as config_lib
        from xna_basecaller_tpu.train.checkpoint import save_checkpoint
        from xna_basecaller_tpu.utils.torch_import import (
            load_torch_checkpoint,
        )

        cfg = config_lib.load(src)
        n = 0
        for f in tars:
            epoch = int(os.path.basename(f)[8:-4])
            params = load_torch_checkpoint(f, cfg)
            save_checkpoint(dst, epoch, params)
            n += 1
        log(f"> installed {name} ({n} torch checkpoints converted)")
    else:
        raise SystemExit(f"{src} has no weights_N.npz or weights_N.tar")
    return dst


def main(args):
    if args.source:
        install_model(args.source, args.directory, name=args.model or None)
        return
    if args.list or not args.model:
        print("available models:")
        for name, info in MODELS.items():
            print(f"  {name}: {info['description']}")
        print("\ninstalled models:")
        if os.path.isdir(args.directory):
            for name in sorted(os.listdir(args.directory)):
                if os.path.exists(
                        os.path.join(args.directory, name, "config.toml")):
                    print(f"  {name}")
        return
    info = MODELS.get(args.model)
    if info is None:
        raise SystemExit(f"unknown model {args.model}")
    raise SystemExit(
        "network downloads are disabled in this environment; install from "
        f"local media with: xnacall download --from <dir> "
        f"[--model {args.model}]")


def argparser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        add_help=False)
    parser.add_argument("--model", default="")
    parser.add_argument("--list", action="store_true")
    parser.add_argument("--from", dest="source", default=None,
                        help="install a model from a local directory "
                             "(framework npz or reference torch layout)")
    parser.add_argument("--directory", default=os.path.expanduser(
        "~/.xna_basecaller_tpu/models"))
    return parser

"""``xnacall download`` — model/data fetcher.

Reference surface: ub-bonito/bonito/cli/download.py.  This environment has
zero egress, so the registry resolves only local paths; remote URLs are
listed for completeness and raise a clear error when unreachable.
"""

from __future__ import annotations

import argparse
import os

MODELS = {
    "xna_r9.4.1_e8_sup@v3.3": {
        "description": "6-base (NACGTXY) CRF sup model, r9.4.1",
        "url": None,  # distributed with the reference release
    },
}


def main(args):
    if args.list or not args.model:
        print("available models:")
        for name, info in MODELS.items():
            print(f"  {name}: {info['description']}")
        return
    info = MODELS.get(args.model)
    if info is None:
        raise SystemExit(f"unknown model {args.model}")
    if info["url"] is None:
        raise SystemExit(
            f"{args.model} has no download URL in this build; place its "
            f"config.toml + weights_N.npz under {args.directory}/{args.model}")
    raise SystemExit("network downloads are disabled in this environment")


def argparser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        add_help=False)
    parser.add_argument("--model", default="")
    parser.add_argument("--list", action="store_true")
    parser.add_argument("--directory", default=os.path.expanduser(
        "~/.xna_basecaller_tpu/models"))
    return parser

"""CLI dispatcher: ``xnacall {basecaller,train,evaluate,view,convert,...}``.

Mirrors the reference's argparse subcommand dispatch (reference:
ub-bonito/bonito/__init__.py:1-33).  Run as ``python -m xna_basecaller_tpu``
or via the ``xnacall`` console script.
"""

from __future__ import annotations

import argparse
import importlib
import sys

__version__ = "0.1.0"

modules = [
    "basecaller", "train", "evaluate", "view", "convert", "export",
    "download", "duplex",
]


def main(argv=None):
    if argv is None:  # real CLI invocation, not an in-process test call
        from xna_basecaller_tpu.utils.platform import (
            ensure_tunnel_journal_compact,
        )
        ensure_tunnel_journal_compact()
    parser = argparse.ArgumentParser(
        "xnacall",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument(
        "-v", "--version", action="version",
        version=f"xnacall {__version__}")

    subparsers = parser.add_subparsers(
        title="subcommands", description="valid commands",
        help="additional help", dest="command")
    subparsers.required = True

    for module in modules:
        mod = importlib.import_module(
            f"xna_basecaller_tpu.cli.{module}")
        p = subparsers.add_parser(
            module, parents=[mod.argparser()])
        p.set_defaults(func=mod.main)

    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    sys.exit(main())

"""``xnacall duplex`` — template/complement duplex calling (placeholder).

The reference's duplex path is broken in its own release (cli/duplex.py:37
imports symbols removed from crf.basecall — see SURVEY §2.1), so duplex is
not part of the parity surface.  This command documents the status instead
of failing with an ImportError.
"""

from __future__ import annotations

import argparse


def main(args):
    raise SystemExit(
        "duplex calling is not implemented: the reference pipeline for it "
        "is broken upstream (ub-bonito/bonito/cli/duplex.py:37 imports "
        "removed symbols); single-strand F/R decoding via "
        "'xnacall basecaller [--revcomp]' is the supported path")


def argparser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        add_help=False)
    parser.add_argument("model_directory", nargs="?")
    parser.add_argument("reads_directory", nargs="?")
    return parser

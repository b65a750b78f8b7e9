"""``xnacall basecaller`` — basecall fast5 reads to FASTQ.

Reference surface: ub-bonito/bonito/cli/basecaller.py.
"""

from __future__ import annotations

import argparse
import sys
from time import perf_counter


def main(args):
    import jax

    from xna_basecaller_tpu.data.fast5 import get_reads
    from xna_basecaller_tpu.infer.basecall import run_basecaller
    from xna_basecaller_tpu.utils.model_io import load_model

    sys.stderr.write(f"> loading model {args.model_directory}\n")
    model, params, cfg = load_model(
        args.model_directory, weights=args.weights or None,
        chunksize=args.chunksize, batchsize=args.batchsize,
        overlap=args.overlap)

    read_ids = None
    if args.read_ids:
        with open(args.read_ids) as fh:
            read_ids = {line.strip().split()[0] for line in fh if line.strip()}

    reads = get_reads(
        args.reads_directory, read_ids=read_ids, skip=args.skip,
        n_proc=8, recursive=args.recursive)
    if args.max_reads:
        import itertools
        reads = itertools.islice(reads, args.max_reads)

    summary = open(args.summary, "w") if args.summary else None
    try:
        t0 = perf_counter()
        stats = run_basecaller(
            model, params, reads, sys.stdout, summary,
            chunksize=cfg.basecaller.chunksize,
            overlap=cfg.basecaller.overlap,
            batchsize=cfg.basecaller.batchsize,
            reverse=args.revcomp)
        duration = perf_counter() - t0
        sys.stderr.write(f"> completed reads: {stats['reads']}\n")
        sys.stderr.write(f"> duration: {duration:.2f}s\n")
        sys.stderr.write(f"> samples per second {stats['samples_per_s']:.1E}\n")
        sys.stderr.write("> done\n")
    finally:
        if summary:
            summary.close()


def argparser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        add_help=False)
    parser.add_argument("model_directory")
    parser.add_argument("reads_directory")
    parser.add_argument("--reference", default=None,
                        help="reference for alignment (mappy/minimap2)")
    parser.add_argument("--read-ids", default=None,
                        help="file of read ids to include")
    parser.add_argument("--skip", action="store_true",
                        help="treat --read-ids as an exclude list")
    parser.add_argument("--revcomp", action="store_true",
                        help="reverse-complement decoding (R strand)")
    parser.add_argument("--recursive", action="store_true")
    parser.add_argument("--weights", default=0, type=int,
                        help="checkpoint epoch (0 = latest)")
    parser.add_argument("--chunksize", default=None, type=int)
    parser.add_argument("--overlap", default=None, type=int)
    parser.add_argument("--batchsize", default=None, type=int)
    parser.add_argument("--max-reads", default=0, type=int)
    parser.add_argument("--summary", default=None,
                        help="write per-read summary tsv here")
    return parser

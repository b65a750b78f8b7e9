"""``xnacall evaluate`` — chunk-level accuracy on ctc-data validation.

Reference surface: ub-bonito/bonito/cli/evaluate.py.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(args):
    from xna_basecaller_tpu.core.alphabet import decode as decode_codes
    from xna_basecaller_tpu.data.ctc_data import load_numpy_datasets
    from xna_basecaller_tpu.eval.accuracy import accuracy
    from xna_basecaller_tpu.train.loop import eval_scores
    from xna_basecaller_tpu.utils.model_io import load_model

    poas = []
    seed = args.seed
    np.random.seed(seed)

    print("* loading data", file=sys.stderr)
    directory = args.directory
    import os
    valid_dir = os.path.join(directory, "validation")
    if os.path.exists(valid_dir):
        directory = valid_dir
    chunks, targets, lengths = load_numpy_datasets(
        directory, limit=args.chunks)

    print("* loading model", file=sys.stderr)
    model, params, cfg = load_model(args.model_directory,
                                    weights=args.weights or None)

    print("* calling", file=sys.stderr)
    t0 = time.perf_counter()
    seqs, refs, accuracies = [], [], []
    for start in range(0, len(lengths), args.batchsize):
        c = np.asarray(chunks[start:start + args.batchsize], np.float32)
        t = targets[start:start + args.batchsize]
        l = lengths[start:start + args.batchsize]
        n_real = len(c)
        if n_real < args.batchsize:  # pad: keep one compiled shape
            pad = np.zeros((args.batchsize - n_real, c.shape[1]), c.dtype)
            c = np.concatenate([c, pad])
        scores = eval_scores(params, c, cfg)
        batch_seqs = model.decode_batch(scores[:, :n_real])
        batch_refs = [decode_codes(row[:ln], model.alphabet)
                      for row, ln in zip(t, l)]
        seqs.extend(batch_seqs)
        refs.extend(batch_refs)
    duration = time.perf_counter() - t0

    accuracies = [
        accuracy(ref, seq, min_coverage=args.min_coverage) if len(seq) else 0.
        for ref, seq in zip(refs, seqs)
    ]

    print("* mean      %.2f%%" % np.mean(accuracies))
    print("* median    %.2f%%" % np.median(accuracies))
    print("* time      %.2f" % duration)
    print("* samples/s %.2E" % (len(lengths) * chunks.shape[1] / duration))


def argparser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        add_help=False)
    parser.add_argument("model_directory")
    parser.add_argument("--directory", required=True)
    parser.add_argument("--batchsize", default=96, type=int)
    parser.add_argument("--chunks", default=1000, type=int)
    parser.add_argument("--weights", default=0, type=int)
    parser.add_argument("--seed", default=9, type=int)
    parser.add_argument("--min-coverage", default=0.5, type=float)
    return parser

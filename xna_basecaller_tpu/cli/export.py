"""``xnacall export`` — export a model to a JSON weights dict.

Reference surface: ub-bonito/bonito/cli/export.py (guppy-style JSON with
the fixed blank score folded into padded head weights, export.py:45-64).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


class NumpyEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if isinstance(obj, (np.floating, np.integer)):
            return obj.item()
        return super().default(obj)


def main(args):
    from xna_basecaller_tpu.utils.model_io import load_model

    model, params, cfg = load_model(args.model_directory,
                                    weights=args.weights or None)
    enc = cfg.encoder
    out = {
        "alphabet": cfg.alphabet,
        "state_len": cfg.state_len,
        "stride": enc.stride,
        "features": enc.features,
        "blank_score": enc.blank_score,
        "scale": enc.scale,
        "layers": [],
    }
    for i, conv in enumerate(params["conv"]):
        out["layers"].append({
            "type": "convolution", "index": i,
            "W": np.asarray(conv["w"]), "b": np.asarray(conv["b"]),
        })
    for i, rnn in enumerate(params["rnn"]):
        out["layers"].append({
            "type": "lstm", "index": i, "reverse": (i % 2 == 0),
            "iW": np.asarray(rnn["w_ih"]).T.reshape(
                4, enc.features, -1),
            "sW": np.asarray(rnn["w_hh"]).T.reshape(
                4, enc.features, enc.features),
            "b": np.asarray(rnn["bias"]).reshape(4, enc.features),
        })
    head_w = np.asarray(params["head"]["w"])
    head_b = np.asarray(params["head"]["b"])
    if enc.blank_score is not None and args.fold_blanks:
        # fold the fixed blank score into padded W/b columns
        # (reference export.py:45-64): atanh(blank/scale) as a bias column
        # with zero weights per state.
        n_base, ns = cfg.n_base, cfg.n_state
        W = head_w.reshape(enc.features, ns, n_base)
        b = head_b.reshape(ns, n_base)
        blank_b = np.arctanh(
            np.clip(enc.blank_score / enc.scale, -0.999999, 0.999999))
        Wp = np.concatenate(
            [np.zeros((enc.features, ns, 1), W.dtype), W], axis=2)
        bp = np.concatenate(
            [np.full((ns, 1), blank_b, b.dtype), b], axis=1)
        head_w, head_b = Wp.reshape(enc.features, -1), bp.reshape(-1)
    out["layers"].append({
        "type": "global_norm", "W": head_w, "b": head_b,
    })
    with open(args.output, "w") as fh:
        json.dump(out, fh, cls=NumpyEncoder)
    print(f"> exported to {args.output}")


def argparser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        add_help=False)
    parser.add_argument("model_directory")
    parser.add_argument("--output", default="model.json")
    parser.add_argument("--weights", default=0, type=int)
    parser.add_argument("--fold-blanks", action="store_true", default=True)
    return parser

"""``xnacall view`` — print model architecture, params, alphabet.

Reference surface: ub-bonito/bonito/cli/view.py.
"""

from __future__ import annotations

import argparse


def main(args):
    import jax

    from xna_basecaller_tpu.core import config as config_lib
    from xna_basecaller_tpu.models.crf_model import Model

    cfg = config_lib.load(args.model_directory)
    model = Model(cfg)
    params = model.init(jax.random.key(0))
    enc = cfg.encoder
    print(f"alphabet: {cfg.alphabet}  state_len: {cfg.state_len}  "
          f"n_state: {cfg.n_state}  n_score: {cfg.n_score}")
    print(f"encoder: conv({cfg.input_features}->{enc.first_conv_size}, k5) "
          f"-> conv({enc.first_conv_size}->{enc.second_conv_size}, k5) "
          f"-> conv({enc.second_conv_size}->{enc.features}, "
          f"k{enc.winlen}, stride {enc.stride})")
    dirs = ["rev" if (i % 2 == 0) else "fwd"
            for i in range(enc.num_rnn_layers)]
    print(f"rnn: {enc.num_rnn_layers} x LSTM({enc.features}) "
          f"[{', '.join(dirs)}]")
    print(f"head: linear({enc.features} -> "
          f"{cfg.n_base ** (cfg.state_len + 1) if enc.blank_score is not None else cfg.n_score})"
          f" tanh x{enc.scale}  blank_score={enc.blank_score}")
    print(f"parameters: {model.n_params(params):,}")


def argparser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        add_help=False)
    parser.add_argument("model_directory")
    return parser

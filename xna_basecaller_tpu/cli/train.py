"""``xnacall train`` — train a model on ctc-data.

Reference surface: ub-bonito/bonito/cli/train.py (including the
augmentation and freeze knobs).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(args):
    from xna_basecaller_tpu.core import config as config_lib
    from xna_basecaller_tpu.data.ctc_data import load_datasets
    from xna_basecaller_tpu.models.crf_model import Model
    from xna_basecaller_tpu.train.loop import Trainer
    from xna_basecaller_tpu.utils.model_io import load_model

    workdir = os.path.expanduser(args.training_directory)
    if os.path.exists(workdir) and not args.force:
        sys.stderr.write(
            f"[error] {workdir} exists, use -f to force continue\n")
        exit(1)
    os.makedirs(workdir, exist_ok=True)

    augment = None
    valid_augment = None
    need_bkps = bool(args.ubs) and (args.spike or args.stitch)
    if need_bkps:
        augments = []
        if args.stitch:
            from xna_basecaller_tpu.augment.stitch import make_stitch_augment
            augments.append(make_stitch_augment(
                args.xna_ctc_dir or args.directory, ubs=args.ubs,
                prop_ubs=args.ub_prop,
                cand_sample_size=args.cand_sample_size,
                noise_std=args.stitch_noise_std,
                noise_mode=args.stitch_noise_mode,
                weighted_pos_pick=args.weighted_pos_pick,
                permute_win_size=args.permute_win_size, pad=args.ub_pad,
                relax=args.stitch_relax))
        if args.spike:
            from xna_basecaller_tpu.augment.spike import make_spike_augment
            augments.append(make_spike_augment(
                ubs=args.ubs,
                prop_ubs=args.synth_prop_ubs or args.ub_prop,
                noise_std=args.noise_std, std_dist=args.std_dist,
                fully_synth=args.fully_synth, pad=args.ub_pad,
                var_prop_ubs=args.var_prop_ubs, mix_ubs=not args.no_mix_ubs))

        def augment(chunks, targets, lengths, bkps, rng,
                    _augs=tuple(augments)):
            # reference order: stitch first, then spike (data.py:70-79)
            for a in _augs:
                chunks, targets = a(chunks, targets, lengths, bkps, rng)
            return chunks, targets

        valid_augment = augment

    train_data, valid_data = load_datasets(
        args.directory, limit=args.chunks or None, load_bkps=need_bkps,
        augment=augment, valid_augment=valid_augment,
        valid_limit=args.valid_chunks or None)

    if args.pretrained:
        model, params0, cfg = load_model(
            args.pretrained, skip_top=args.skip_top,
            drop_rate=args.drop_rate, drop_rate_bottom=args.drop_rate_bottom)
    else:
        cfg = config_lib.load(args.config)
        model = Model(cfg)
        params0 = None

    if len(cfg.labels) == 6:
        # 5-letter model (single UB letter): remap Y->X in targets
        # (reference data.py:81-82)
        train_data.replace_6_letter = True
        valid_data.replace_6_letter = True

    config_lib.save(cfg, os.path.join(workdir, "config.toml"))
    with open(os.path.join(workdir, "argv.txt"), "w") as fh:
        fh.write(" ".join(sys.argv) + "\n")

    frozen_predicate = None
    if args.freeze_bottom:
        # freeze everything except the top K rnn layers + head
        # (reference cli/train.py:134-158)
        n_rnn = cfg.encoder.num_rnn_layers
        keep = args.unfreeze_top

        def frozen_predicate(key: str) -> bool:
            if key.startswith("head"):
                return False
            if key.startswith("rnn/"):
                layer = int(key.split("/")[1])
                return layer < n_rnn - keep
            return True

    trainer = Trainer(
        model, train_data, valid_data,
        batchsize=args.batch, lr=args.lr, seed=args.seed,
        restore_optim=args.restore_optim,
        save_optim_every=args.save_optim_every,
        grad_accum_split=args.grad_accum_split,
        steps_per_dispatch=args.steps_per_dispatch,
        frozen_predicate=frozen_predicate,
    )
    if params0 is not None:
        trainer.initial_params = params0
    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)
    trainer.fit(workdir, epochs=args.epochs)
    if args.profile:
        import jax
        jax.profiler.stop_trace()
        sys.stderr.write(f"[profile trace: {args.profile}]\n")


def argparser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        add_help=False)
    parser.add_argument("training_directory")
    parser.add_argument("--config", default=None)
    parser.add_argument("--pretrained", default="")
    parser.add_argument("--directory", default=None, required=True,
                        help="ctc-data directory")
    parser.add_argument("-f", "--force", action="store_true")
    parser.add_argument("--lr", default=5e-4, type=float)
    parser.add_argument("--seed", default=25, type=int)
    parser.add_argument("--epochs", default=5, type=int)
    parser.add_argument("--batch", default=64, type=int)
    parser.add_argument("--chunks", default=0, type=int)
    parser.add_argument("--valid-chunks", default=0, type=int)
    parser.add_argument("--grad-accum-split", default=1, type=int)
    parser.add_argument("--steps-per-dispatch", default=1, type=int,
                        help="stack K batches per device execution (one lax.scan dispatch runs K optimisation steps; amortises per-dispatch relay cost on tunneled runtimes; CRF models only)")
    parser.add_argument("--restore-optim", action="store_true")
    parser.add_argument("--save-optim-every", default=10, type=int)
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="write a jax.profiler trace of the fit to DIR")
    parser.add_argument("--skip-top", action="store_true",
                        help="drop CRF head weights from pretrained load")
    parser.add_argument("--drop-rate", default=None, type=float)
    parser.add_argument("--drop-rate-bottom", default=None, type=float)
    # freeze knobs
    parser.add_argument("--freeze-bottom", action="store_true")
    parser.add_argument("--unfreeze-top", default=3, type=int)
    # augmentation knobs (spike / stitch)
    parser.add_argument("--spike", action="store_true",
                        help="synthetic-signal UB spiking augmentation")
    parser.add_argument("--stitch", action="store_true",
                        help="real-signal splice augmentation")
    parser.add_argument("--ubs", default="", choices=["", "X", "Y", "XY", "N"],
                        help="unnatural bases to insert")
    parser.add_argument("--ub-prop", default=0.10, type=float)
    parser.add_argument("--var-prop-ubs", default=0.0, type=float,
                        help="vary UB proportion per chunk by +-this")
    parser.add_argument("--no-mix-ubs", action="store_true",
                        help="one UB letter per chunk instead of mixing")
    parser.add_argument("--ub-pad", default=5, type=int,
                        help="min base spacing between inserted UBs")
    parser.add_argument("--synth-prop-ubs", default=0.0, type=float,
                        help="separate spike proportion when combining "
                             "stitch + spike")
    parser.add_argument("--xna-ctc-dir", default=None,
                        help="real-XNA ctc-data for stitch slices")
    parser.add_argument("--cand-sample-size", default=5, type=int)
    parser.add_argument("--stitch-relax", action="store_true",
                        help="sparse-library donor fallback: redirect "
                             "empty exact-context stitch buckets to the "
                             "deepest-suffix occupied bucket (rescues "
                             "20-template libraries like POC; no-op on "
                             "fully-occupied donor tables)")
    parser.add_argument("--weighted-pos-pick", action="store_true",
                        help="k-mer-frequency-weighted insert positions")
    parser.add_argument("--permute-win-size", default=0, type=int,
                        help="permute stitched samples within windows")
    parser.add_argument("--stitch-noise-std", default=0.0, type=float)
    parser.add_argument("--stitch-noise-mode", default="single",
                        choices=["single", "single_variable", "block_add",
                                 "block_mult"])
    parser.add_argument("--noise-std", default=1.0, type=float)
    parser.add_argument("--std-dist", default="truncnorm_shift_1.5_0.5")
    parser.add_argument("--fully-synth", action="store_true")
    return parser

#!/usr/bin/env python
"""BASELINE configs #2-#4: the reference's three "quick run" trainings.

Reference README.md:99-106 defines three ~20-minute POC trainings (DNA
data sampled_0.01, ubs X, ub_prop 0.10, batch 98, 1 epoch) and their
UB-accuracy bars:

  fully-synthetic (spike --fully_synth)  ~25% UB acc
  hybrid          (spike)                ~10% UB acc
  spliced         (stitch per_kmer)      ~15% UB acc

This script runs the same matrix end-to-end on the TPU build: bootstrap
POC ctc-data (full-construct fragment reads, eval/construct_align demux),
one-epoch training per mode via the real cli/train path, then held-out
regime evaluation through the full basecall -> align -> analyze chain.
Results land in <out>/quickrun_summary.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import scripts.spliced_northstar as ns


def log(*a):
    print(*a, flush=True)


MODES = {
    "fully_synth": ["--spike", "--fully-synth"],
    "hybrid": ["--spike"],
    "spliced": ["--stitch"],
    # round-5: deepest-suffix donor fallback for sparse libraries (POC
    # occupies 10-27/1024 context buckets; without it the exact-context
    # splice starves and the reference's own POC quick-run sits at ~15%)
    "spliced_relax": ["--stitch", "--stitch-relax"],
}


def train_mode(args, mode, boot_dir, dna_dir, xna_dir):
    from xna_basecaller_tpu.cli.train import argparser, main as train_main

    workdir = os.path.join(args.out, f"{mode}-ubs_{args.ubs}")
    if os.path.exists(os.path.join(workdir, f"weights_{args.epochs}.npz")):
        log(f"> [{mode}] trained, skipping")
        return workdir
    argv = [workdir, "--directory", dna_dir, "--pretrained", boot_dir,
            "--ubs", args.ubs, "--ub-prop", str(args.ub_prop),
            "--epochs", str(args.epochs), "--batch", str(args.batch),
            "--lr", str(args.lr), "-f"] + MODES[mode]
    if mode == "spliced":
        argv += ["--xna-ctc-dir", xna_dir]
    log(f"> [{mode}] training: {' '.join(argv)}")
    train_main(argparser().parse_args(argv))
    return workdir


def eval_mode(args, workdir, reads, tag):
    from xna_basecaller_tpu.tools.eval_model import basecall_and_eval

    return basecall_and_eval(
        workdir, reads, args.exp, tag, weights=str(args.epochs),
        batchsize=args.batch, ubs=args.ubs,
        out_dir=os.path.join(workdir, "basecalls"), log=log)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", default="POC")
    p.add_argument("--out", default="/tmp/quickrun_matrix")
    p.add_argument("--boot-model",
                   default="/tmp/ns_cplx_r2b/bootstrap_model",
                   help="phase-A bootstrap basecaller to reuse")
    p.add_argument("--ubs", default="X")
    p.add_argument("--ub-prop", type=float, default=0.10)
    p.add_argument("--batch", type=int, default=98)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--xna-reads", type=int, default=1500)
    p.add_argument("--dna-reads", type=int, default=1200)
    p.add_argument("--read-chunks", type=int, default=2)
    p.add_argument("--ctc-min-acc", type=float, default=0.85)
    # phase-B sharding + bootstrap knobs (phase_b_bootstrap_data /
    # phase_a_bootstrap read these off the args namespace)
    p.add_argument("--shard-reads", type=int, default=12000)
    p.add_argument("--dna-min-acc", type=float, default=None)
    p.add_argument("--boot-chunks", type=int, default=12288)
    p.add_argument("--boot-epochs", type=int, default=10)
    p.add_argument("--features", type=int, default=768)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--jitter", action="store_true")
    p.add_argument("--val-reads", type=int, default=300)
    p.add_argument("--n-proc", type=int, default=8)
    p.add_argument("--modes",
                   default="fully_synth,hybrid,spliced,spliced_relax")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (micro smoke runs)")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)

    from xna_basecaller_tpu.data.simulate import sim_library_reads
    from xna_basecaller_tpu.eval.xna_refs import XnaRefs

    t0 = time.time()
    boot_model = args.boot_model
    if not os.path.exists(os.path.join(boot_model, "config.toml")):
        # no reusable phase-A basecaller (e.g. after a machine reset):
        # bootstrap one in-run, exactly as spliced_northstar phase A
        log(f"> boot model {boot_model} missing; bootstrapping in-run")
        from xna_basecaller_tpu.core import config as config_lib
        from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
        cfg_dir = os.path.join(args.out, "base_config")
        os.makedirs(cfg_dir, exist_ok=True)
        config_lib.save(ModelConfig(encoder=EncoderConfig(
            features=args.features, num_rnn_layers=args.layers)), cfg_dir)
        boot_model = ns.phase_a_bootstrap(args, cfg_dir)
    xna_dir, dna_dir = ns.phase_b_bootstrap_data(args, boot_model)

    refs = XnaRefs(args.exp)
    rng = np.random.default_rng(999)
    val_reads = list(sim_library_reads(
        refs, rng, args.val_reads, True, "heldout", read_len_chunks=1))

    results = {}
    for mode in args.modes.split(","):
        workdir = train_mode(args, mode, boot_model, dna_dir, xna_dir)
        res = eval_mode(args, workdir, val_reads, "val")
        results[mode] = {k: v for k, v in res.items()
                         if isinstance(v, (int, float))}
        log(f"> [{mode}] {json.dumps(results[mode])}")

    summary = {
        "exp": args.exp, "ubs": args.ubs, "epochs": args.epochs,
        "batch": args.batch, "wall_seconds": int(time.time() - t0),
        "reference_bars": {"fully_synth": 0.25, "hybrid": 0.10,
                           "spliced": 0.15},
        "results": results,
    }
    with open(os.path.join(args.out, "quickrun_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    log(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

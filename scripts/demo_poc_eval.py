#!/usr/bin/env python
"""Full-pipeline demo: POC-library reads -> basecall -> align -> UB metrics.

Simulates nanopore reads from the real POC template library (UBs as X on
the forward strand / Y on reverse, flanked by random DNA), basecalls them
with a trained model, and runs the complete evaluation chain
(seed-indexed alignment + barcode demux + UB analysis), printing the
results_summ metrics — the same shape as the reference's eval_model.sh run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", default="/tmp/smoke_train_ub")
    p.add_argument("--features", type=int, default=384)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--weights", type=int, default=None)
    p.add_argument("--reads-per-template", type=int, default=2)
    p.add_argument("--exp", default="POC", choices=["POC", "CPLX"])
    p.add_argument("--max-templates", type=int, default=0,
                   help="subsample templates (CPLX has 1024)")
    p.add_argument("--out", default="/tmp/demo_poc_eval")
    args = p.parse_args()

    import jax

    from xna_basecaller_tpu.core.alphabet import encode
    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.data.pore_model import load_pore_model
    from xna_basecaller_tpu.data.simulate import SimReadObj, simulate_squiggle
    from xna_basecaller_tpu.eval.xna_refs import XnaRefs
    from xna_basecaller_tpu.infer.basecall import run_basecaller
    from xna_basecaller_tpu.models.crf_model import Model, init_params
    from xna_basecaller_tpu.tools.eval_model import eval_model
    from xna_basecaller_tpu.train import checkpoint as ckpt

    cfg = ModelConfig(encoder=EncoderConfig(
        features=args.features, num_rnn_layers=args.layers))
    model = Model(cfg)
    template = init_params(jax.random.key(0), cfg)
    epoch = args.weights or ckpt.latest_epoch(args.model_dir)
    params = ckpt.load_tree(
        template, os.path.join(args.model_dir, f"weights_{epoch}.npz"))
    print(f"> loaded {args.model_dir}/weights_{epoch}.npz", flush=True)

    poc = XnaRefs(args.exp)
    pore = load_pore_model()
    rng = np.random.default_rng(7)

    def sim_read(rid, seq_str):
        flank_l = "".join("ACGT"[i] for i in rng.integers(0, 4, 150))
        flank_r = "".join("ACGT"[i] for i in rng.integers(0, 4, 150))
        codes = encode(flank_l + seq_str + flank_r)
        signal, _ = simulate_squiggle(codes, pore, rng)
        return SimReadObj(read_id=rid, signal=signal)

    from xna_basecaller_tpu.core.alphabet import reverse_complement_str
    reads = []
    tids = poc.targets_id
    if args.max_templates:
        idx = rng.choice(len(tids), size=args.max_templates, replace=False)
        tids = [tids[i] for i in sorted(idx)]
    for tid in tids:
        tar = poc.targets[tid].replace("N", "X")
        for i in range(args.reads_per_template):
            reads.append(sim_read(f"{tid}_F_{i}", tar))
            reads.append(sim_read(f"{tid}_R_{i}",
                                  reverse_complement_str(tar)))
    print(f"> simulated {len(reads)} reads from "
          f"{len(poc.targets_id)} templates", flush=True)

    os.makedirs(args.out, exist_ok=True)
    fq_path = os.path.join(args.out, f"reads-{args.exp}-demo.fastq")
    t0 = time.time()
    with open(fq_path, "w") as fq:
        stats = run_basecaller(model, params, iter(reads), fq,
                               chunksize=3600, overlap=500, batchsize=64)
    print(f"> basecalled {stats['reads']} reads in {stats['seconds']:.1f}s "
          f"({stats['samples_per_s']:.2E} samples/s)", flush=True)

    summary = eval_model(args.exp, args.out, split="demo",
                         reads_fastq=fq_path,
                         log=lambda *a: print(*a, flush=True))
    print(f"\n=== {args.exp} demo summary ===", flush=True)
    for k in ("num_aligned_reads", "demux", "align", "acc_xna", "acc_pc",
              "ub_acc", "ub_area_acc", "err_far_ub", "f1_score",
              "precision", "specificity"):
        v = summary.get(k)
        print(f"  {k}: {v:.2f}" if isinstance(v, float) else
              f"  {k}: {v}", flush=True)


if __name__ == "__main__":
    main()

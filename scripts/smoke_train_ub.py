#!/usr/bin/env python
"""Training smoke run: learn UB calling from synthetic data.

Simulates DNA ctc-data from the k-mer pore model, trains with the
device-side spike augmentation (UBs X/Y at ~10%), and reports chunk-level
validation accuracy plus UB emission stats per epoch — an end-to-end
functional proof of loss/augmentation/decode on real hardware.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunks", type=int, default=1024)
    p.add_argument("--chunk-len", type=int, default=2400)
    p.add_argument("--target-len", type=int, default=280)
    p.add_argument("--features", type=int, default=384)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ubs", default="XY")
    p.add_argument("--ub-prop", type=float, default=0.10)
    p.add_argument("--workdir", default="/tmp/smoke_train_ub")
    args = p.parse_args()

    from xna_basecaller_tpu.augment.spike import make_spike_augment
    from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
    from xna_basecaller_tpu.data.ctc_data import ChunkDataset
    from xna_basecaller_tpu.data.simulate import simulate_ctc_dataset
    from xna_basecaller_tpu.models.crf_model import Model
    from xna_basecaller_tpu.train.loop import Trainer

    t0 = time.time()
    print(f"> simulating {args.chunks} chunks...", flush=True)
    chunks, refs, lens, bkps = simulate_ctc_dataset(
        args.chunks, chunk_len=args.chunk_len,
        target_len=args.target_len, seed=0)
    print(f"> simulated in {time.time()-t0:.1f}s", flush=True)

    augment = make_spike_augment(ubs=args.ubs, prop_ubs=args.ub_prop,
                                 noise_std=1.0)
    n_val = max(args.batch, args.chunks // 16)
    train = ChunkDataset(chunks[:-n_val], refs[:-n_val], lens[:-n_val],
                         bkps[:-n_val], augment=augment)
    valid = ChunkDataset(chunks[-n_val:], refs[-n_val:], lens[-n_val:],
                         bkps[-n_val:], augment=augment,
                         epoch_reset_seed=True)

    cfg = ModelConfig(encoder=EncoderConfig(
        features=args.features, num_rnn_layers=args.layers))
    model = Model(cfg)
    trainer = Trainer(model, train, valid, batchsize=args.batch,
                      lr=args.lr, warmup_steps=50)

    t0 = time.time()
    out = trainer.fit(args.workdir, epochs=args.epochs)
    dt = time.time() - t0
    n_steps = args.epochs * (len(train) // args.batch)
    samples = n_steps * args.batch * args.chunk_len
    print(f"> trained {n_steps} steps in {dt:.1f}s "
          f"({samples/dt/1e6:.2f} Msamples/s train throughput)", flush=True)

    # UB emission check on the validation set
    import jax
    from xna_basecaller_tpu.train.loop import eval_scores
    c, t, l = next(valid.batches(args.batch))
    scores = eval_scores(out["params"], c, cfg)
    seqs = model.decode_batch(scores)
    n_ub_true = int((t > 4).sum())
    n_ub_called = sum(s.count("X") + s.count("Y") for s in seqs)
    print(f"> val batch: {n_ub_true} true UBs, {n_ub_called} called UBs",
          flush=True)
    for h in out["history"]:
        print(f"  epoch {h['epoch']}: val_loss={h['validation_loss']:.3f} "
              f"mean_acc={h['validation_mean']:.1f}% "
              f"median_acc={h['validation_median']:.1f}%", flush=True)


if __name__ == "__main__":
    main()

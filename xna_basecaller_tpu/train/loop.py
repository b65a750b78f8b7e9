"""Training loop: jitted data-parallel train step + epoch orchestration.

TPU-native re-design of the reference Trainer (reference: ub-bonito/bonito/
training.py:72-227):

* One jitted train step — bf16 encoder forward, f32 CTC-CRF loss, global
  grad-norm clip 2.0, AdamW with warmup-cosine schedule (the reference's
  amp.autocast/GradScaler machinery is unnecessary on TPU: bf16 has fp32
  range, so there is no loss-scaling state).
* Data parallelism: batches sharded over the mesh 'data' axis, params
  replicated; XLA inserts the ICI psum for gradients.
* Per-step CSV loss log, per-epoch weights_{N}.npz (+optim every
  save_optim_every), resume from the latest epoch, validation by decode +
  Smith-Waterman accuracy (mean/median) — same artifacts and semantics as
  the reference (training.py:119-227).
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass, field
from functools import partial
from time import perf_counter
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xna_basecaller_tpu.core.alphabet import decode as decode_codes
from xna_basecaller_tpu.eval.accuracy import accuracy
from xna_basecaller_tpu.models import crf_model
from xna_basecaller_tpu.parallel import mesh as mesh_lib
from xna_basecaller_tpu.train import checkpoint as ckpt
from xna_basecaller_tpu.train.schedule import linear_warmup_cosine_decay

CLIP_NORM = 2.0


def make_optimizer(lr_schedule, weight_decay: float = 1e-2):
    """AdamW + global-norm clip 2.0 (reference training.py:112-115, 184)."""
    return optax.chain(
        optax.clip_by_global_norm(CLIP_NORM),
        optax.adamw(learning_rate=lr_schedule, weight_decay=weight_decay),
    )


def _crf_step_body(params, opt_state, chunks, targets, lengths,
                   cfg, optimizer, compute_dtype, grad_accum_split,
                   dropout_rng):
    """Un-jitted CRF step math shared by train_step (one dispatch per
    step) and train_step_multi (lax.scan over a step-stack)."""
    use_dropout = (cfg.encoder.drop_rate > 0
                   or cfg.encoder.drop_rate_bottom > 0)

    def loss_fn(p, c, t, l):
        scores = crf_model.forward(
            p, c, cfg, compute_dtype,
            dropout_rng=dropout_rng if use_dropout else None)
        # Masked mean: rows padded for mesh divisibility have length 0 and
        # must not contribute (their 1/length loss normaliser is singular).
        per_sample = crf_model.Model(cfg).seqdist.ctc_loss(
            scores.astype(jnp.float32), t,
            jnp.maximum(l, cfg.state_len + 1), reduction="none")
        valid = (l > 0).astype(jnp.float32)
        return jnp.sum(per_sample * valid) / jnp.maximum(valid.sum(), 1.0)

    if grad_accum_split <= 1:
        loss, grads = jax.value_and_grad(loss_fn)(
            params, chunks, targets, lengths)
    else:
        k = grad_accum_split
        B = chunks.shape[0]
        mb = B // k
        cs = chunks[: k * mb].reshape(k, mb, *chunks.shape[1:])
        ts = targets[: k * mb].reshape(k, mb, *targets.shape[1:])
        ls = lengths[: k * mb].reshape(k, mb)

        def body(carry, xs):
            loss_acc, grads_acc = carry
            c, t, l = xs
            loss_i, grads_i = jax.value_and_grad(loss_fn)(params, c, t, l)
            return (loss_acc + loss_i / k,
                    jax.tree.map(lambda a, b: a + b / k, grads_acc,
                                 grads_i)), None

        zero_grads = jax.tree.map(jnp.zeros_like, params)
        (loss, grads), _ = jax.lax.scan(
            body, (jnp.float32(0.0), zero_grads), (cs, ts, ls))

    grad_norm = optax.global_norm(grads)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, grad_norm


@partial(jax.jit, static_argnames=("cfg", "optimizer", "compute_dtype",
                                   "grad_accum_split"),
         donate_argnames=("params", "opt_state"))
def train_step(params, opt_state, chunks, targets, lengths,
               cfg, optimizer, compute_dtype=jnp.bfloat16,
               grad_accum_split: int = 1, dropout_rng=None):
    """One optimisation step; returns (params, opt_state, loss, grad_norm).

    ``grad_accum_split`` > 1 runs the batch as micro-batches with summed
    gradients and a single update (reference training.py:91-110).

    Legacy CTC (QuartzNet) configs delegate to the CTC family's step,
    which also maintains batchnorm running stats (no accum support there).
    """
    if cfg.is_ctc:
        from xna_basecaller_tpu.models import ctc_model
        return ctc_model.train_step(
            params, opt_state, chunks, targets, lengths, cfg, optimizer,
            dropout_rng=dropout_rng)
    return _crf_step_body(params, opt_state, chunks, targets, lengths,
                          cfg, optimizer, compute_dtype, grad_accum_split,
                          dropout_rng)


@partial(jax.jit, static_argnames=("cfg", "optimizer", "compute_dtype",
                                   "grad_accum_split"),
         donate_argnames=("params", "opt_state"))
def train_step_multi(params, opt_state, chunks, targets, lengths,
                     step_ids, base_rng, cfg, optimizer,
                     compute_dtype=jnp.bfloat16,
                     grad_accum_split: int = 1):
    """K optimisation steps in ONE device execution (lax.scan over the
    leading step axis of [K, B, ...] stacks).

    The training analog of the inference superbatch: through a tunneled
    runtime every dispatch pays a relay round-trip, so stacking K steps
    amortises it K-fold while keeping the math identical to K sequential
    train_step calls (same per-step dropout rngs via fold_in(base_rng,
    step_id); the optimizer's schedule steps through opt_state's own
    count).  CRF models only — the legacy CTC step mutates batchnorm
    stats and stays per-dispatch.

    Returns (params, opt_state, losses [K], grad_norms [K]).
    """
    assert not cfg.is_ctc, "train_step_multi supports CRF configs only"

    def body(carry, xs):
        p, s = carry
        c, t, l, sid = xs
        rng = jax.random.fold_in(base_rng, sid)
        p, s, loss, gn = _crf_step_body(
            p, s, c, t, l, cfg, optimizer, compute_dtype,
            grad_accum_split, rng)
        return (p, s), (loss, gn)

    (params, opt_state), (losses, grad_norms) = jax.lax.scan(
        body, (params, opt_state), (chunks, targets, lengths, step_ids))
    return params, opt_state, losses, grad_norms


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def eval_scores(params, chunks, cfg, compute_dtype=jnp.bfloat16):
    if cfg.is_ctc:
        from xna_basecaller_tpu.models import ctc_model
        return ctc_model.forward(params, chunks, cfg)
    return crf_model.forward(params, chunks, cfg, compute_dtype,
                             inference=True)


class CSVLogger:
    """Append-mode CSV with header-on-create (reference io.py:322-356)."""

    def __init__(self, path: str):
        self.path = path
        self._fh = None
        self._writer = None
        self._count = 0

    def append(self, row: dict):
        if self._fh is None:
            exists = os.path.exists(self.path) and os.path.getsize(self.path)
            self._fh = open(self.path, "a", newline="")
            self._writer = csv.DictWriter(self._fh, fieldnames=list(row))
            if not exists:
                self._writer.writeheader()
        self._writer.writerow(row)
        self._count += 1
        if self._count % 100 == 0:
            self._fh.flush()

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


@dataclass
class Trainer:
    """Epoch orchestration mirroring the reference Trainer surface."""

    model: crf_model.Model
    train_data: Any
    valid_data: Any
    batchsize: int = 64
    lr: float = 5e-4
    weight_decay: float = 1e-2
    warmup_steps: int = 500
    save_optim_every: int = 10
    restore_optim: bool = False
    grad_accum_split: int = 1
    steps_per_dispatch: int = 1
    compute_dtype: Any = jnp.bfloat16
    seed: int = 25
    frozen_predicate: Callable | None = None
    initial_params: Any = None
    mesh: Any = None
    log: Callable = print
    _steps_per_epoch: int = field(init=False, default=0)

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = mesh_lib.make_mesh()
        self._steps_per_epoch = max(
            1, len(self.train_data) // self.batchsize)

    def _lr_schedule(self, epochs: int, last_epoch: int):
        total = epochs * self._steps_per_epoch
        return linear_warmup_cosine_decay(
            self.lr, total_steps=total, warmup_steps=self.warmup_steps,
            start_step=last_epoch * self._steps_per_epoch)

    def fit(self, workdir: str, epochs: int = 1) -> dict:
        os.makedirs(workdir, exist_ok=True)
        params = (self.initial_params if self.initial_params is not None
                  else self.model.init(jax.random.key(self.seed)))

        # resume
        opt_probe = make_optimizer(lambda _: self.lr,
                                   self.weight_decay).init(params)
        last_epoch, params, opt_state0 = ckpt.load_checkpoint(
            workdir, params, opt_probe if self.restore_optim else None)
        if last_epoch:
            self.log(f"[picking up state from epoch {last_epoch}]")

        schedule = self._lr_schedule(epochs, last_epoch)
        optimizer = make_optimizer(schedule, self.weight_decay)
        if self.frozen_predicate is not None:
            optimizer = optax.multi_transform(
                {"train": optimizer, "frozen": optax.set_to_zero()},
                param_labels=self._freeze_labels(params))
        opt_state = (opt_state0 if (self.restore_optim and last_epoch)
                     else optimizer.init(params))

        params = mesh_lib.replicate(self.mesh, params)
        opt_state = mesh_lib.replicate(self.mesh, opt_state)

        history = []
        step = 0
        # `epochs` is the TOTAL epoch count: resume trains from
        # last_epoch+1 up to it (reference training.py:189-204), so a
        # relaunched run converges instead of extending forever.
        if last_epoch >= epochs:
            self.log(f"[already trained to epoch {last_epoch} >= {epochs}]")
        for epoch in range(1 + last_epoch, epochs + 1):
            try:
                history, step = self._run_epoch(
                    workdir, epoch, params_box := [params, opt_state],
                    optimizer, schedule, history, step)
                params, opt_state = params_box
            except KeyboardInterrupt:
                # break the epoch loop cleanly; prior epochs are already
                # checkpointed (reference training.py:210-211)
                self.log("[interrupted: stopping after last checkpoint]")
                break
        return {"params": jax.device_get(params), "history": history}

    def _run_epoch(self, workdir, epoch, state_box, optimizer, schedule,
                   history, step):
        params, opt_state = state_box
        if True:
            t0 = perf_counter()
            chunks_seen = 0
            last_t = 0.0
            # Defer loss/grad-norm materialisation: a per-step host sync
            # costs a full device round-trip; keep the scalars on device
            # and fetch them in one stacked transfer at epoch end.
            dev_stats = []
            rows = []
            # prefetch: augmentation (device-side jit) + batch sharding of
            # batch k+1 overlap with step k's dispatch
            from xna_basecaller_tpu.utils.pipeline import thread_iter

            # steps_per_dispatch > 1 stacks K consecutive batches and
            # runs them as one lax.scan dispatch (train_step_multi):
            # same math, 1/K the relay round-trips.  CTC stays 1 (its
            # step mutates batchnorm stats outside the scanned carry).
            K = (self.steps_per_dispatch
                 if not self.model.cfg.is_ctc else 1)
            base_rng = jax.random.key(self.seed)

            def _prefetched():
                group = []
                for batch in self.train_data.batches(
                        self.batchsize, shuffle=True,
                        seed=self.seed + epoch, drop_last=True):
                    if K <= 1:
                        yield 1, batch[0].shape[0], self._shard(batch)
                        continue
                    group.append(batch)
                    if len(group) == K:
                        n = sum(b[0].shape[0] for b in group)
                        yield K, n, self._shard_stack(group)
                        group = []
                for batch in group:  # leftover < K: single dispatches
                    yield 1, batch[0].shape[0], self._shard(batch)

            for k, n_in_batch, arrs in thread_iter(_prefetched(),
                                                   maxsize=2):
                if k == 1:
                    c, t, l = arrs
                    params, opt_state, loss, grad_norm = train_step(
                        params, opt_state, c, t, l, self.model.cfg,
                        optimizer, self.compute_dtype,
                        self.grad_accum_split,
                        jax.random.fold_in(base_rng, step))
                    stats_k = [(loss, grad_norm)]
                else:
                    c, t, l = arrs
                    step_ids = jnp.arange(step, step + k, dtype=jnp.int32)
                    params, opt_state, losses, gns = train_step_multi(
                        params, opt_state, c, t, l, step_ids, base_rng,
                        self.model.cfg, optimizer, self.compute_dtype,
                        self.grad_accum_split)
                    stats_k = [(losses[i], gns[i]) for i in range(k)]
                # Attribute chunks/time per step (not once per stack) so
                # a K-stacked dispatch's losses_N.csv x-axes line up with
                # single-dispatch runs: step i of the stack is credited
                # its share of the stack's chunks and wall time.
                now = perf_counter() - t0
                for i, (loss, grad_norm) in enumerate(stats_k):
                    frac = (i + 1) / len(stats_k)
                    dev_stats.append((loss, grad_norm))
                    rows.append({
                        "chunks": chunks_seen + round(n_in_batch * frac),
                        "time": last_t + frac * (now - last_t),
                        "lr": float(schedule(step)),
                    })
                    step += 1
                chunks_seen += n_in_batch
                last_t = now
            losses = np.asarray(jnp.stack([s[0] for s in dev_stats]))
            grad_norms = np.asarray(jnp.stack([s[1] for s in dev_stats]))
            smoothed = None
            with CSVLogger(os.path.join(
                    workdir, f"losses_{epoch}.csv")) as loss_log:
                for row, lo, gn in zip(rows, losses, grad_norms):
                    smoothed = float(lo) if smoothed is None else (
                        0.01 * float(lo) + 0.99 * smoothed)
                    loss_log.append({
                        "chunks": row["chunks"], "time": row["time"],
                        "grad_norm": float(gn), "lr": row["lr"],
                        "loss": float(lo),
                    })
            duration = perf_counter() - t0

            ckpt.save_checkpoint(
                workdir, epoch, jax.device_get(params),
                jax.device_get(opt_state),
                save_optim=(epoch % self.save_optim_every == 0))

            val_loss, val_mean, val_median = self.validate(params)
            self.log(
                f"[epoch {epoch}] directory={workdir} loss={val_loss:.4f} "
                f"mean_acc={val_mean:.3f}% median_acc={val_median:.3f}%")
            row = {
                "time": perf_counter(),
                "duration": int(duration),
                "epoch": epoch,
                "train_loss": smoothed,
                "validation_loss": val_loss,
                "validation_mean": val_mean,
                "validation_median": val_median,
            }
            with CSVLogger(os.path.join(workdir, "training.csv")) as tl:
                tl.append(row)
            history.append(row)
        state_box[0] = params
        state_box[1] = opt_state
        return history, step

    def _freeze_labels(self, params):
        pred = self.frozen_predicate

        def label(path, _leaf):
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                           for p in path)
            return "frozen" if pred(key) else "train"

        return jax.tree_util.tree_map_with_path(label, params)

    def _shard(self, batch):
        n_dev = len(self.mesh.devices.flat)
        padded = [mesh_lib.pad_to_multiple(np.asarray(a), n_dev)[0]
                  for a in batch]
        return mesh_lib.shard_batch(self.mesh, *padded)

    def _shard_stack(self, batches):
        """[K, B, ...] stacks for train_step_multi, batch axis sharded."""
        n_dev = len(self.mesh.devices.flat)
        padded = [[mesh_lib.pad_to_multiple(np.asarray(a), n_dev)[0]
                   for a in b] for b in batches]
        stacks = [np.stack([p[i] for p in padded])
                  for i in range(len(padded[0]))]
        return mesh_lib.shard_stacked_batch(self.mesh, *stacks)

    def validate(self, params, max_batches: int | None = None):
        """Chunk-level validation: loss + decode accuracy vs targets
        (reference training.py:159-181; accuracy min_coverage 0.5)."""
        losses, accs = [], []
        n = 0
        for c, t, l in self.valid_data.batches(self.batchsize):
            c_s, t_s, l_s = self._shard((c, t, l))
            scores = eval_scores(params, c_s, self.model.cfg,
                                 self.compute_dtype)
            scores = scores[:, : c.shape[0]]
            losses.append(float(self.model.loss(
                scores, t_s[: c.shape[0]], l_s[: c.shape[0]])))
            seqs = self.model.decode_batch(scores)
            refs = [decode_codes(row[:length], self.model.alphabet)
                    for row, length in zip(t, l)]
            accs.extend(
                accuracy(ref, seq, min_coverage=0.5) if len(seq) else 0.0
                for ref, seq in zip(refs, seqs))
            n += 1
            if max_batches is not None and n >= max_batches:
                break
        if not accs:
            return float("nan"), 0.0, 0.0
        return (float(np.mean(losses)), float(np.mean(accs)),
                float(np.median(accs)))

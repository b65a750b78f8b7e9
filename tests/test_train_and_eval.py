"""End-to-end orchestration test: train -> per-epoch validation ->
best-epoch selection -> test eval, on a tiny model and synthetic data."""

import os

import numpy as np
import pytest

from xna_basecaller_tpu.core import config as config_lib
from xna_basecaller_tpu.core.alphabet import reverse_complement_str
from xna_basecaller_tpu.core.config import EncoderConfig, ModelConfig
from xna_basecaller_tpu.data.ctc_data import save_ctc_data
from xna_basecaller_tpu.data.simulate import simulate_ctc_dataset
from xna_basecaller_tpu.data.writers import write_fastq
from xna_basecaller_tpu.eval.xna_refs import XnaRefs
from xna_basecaller_tpu.tools.train_and_eval import (
    run_ub_validation, train_and_eval,
)


def test_full_pipeline_orchestration(tmp_path):
    poc = XnaRefs("POC")
    # ctc training data
    data_dir = tmp_path / "data"
    chunks, refs, lens, bkps = simulate_ctc_dataset(
        12, chunk_len=400, target_len=50, seed=0)
    save_ctc_data(str(data_dir), chunks, refs, lens, bkps)

    # model config
    cfg = ModelConfig(encoder=EncoderConfig(
        features=32, num_rnn_layers=2, winlen=9))
    cfg_dir = tmp_path / "cfg"
    cfg_dir.mkdir()
    config_lib.save(cfg, str(cfg_dir))

    workdir = str(tmp_path / "run")

    # inject per-epoch "basecalls": epoch 2 better than epoch 1
    def make_fastq(path, corrupt):
        with open(path, "w") as fh:
            for tid in ["XNA01", "XNA02"]:
                seq = poc.targets[tid].replace("N", "X")
                if corrupt:
                    p = seq.index("X")
                    seq = seq[:p] + "A" + seq[p + 1:]
                write_fastq(fh, f"{tid}_f", seq, "I" * len(seq))

    # 1) train 2 epochs via the orchestrator (no real val/test reads dirs)
    out = train_and_eval(workdir, str(data_dir), exp="POC", epochs=2,
                         batch=4, config=str(cfg_dir), ubs="",
                         log=lambda *a: None)
    assert os.path.exists(os.path.join(workdir, "weights_2.npz"))

    # 2) per-epoch validation with injected fastqs
    fq = {}
    for epoch, corrupt in ((1, True), (2, False)):
        d = tmp_path / f"fq{epoch}"
        d.mkdir()
        p = str(d / "reads.fastq")
        make_fastq(p, corrupt)
        fq[epoch] = p
    best = run_ub_validation(workdir, "POC", fastq_per_epoch=fq,
                             log=lambda *a: None)
    assert best == 2
    assert os.path.islink(os.path.join(workdir, "weights_99.npz"))
    for epoch in (1, 2):
        assert os.path.exists(os.path.join(
            workdir, f"basecalls-weights_{epoch}",
            "results_summ-POC-val.csv"))

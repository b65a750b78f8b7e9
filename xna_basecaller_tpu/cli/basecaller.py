"""``xnacall basecaller`` — basecall fast5 reads to FASTQ/SAM, optionally
aligning to a reference and emitting new ctc training data.

Reference surface: ub-bonito/bonito/cli/basecaller.py (incl. --save-ctc,
--revcomp, --reference).
"""

from __future__ import annotations

import argparse
import itertools
import sys
from time import perf_counter


def main(args):
    from xna_basecaller_tpu.data.fast5 import get_reads, read_chunks
    from xna_basecaller_tpu.data.writers import (
        CtcDataWriter, SamWriter, mean_qscore_from_qstring, summary_row,
        write_fastq,
    )
    from xna_basecaller_tpu.infer.basecall import basecall
    from xna_basecaller_tpu.utils.model_io import load_model

    sys.stderr.write(f"> loading model {args.model_directory}\n")
    # comma-separated dirs decode as a score-averaging checkpoint
    # ensemble (infer.basecall._apply_maybe_ensemble)
    model_dirs = args.model_directory.split(",")
    model, params, cfg = load_model(
        model_dirs[0], weights=args.weights or None,
        chunksize=args.chunksize, batchsize=args.batchsize,
        overlap=args.overlap)
    if len(model_dirs) > 1:
        if cfg.is_ctc:
            sys.stderr.write(
                "> ensembles are CRF-only (legacy CTC decode takes one "
                "model)\n")
            exit(1)
        params = [params]
        for d in model_dirs[1:]:
            _, p_d, cfg_d = load_model(
                d, weights=args.weights or None,
                chunksize=args.chunksize, batchsize=args.batchsize,
                overlap=args.overlap)
            if (cfg_d.is_ctc or cfg_d.alphabet != cfg.alphabet
                    or cfg_d.state_len != cfg.state_len
                    or cfg_d.encoder != cfg.encoder):
                sys.stderr.write(
                    f"> ensemble member {d} is architecturally "
                    f"incompatible with {model_dirs[0]} (alphabet/"
                    "state_len/encoder must match)\n")
                exit(1)
            params.append(p_d)

    targets = None
    if args.reference:
        from xna_basecaller_tpu.eval.xna_refs import read_fasta
        sys.stderr.write("> loading reference\n")
        targets = read_fasta(args.reference)
    if args.save_ctc and not args.reference:
        sys.stderr.write(
            "> a reference is needed to output ctc training data\n")
        exit(1)

    read_ids = None
    if args.read_ids:
        with open(args.read_ids) as fh:
            read_ids = {line.strip().split()[0]
                        for line in fh if line.strip()}

    # Ctrl-C sets the cancel event: read producers drain, the pipeline
    # finishes in-flight batches and shuts down in order (reference
    # multiprocessing.process_cancel + fast5.py:295-296).
    from xna_basecaller_tpu.utils.pipeline import cancel_on_sigint
    cancel = cancel_on_sigint()

    reads = get_reads(
        args.reads_directory, read_ids=read_ids, skip=args.skip,
        n_proc=8, recursive=args.recursive, cancel=cancel)
    if args.max_reads:
        reads = itertools.islice(reads, args.max_reads)

    chunksize = cfg.basecaller.chunksize
    if args.save_ctc:
        reads = (
            chunk for read in reads
            for chunk in read_chunks(
                read, chunksize=chunksize,
                overlap=cfg.basecaller.overlap)
        )
        ctc_writer = CtcDataWriter(
            args.save_ctc, min_coverage=args.ctc_min_coverage,
            min_accuracy=args.ctc_min_accuracy, ub_only=args.ub_only,
            log=lambda *a: sys.stderr.write(" ".join(map(str, a)) + "\n"))
    else:
        ctc_writer = None

    # read group <model_name> (reference io.py:86-111 uses
    # <run_id>_<model>; run_id is per-read here, so the stable part)
    import os
    read_group = args.read_group or os.path.basename(
        os.path.normpath(model_dirs[0]))
    sam = None
    if args.sam and targets is not None:
        sam = SamWriter(sys.stdout, targets, read_group=read_group)
    bam = None
    if args.bam is not None:
        if targets is None:
            sys.exit("--bam requires --reference")
        from xna_basecaller_tpu.data.bam import BamWriter
        bam = BamWriter(args.bam, targets, read_group=read_group)
    cram_w = None
    if args.cram is not None:
        from xna_basecaller_tpu.data.cram import CramWriter
        cram_w = CramWriter(args.cram, targets, read_group=read_group)

    mods_model = None
    if args.mods_model:
        from xna_basecaller_tpu.mods import load_mods_model
        mods_model = load_mods_model(args.mods_model)
        sys.stderr.write(
            f"> mods model: {mods_model[0].mod_long_name} "
            f"({mods_model[0].motif})\n")

    summary_fh = open(args.summary, "w") if args.summary else None
    summary_header_written = False

    def align(seq):
        if targets is None:
            return None, None
        from xna_basecaller_tpu.eval.ref_align import align_read
        rec = align_read("q", seq, targets)
        if rec is None:
            return None, None
        refseq = targets[rec.target_id][rec.target_start:rec.target_end]
        return rec.as_dict(), refseq

    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)

    t0 = perf_counter()
    n_reads = 0
    n_samples = 0
    if cfg.is_ctc:
        # legacy QuartzNet family: score-level stitch + host beam decode
        # (reference ctc/basecall.py:14-29)
        from xna_basecaller_tpu.infer.ctc_basecall import basecall_ctc
        called = basecall_ctc(
            model, params, reads, chunksize=chunksize,
            overlap=cfg.basecaller.overlap,
            batchsize=cfg.basecaller.batchsize, beamsize=args.beamsize,
            qscores=args.qscores, cancel=cancel)
    else:
        called = basecall(
            model, params, reads, chunksize=chunksize,
            overlap=cfg.basecaller.overlap,
            batchsize=cfg.basecaller.batchsize, reverse=args.revcomp,
            qscores=args.qscores, cancel=cancel,
            quantize=args.quantize or cfg.basecaller.quantize,
            beam_width=args.beam, superbatch=args.superbatch,
            ub_bias=args.ub_bias)
    try:
        for read, attrs in called:
            n_reads += 1
            n_samples += len(read.signal)
            seq, qstring = attrs["sequence"], attrs["qstring"]
            mean_q = attrs.get("mean_qscore",
                               mean_qscore_from_qstring(qstring))
            mapping, refseq = (None, None)
            if targets is not None and len(seq):
                mapping, refseq = align(seq)
            if ctc_writer is not None:
                ctc_writer.add(read.signal[:chunksize], seq, mapping,
                               refseq=refseq)
            mods_tags = None
            if mods_model is not None and len(seq):
                from xna_basecaller_tpu.mods import call_mods
                attrs = call_mods(mods_model, read, attrs)
                mods_tags = attrs.get("mods")
            if len(seq):
                if bam is not None:
                    bam.write(read.read_id, seq, qstring, mapping,
                              tags=mods_tags)
                if cram_w is not None:
                    cram_w.write(read.read_id, seq, qstring, mapping,
                                 tags=mods_tags)
                if sam is not None:
                    sam.write(read.read_id, seq, qstring, mapping,
                              tags=mods_tags)
                elif bam is None and cram_w is None:
                    write_fastq(sys.stdout, read.read_id, seq, qstring,
                                tags=mods_tags)
            if summary_fh is not None:
                row = summary_row(read, len(seq), mean_q, alignment=mapping)
                if not summary_header_written:
                    summary_fh.write("\t".join(row) + "\n")
                    summary_header_written = True
                summary_fh.write(
                    "\t".join(str(v) for v in row.values()) + "\n")
        duration = perf_counter() - t0
        if args.profile:
            import jax
            jax.profiler.stop_trace()
            sys.stderr.write(f"> profile trace: {args.profile}\n")
        if bam is not None:
            bam.close()
        if cram_w is not None:
            cram_w.close()
        if ctc_writer is not None:
            ctc_writer.save()
        sys.stderr.write(f"> completed reads: {n_reads}\n")
        sys.stderr.write(f"> duration: {duration:.2f}s\n")
        if duration > 0:
            sys.stderr.write(
                f"> samples per second {n_samples / duration:.1E}\n")
        sys.stderr.write("> done\n")
    finally:
        if summary_fh:
            summary_fh.close()


def argparser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        add_help=False)
    parser.add_argument(
        "model_directory",
        help="model dir; a comma-separated list decodes as a "
             "score-averaging checkpoint ensemble")
    parser.add_argument("reads_directory")
    parser.add_argument("--reference", default=None,
                        help="reference fasta for alignment")
    parser.add_argument("--sam", action="store_true",
                        help="emit SAM instead of FASTQ (needs --reference)")
    parser.add_argument("--cram", default=None, metavar="PATH",
                        help="write basecalls as a CRAM 3.0 container "
                             "(unmapped records; the reference's pysam "
                             "'wc' mode, io.py:391-401)")
    parser.add_argument("--bam", default=None, metavar="PATH",
                        help="also write binary BAM to PATH "
                             "(needs --reference)")
    parser.add_argument("--read-ids", default=None,
                        help="file of read ids to include")
    parser.add_argument("--skip", action="store_true",
                        help="treat --read-ids as an exclude list")
    parser.add_argument("--beamsize", default=5, type=int,
                        help="CTC-family beam width (1 = greedy)")
    parser.add_argument("--beam", default=0, type=int, metavar="W",
                        help="CRF path-collapsing beam width (0 = Viterbi; "
                             "koi beam-search equivalent, XNA-capable)")
    parser.add_argument("--revcomp", action="store_true",
                        help="reverse-complement decoding (R strand)")
    parser.add_argument("--qscores", action="store_true",
                        help="emit real per-base qualities from posterior "
                             "confidences (reference UB path uses dummies)")
    parser.add_argument("--recursive", action="store_true")
    parser.add_argument("--weights", default=0, type=int,
                        help="checkpoint epoch (0 = latest)")
    parser.add_argument("--chunksize", default=None, type=int)
    parser.add_argument("--overlap", default=None, type=int)
    parser.add_argument("--batchsize", default=None, type=int)
    parser.add_argument("--superbatch", default=1, type=int, metavar="G",
                        help="stack G batches per device execution "
                             "(amortises per-execution runtime cost; "
                             "sub-batches run serially in-jit). Ignored "
                             "(runs as 1, with a warning) together with "
                             "--qscores or --beam")
    parser.add_argument("--ub-bias", default=0.0, type=float,
                        help="decode-time score bias on UB-emitting "
                             "transitions: >0 raises UB recall, <0 "
                             "raises UB precision/lowers FDR (frontier "
                             "in results/ub_bias_frontier_r05)")
    parser.add_argument("--max-reads", default=0, type=int)
    parser.add_argument("--summary", default=None,
                        help="write per-read summary tsv here")
    parser.add_argument("--save-ctc", default=None,
                        help="directory to write ctc training data")
    parser.add_argument("--ctc-min-coverage", default=0.90, type=float)
    parser.add_argument("--ctc-min-accuracy", default=0.95, type=float)
    parser.add_argument("--ub-only", action="store_true",
                        help="keep only chunks whose reference contains a UB")
    parser.add_argument("--mods-model", default=None, metavar="DIR",
                        help="modified-base model directory (emits MM/ML "
                             "tags; reference's remora hook, mod_util.py)")
    parser.add_argument("--quantize", action="store_true",
                        help="int8 signal uploads (half the host->device "
                             "bytes; dequantised on device — the TPU "
                             "analog of the reference's --quantize)")
    parser.add_argument("--read-group", default=None,
                        help="@RG id for SAM/BAM output (default: model "
                             "directory name)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="write a jax.profiler trace (XLA + Pallas "
                             "kernel timeline) for the run to DIR")
    return parser

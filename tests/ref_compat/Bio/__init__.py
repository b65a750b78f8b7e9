"""Minimal Bio(python) stand-in for running the reference analyzer here.

biopython is not installed in this image; the reference's analyze_paf path
only uses SeqIO fastq/fasta reading (records with .id/.seq/
.letter_annotations) and imports Align/Seq/SeqRecord names without
touching them on the PAF+cs code path.  This package provides exactly that
surface so /root/reference/src/tools/analyze_paf.py runs unmodified for
the golden-parity tests (tests/test_golden_analyze.py).
"""

class PairwiseAligner:
    """Imported by misc.utils but only used on the fasta (non-PAF) path,
    which the golden tests never exercise."""

    def __init__(self, *a, **kw):
        raise NotImplementedError(
            "Bio.Align stub: PairwiseAligner is not available")

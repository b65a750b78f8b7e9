class SeqRecord:
    def __init__(self, seq, id=None, description="", quals=None):
        self.seq = seq
        self.id = id
        self.description = description
        self.letter_annotations = (
            {"phred_quality": quals} if quals is not None else {})

    def __len__(self):
        return len(str(self.seq))

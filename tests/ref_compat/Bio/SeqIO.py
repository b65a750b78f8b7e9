"""fastq/fasta parsing surface used by the reference analyzer."""

from Bio.SeqRecord import SeqRecord


def _parse_fastq(handle):
    while True:
        header = handle.readline()
        if not header:
            return
        seq = handle.readline().rstrip("\n")
        handle.readline()  # '+'
        qual = handle.readline().rstrip("\n")
        rid = header[1:].rstrip("\n").split()[0]
        yield SeqRecord(seq, rid, quals=[ord(c) - 33 for c in qual])


def _parse_fasta(handle):
    rid, chunks = None, []
    for line in handle:
        line = line.rstrip("\n")
        if line.startswith(">"):
            if rid is not None:
                yield SeqRecord("".join(chunks), rid)
            rid = line[1:].split()[0]
            chunks = []
        else:
            chunks.append(line)
    if rid is not None:
        yield SeqRecord("".join(chunks), rid)


def parse(path_or_handle, fmt):
    handle = (open(path_or_handle) if isinstance(path_or_handle, str)
              else path_or_handle)
    if fmt.startswith("fastq"):
        yield from _parse_fastq(handle)
    elif fmt.startswith("fasta"):
        yield from _parse_fasta(handle)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def index(path, fmt):
    return {rec.id: rec for rec in parse(path, fmt)}


def write(record, handle, fmt):
    if fmt.startswith("fasta"):
        handle.write(f">{record.id}\n{record.seq}\n")
    elif fmt.startswith("fastq"):
        quals = record.letter_annotations.get(
            "phred_quality", [40] * len(str(record.seq)))
        handle.write(f"@{record.id}\n{record.seq}\n+\n"
                     + "".join(chr(q + 33) for q in quals) + "\n")
    else:
        raise ValueError(f"unsupported format: {fmt}")

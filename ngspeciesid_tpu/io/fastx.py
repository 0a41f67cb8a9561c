"""fasta/fastq codec.

Parsing semantics follow the lh3 ``readfq`` contract the reference uses
(modules/help_functions.py:13-42): records start at '>' or '@'; the full
header line (minus the marker) is the accession, internal whitespace kept;
sequences may span multiple lines; fastq quality is read until its length
reaches the sequence length.  Unlike the reference we do not chop the final
character when a file lacks a trailing newline.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple


def read_fastx(path: str) -> Iterator[Tuple[str, str, Optional[str]]]:
    """Yield ``(name, seq, qual)`` records; ``qual`` is None for fasta."""
    with open(path, "rb") as f:
        data = f.read()
    lines = data.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        if not line or line[0] not in (62, 64):  # '>' '@'
            i += 1
            continue
        name = line[1:].decode("ascii")
        i += 1
        seq_parts: List[bytes] = []
        while i < n and lines[i][:1] not in (b"+", b">", b"@"):
            seq_parts.append(lines[i])
            i += 1
        seq = b"".join(seq_parts)
        if i < n and lines[i][:1] == b"+":
            i += 1
            qual_parts: List[bytes] = []
            qlen = 0
            while i < n and qlen < len(seq):
                qual_parts.append(lines[i])
                qlen += len(lines[i])
                i += 1
            qual = b"".join(qual_parts)
            if qlen >= len(seq):
                yield name, seq.decode("ascii"), qual.decode("ascii")
            else:  # truncated fastq record -> fasta fallback, like readfq
                yield name, seq.decode("ascii"), None
        else:
            yield name, seq.decode("ascii"), None


def write_fastq_records(path: str, records) -> None:
    """Write ``(name, seq, qual)`` records as 4-line fastq."""
    with open(path, "w") as f:
        for name, seq, qual in records:
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")


def write_fasta_records(path: str, records) -> None:
    with open(path, "w") as f:
        for name, seq in records:
            f.write(f">{name}\n{seq}\n")


def mkdir_p(path: str) -> None:
    os.makedirs(path, exist_ok=True)

"""Streaming FASTA/FASTQ(.gz) reader with bounded chunks.

Capability match of the reference's kseq-based loader
(src/Reads.cpp:46-142): reads are streamed in ~chunk_bytes batches (the
reference bounds chunks at 100 MB, src/baseFAST.cpp:59), each read keeps
(name, seq, qual, is_fastq).  Names are cut at the first whitespace (kseq
semantics)."""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Iterator, List, Optional


@dataclass
class Read:
    name: str
    seq: bytes
    qual: Optional[bytes]  # None for FASTA

    @property
    def is_fastq(self) -> bool:
        return self.qual is not None


def _open(path):
    path = str(path)
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb", buffering=1 << 20)


def read_fastx(path) -> Iterator[Read]:
    """Yield reads one by one."""
    with _open(path) as f:
        first = f.peek(1)[:1] if hasattr(f, "peek") else b""
        if not first:
            first = b""
        line = f.readline()
        while line:
            line = line.strip()
            if not line:
                line = f.readline()
                continue
            if line.startswith(b">"):  # FASTA record
                name = line[1:].split()[0].decode()
                seq_parts = []
                line = f.readline()
                while line and not line.startswith(b">") and not line.startswith(b"@"):
                    seq_parts.append(line.strip())
                    line = f.readline()
                yield Read(name, b"".join(seq_parts), None)
            elif line.startswith(b"@"):  # FASTQ record (kseq semantics:
                # sequence and quality may wrap across lines,
                # /root/reference/lib/bwa/kseq.h kseq_read — sequence runs
                # until the '+' separator, quality until its length
                # matches the sequence; CRLF tolerated via strip)
                name = line[1:].split()[0].decode()
                seq_parts = []
                line = f.readline()
                while line and not line.startswith(b"+"):
                    seq_parts.append(line.strip())
                    line = f.readline()
                seq = b"".join(seq_parts)
                qual_parts = []
                qlen = 0
                while qlen < len(seq):
                    line = f.readline()
                    if not line:  # truncated final record: kseq returns
                        break     # the read with partial quality
                    part = line.strip()
                    qual_parts.append(part)
                    qlen += len(part)
                yield Read(name, seq, b"".join(qual_parts))
                line = f.readline()
            else:
                raise ValueError(f"malformed FASTA/FASTQ near: {line[:40]!r}")


def read_chunks(path, chunk_bytes: int) -> Iterator[List[Read]]:
    """Group reads into chunks bounded by chunk_bytes of sequence+name
    payload (reference: readChunk stops past 100 MB, src/Reads.cpp:64-131)."""
    chunk: List[Read] = []
    size = 0
    for r in read_fastx(path):
        chunk.append(r)
        size += len(r.seq) + len(r.name) + (len(r.qual) if r.qual else 0)
        if size >= chunk_bytes:
            yield chunk
            chunk, size = [], 0
    if chunk:
        yield chunk

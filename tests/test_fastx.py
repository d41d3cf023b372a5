"""Loader edge cases (kseq parity, /root/reference/lib/bwa/kseq.h):
multi-line FASTQ sequence/quality, '@' at the start of a quality line,
CRLF endings, truncated final record, gz input."""

import gzip

import pytest

from lordfast_tpu.io.fastx import read_fastx


def _write(tmp_path, name, data):
    p = tmp_path / name
    if name.endswith(".gz"):
        with gzip.open(p, "wb") as f:
            f.write(data)
    else:
        p.write_bytes(data)
    return p


def test_multiline_fastq(tmp_path):
    data = (b"@r1 extra comment\n"
            b"ACGT\nACGTA\nCG\n"
            b"+\n"
            b"IIII\nIIIII\nII\n"
            b"@r2\nTTTT\n+r2\nJJJJ\n")
    reads = list(read_fastx(_write(tmp_path, "m.fq", data)))
    assert [r.name for r in reads] == ["r1", "r2"]
    assert reads[0].seq == b"ACGTACGTACG"
    assert reads[0].qual == b"IIIIIIIIIII"
    assert reads[1].seq == b"TTTT" and reads[1].qual == b"JJJJ"


def test_quality_line_starting_with_at(tmp_path):
    # '@' is a valid quality char (Q31); must not be parsed as a header
    data = (b"@r1\nACGTACGT\n+\n@IIIIIII\n"
            b"@r2\nGGGG\n+\nIIII\n")
    reads = list(read_fastx(_write(tmp_path, "at.fq", data)))
    assert [r.name for r in reads] == ["r1", "r2"]
    assert reads[0].qual == b"@IIIIIII"


def test_crlf_and_gz(tmp_path):
    data = b"@r1\r\nACGT\r\nAC\r\n+\r\nIIII\r\nII\r\n"
    reads = list(read_fastx(_write(tmp_path, "crlf.fq.gz", data)))
    assert reads[0].seq == b"ACGTAC"
    assert reads[0].qual == b"IIIIII"


def test_truncated_final_record(tmp_path):
    data = b"@r1\nACGT\n+\nIIII\n@r2\nGGGGG\n+\nII"
    reads = list(read_fastx(_write(tmp_path, "trunc.fq", data)))
    assert len(reads) == 2
    assert reads[1].seq == b"GGGGG"
    assert reads[1].qual == b"II"  # partial quality, like kseq


def test_multiline_fasta_mixed(tmp_path):
    data = b">c1 desc\nACGT\nACGT\n>c2\nTT\n"
    reads = list(read_fastx(_write(tmp_path, "m.fa", data)))
    assert [(r.name, r.seq, r.qual) for r in reads] == [
        ("c1", b"ACGTACGT", None), ("c2", b"TT", None)
    ]

"""Dormant affine whole-chain mode (align/chain_align_ksw.py, porting
src/LordFAST.cpp:1264-1464): ksw_global scores vs an independent
brute-force affine DP, fixCigar behavior, and structural invariants of
the emitted record on a real index."""

import re

import numpy as np
import pytest

from lordfast_tpu.align import edlib_eq as ed
from lordfast_tpu.align.chain_align_ksw import _fix_cigar, align_chain_ksw
from lordfast_tpu.config import LordfastConfig


def _brute_affine_global(q, t, match, mismatch, gapo, gape):
    """Independent full-matrix affine global DP under ksw's convention:
    gaps extend from the gap state or OPEN from the match value M (the
    diagonal-derived cell), not from H (ksw.c:538-541's recurrence)."""
    NEG = -(1 << 30)
    n, m = len(q), len(t)
    H = np.full((m + 1, n + 1), NEG, np.int64)
    M = np.full((m + 1, n + 1), NEG, np.int64)
    E = np.full((m + 1, n + 1), NEG, np.int64)  # deletion state
    F = np.full((m + 1, n + 1), NEG, np.int64)  # insertion state
    H[0, 0] = M[0, 0] = 0
    for j in range(1, n + 1):
        H[0, j] = -(gapo + gape * j)
    for i in range(1, m + 1):
        H[i, 0] = -(gapo + gape * i)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            s = match if q[j - 1] == t[i - 1] else -mismatch
            M[i, j] = H[i - 1, j - 1] + s
            E[i, j] = max(M[i - 1, j] - gapo - gape, E[i - 1, j] - gape)
            F[i, j] = max(M[i, j - 1] - gapo - gape, F[i, j - 1] - gape)
            H[i, j] = max(M[i, j], E[i, j], F[i, j])
    return int(H[m, n])


def test_ksw_global_vs_brute(rng):
    mat = ed.build_ksw_matrix(2, 5)
    for _ in range(30):
        n = int(rng.integers(1, 40))
        m = int(rng.integers(1, 40))
        q = rng.integers(0, 4, n).astype(np.uint8)
        t = rng.integers(0, 4, m).astype(np.uint8)
        sc, cig = ed.ksw_global(q, t, mat, 2, 1, max(n, m))
        ref = _brute_affine_global(q, t, 2, 5, 2, 1)
        assert sc == ref, f"q={q} t={t}: {sc} != {ref}"
        # cigar consumes both sequences fully
        qc = sum(l for op, l in cig if op in "MI")
        tc = sum(l for op, l in cig if op in "MD")
        assert (qc, tc) == (n, m)


def test_fix_cigar():
    assert _fix_cigar([(3, "I"), (2, "I"), (4, "M")]) == "5S4M"
    assert _fix_cigar([(4, "M"), (2, "I")]) == "4M2S"
    assert _fix_cigar([(4, "M"), (1, "I"), (1, "I"), (3, "M")]) == "4M2I3M"
    assert _fix_cigar([(2, "S"), (3, "M"), (0, "D"), (2, "M")]) == "2S5M"


def test_align_chain_ksw_structure(small_index):
    idx, contigs = small_index
    cfg = LordfastConfig()
    # a read copied from chrA with a clean seed chain
    codes = contigs["chrA"][500:1700].astype(np.uint8)
    read_len = len(codes)
    beg = idx.meta["contig_starts"][0] if "contig_starts" in idx.meta \
        else 0
    t0 = 500  # global position of the copy on the first contig
    chain_q = np.array([100, 600], np.int64)
    chain_t = np.array([t0 + 100, t0 + 600], np.int64)
    chain_l = np.array([80, 90], np.int64)
    m = align_chain_ksw(chain_q, chain_t, chain_l, codes, read_len,
                        False, idx, cfg)
    assert len(m.records) == 1
    r = m.records[0]
    ops = re.findall(r"(\d+)([MIDS])", r.cigar)
    q_consumed = sum(int(n) for n, c in ops if c in "MIS")
    t_consumed = sum(int(n) for n, c in ops if c in "MD")
    assert q_consumed == read_len
    assert r.pos_end - r.pos + 1 == t_consumed
    # the perfect-copy read must align with a positive affine score
    assert m.total_score > 0
    assert r.flag == 0 and r.md == "" and r.nm_count == 0

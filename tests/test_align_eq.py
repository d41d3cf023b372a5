"""Unit tests for the native alignment primitives vs brute-force oracles."""

import numpy as np
import pytest

from lordfast_tpu.align import edlib_eq as ed


def brute_nw(q, t):
    D = np.zeros((len(q) + 1, len(t) + 1), int)
    D[0, :] = np.arange(len(t) + 1)
    D[:, 0] = np.arange(len(q) + 1)
    for i in range(1, len(q) + 1):
        for j in range(1, len(t) + 1):
            D[i, j] = min(
                D[i - 1, j - 1] + (q[i - 1] != t[j - 1]),
                D[i - 1, j] + 1,
                D[i, j - 1] + 1,
            )
    return int(D[-1, -1])


def test_nw_distance_and_path(rng):
    for _ in range(60):
        q = rng.integers(0, 4, rng.integers(0, 40)).astype(np.uint8)
        t = rng.integers(0, 4, rng.integers(0, 40)).astype(np.uint8)
        d, m = ed.nw_path(q, t)
        assert d == brute_nw(q, t)
        qi = ti = cost = 0
        for mv in m:
            if mv == ed.OP_MATCH:
                assert q[qi] == t[ti]
                qi += 1
                ti += 1
            elif mv == ed.OP_INSERT:
                qi += 1
                cost += 1
            elif mv == ed.OP_DELETE:
                ti += 1
                cost += 1
            else:
                assert q[qi] != t[ti]
                qi += 1
                ti += 1
                cost += 1
        assert qi == len(q) and ti == len(t) and cost == d


def test_shw_matches_fallback(rng):
    """Native vs python fallback (both implement the edlib artifact)."""
    for _ in range(60):
        q = rng.integers(0, 4, rng.integers(1, 50)).astype(np.uint8)
        t = rng.integers(0, 4, rng.integers(1, 80)).astype(np.uint8)
        assert ed.shw_end(q, t) == ed._shw_end_np(q, t)


def test_shw_negative_end_artifact():
    """ql % 64 != 0 allows end = -1 when clipping ties a real column
    (edlib wildcard padding artifact; see native/align_eq.cpp)."""
    q = np.array([0], np.uint8)   # single base "A"
    t = np.array([1, 0, 2], np.uint8)  # "CAG": d_1=1 (C vs A)
    # score(-1) = min(d_0+0, d_1+1, ...) = min(1, 2, ...) = 1 == best col
    d, end = ed.shw_end(q, t)
    assert (d, end) == (1, -1)
    # with a matching first base, column 0 wins strictly
    t2 = np.array([0, 2, 2], np.uint8)
    d2, end2 = ed.shw_end(q, t2)
    assert (d2, end2) == (0, 0)


def test_ksw_extend_native_matches_python(rng):
    mat = ed.build_ksw_matrix(2, 16)
    for _ in range(30):
        n = int(rng.integers(10, 150))
        q = rng.integers(0, 4, n).astype(np.uint8)
        t = q.copy()
        for _ in range(n // 8):
            t[rng.integers(0, n)] = rng.integers(0, 4)
        t = np.concatenate([t, rng.integers(0, 4, 25).astype(np.uint8)])
        a = ed.ksw_extend2(q, t, mat, 8, 1, 4, 1, 100, 0, 200, len(q))
        b = ed._ksw_extend2_np(q, t, mat, 8, 1, 4, 1, 100, 0, 200, len(q))
        assert a == b

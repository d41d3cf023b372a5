"""Device batched Myers gap-DP (ops/gap_dp.py) vs the host oracle
(native/align_eq.cpp via align.edlib_eq): distances, SHW end positions
(including the edlib negative-end artifact), and byte-identical move
paths under the oracle's traceback priority."""

import numpy as np
import pytest

from lordfast_tpu.align import edlib_eq as ed
from lordfast_tpu.ops import gap_dp


def _random_pair(rng, max_q, max_t, related=True):
    ql = int(rng.integers(1, max_q + 1))
    q = rng.integers(0, 4, ql).astype(np.uint8)
    if related and rng.random() < 0.7:
        # mutate q into t: realistic ~15% divergence
        t = []
        for ch in q:
            r = rng.random()
            if r < 0.05:
                t.append(rng.integers(0, 4))
            elif r < 0.10:
                t.append(ch)
                t.append(rng.integers(0, 4))
            elif r < 0.15:
                continue
            else:
                t.append(ch)
        t = np.array(t, np.uint8) if t else rng.integers(0, 4, 1).astype(
            np.uint8
        )
        t = t[:max_t]
        if len(t) == 0:
            t = rng.integers(0, 4, 1).astype(np.uint8)
    else:
        t = rng.integers(0, 4, int(rng.integers(1, max_t + 1))).astype(
            np.uint8
        )
    return q, t


def _run_bucket(pairs, modes, Q, T):
    G = len(pairs)
    qs = np.zeros((G, Q), np.uint8)
    ts = np.zeros((G, T), np.uint8)
    ql = np.zeros(G, np.int32)
    tl = np.zeros(G, np.int32)
    for g, (q, t) in enumerate(pairs):
        qs[g, : len(q)] = q
        ts[g, : len(t)] = t
        ql[g] = len(q)
        tl[g] = len(t)
    res = gap_dp.gap_align(
        qs, ql, ts, tl, np.asarray(modes, bool), Q, T
    )
    dist = np.asarray(res.dist)
    end = np.asarray(res.end)
    mlen = np.asarray(res.mlen)
    moves = gap_dp.unpack_moves(np.asarray(res.moves_packed), mlen)
    return dist, end, moves


def test_nw_matches_oracle(rng):
    pairs = [_random_pair(rng, 120, 150) for _ in range(64)]
    dist, end, moves = _run_bucket(pairs, [False] * 64, 128, 160)
    for g, (q, t) in enumerate(pairs):
        d_ref, mv_ref = ed.nw_path(q, t)
        assert dist[g] == d_ref, f"gap {g}: dist {dist[g]} != {d_ref}"
        assert end[g] == len(t) - 1
        np.testing.assert_array_equal(
            moves[g], mv_ref, err_msg=f"gap {g} path mismatch"
        )


def test_shw_matches_oracle(rng):
    pairs = [_random_pair(rng, 120, 150) for _ in range(64)]
    dist, end, moves = _run_bucket(pairs, [True] * 64, 128, 160)
    for g, (q, t) in enumerate(pairs):
        d_ref, e_ref, mv_ref = ed.shw_path(q, t)
        assert dist[g] == d_ref, f"gap {g}: dist {dist[g]} != {d_ref}"
        assert end[g] == e_ref, f"gap {g}: end {end[g]} != {e_ref}"
        np.testing.assert_array_equal(
            moves[g], mv_ref, err_msg=f"gap {g} path mismatch"
        )


def test_shw_negative_end_artifact_device():
    # ql % 64 != 0: clipping (end = -1) must win ties exactly like the
    # oracle (see native/align_eq.cpp shw_best_end)
    q = np.array([0], np.uint8)
    t = np.array([1, 1, 1], np.uint8)
    d_ref, e_ref, mv_ref = ed.shw_path(q, t)
    dist, end, moves = _run_bucket([(q, t)], [True], 32, 48)
    assert (dist[0], end[0]) == (d_ref, e_ref)
    np.testing.assert_array_equal(moves[0], mv_ref)


def test_mixed_modes_and_sizes(rng):
    pairs = [_random_pair(rng, 500, 560) for _ in range(32)]
    modes = [bool(rng.integers(0, 2)) for _ in range(32)]
    dist, end, moves = _run_bucket(pairs, modes, 512, 576)
    for g, (q, t) in enumerate(pairs):
        if modes[g]:
            d_ref, e_ref, mv_ref = ed.shw_path(q, t)
            assert end[g] == e_ref
        else:
            d_ref, mv_ref = ed.nw_path(q, t)
        assert dist[g] == d_ref
        np.testing.assert_array_equal(moves[g], mv_ref)


def test_word_boundary_lengths(rng):
    # exercise ql at 32/64-bit word boundaries (carry chains + artifact W64)
    sizes = [31, 32, 33, 63, 64, 65, 96, 127, 128]
    pairs = []
    for s in sizes:
        q = rng.integers(0, 4, s).astype(np.uint8)
        t = rng.integers(0, 4, s + 10).astype(np.uint8)
        pairs.append((q, t))
    for mode in (False, True):
        dist, end, moves = _run_bucket(pairs, [mode] * len(pairs), 128, 160)
        for g, (q, t) in enumerate(pairs):
            if mode:
                d_ref, e_ref, mv_ref = ed.shw_path(q, t)
                assert end[g] == e_ref, f"ql={len(q)}"
            else:
                d_ref, mv_ref = ed.nw_path(q, t)
            assert dist[g] == d_ref, f"ql={len(q)}"
            np.testing.assert_array_equal(moves[g], mv_ref)

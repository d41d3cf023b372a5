"""Pallas Myers kernel (ops/gap_dp_pallas.py) vs the jnp reference kernel
and the host oracle: distances, SHW ends (incl. the negative-end
artifact) and byte-identical move paths.  Runs the kernel in interpreter
mode on the CPU backend (tests/conftest.py forces CPU); the same kernel
is compiled by Mosaic on the real TPU (exercised by bench.py and the
engine, and cross-checked in CI-on-TPU via .prof scripts)."""

import numpy as np
import pytest

from lordfast_tpu.align import edlib_eq as ed
from lordfast_tpu.ops import gap_dp
from lordfast_tpu.ops import gap_dp_pallas as gp

from test_gap_dp import _random_pair


def _run(pairs, modes, Q, T):
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
    res = gp.gap_align_pl(qs, ql, ts, tl, np.asarray(modes, bool), Q, T,
                          interpret=True)
    dist = np.asarray(res.dist)
    end = np.asarray(res.end)
    moves = gp.decode_col_moves(np.asarray(res.colcode), end,
                                np.asarray(res.lead))
    return dist, end, moves


def test_pallas_nw_and_shw_vs_oracle(rng):
    pairs = [_random_pair(rng, 120, 150) for _ in range(32)]
    modes = [bool(rng.integers(0, 2)) for _ in range(32)]
    dist, end, moves = _run(pairs, modes, 128, 160)
    for g, (q, t) in enumerate(pairs):
        if modes[g]:
            d_ref, e_ref, mv_ref = ed.shw_path(q, t)
            assert end[g] == e_ref, f"gap {g}: end {end[g]} != {e_ref}"
        else:
            d_ref, mv_ref = ed.nw_path(q, t)
            assert end[g] == len(t) - 1
        assert dist[g] == d_ref, f"gap {g}: dist {dist[g]} != {d_ref}"
        np.testing.assert_array_equal(
            moves[g], mv_ref, err_msg=f"gap {g} path mismatch"
        )


def test_pallas_word_boundaries_vs_jnp(rng):
    # ql at 32-bit word boundaries: carry chains + the W64 artifact, and
    # multi-word states (W=4) — compared against the jnp kernel, which is
    # itself oracle-tested in test_gap_dp.py
    sizes = [1, 31, 32, 33, 63, 64, 65, 96, 127, 128]
    pairs = []
    for s in sizes:
        q = rng.integers(0, 4, s).astype(np.uint8)
        t = rng.integers(0, 4, max(1, s + int(rng.integers(-8, 10)))).astype(
            np.uint8
        )
        pairs.append((q, t))
    G, Q, T = len(pairs), 128, 160
    for mode in (False, True):
        dist, end, moves = _run(pairs, [mode] * G, Q, T)
        qs = np.zeros((G, Q), np.uint8)
        ts = np.zeros((G, T), np.uint8)
        ql = np.zeros(G, np.int32)
        tl = np.zeros(G, np.int32)
        for g, (q, t) in enumerate(pairs):
            qs[g, : len(q)] = q
            ts[g, : len(t)] = t
            ql[g], tl[g] = len(q), len(t)
        ref = gap_dp.gap_align(qs, ql, ts, tl,
                               np.asarray([mode] * G, bool), Q, T)
        ref_moves = gap_dp.unpack_moves(np.asarray(ref.moves_packed),
                                        np.asarray(ref.mlen))
        np.testing.assert_array_equal(dist, np.asarray(ref.dist))
        np.testing.assert_array_equal(end, np.asarray(ref.end))
        for g in range(G):
            np.testing.assert_array_equal(
                moves[g], ref_moves[g], err_msg=f"ql={sizes[g]} mode={mode}"
            )


def test_pallas_tiled_path_vs_jnp(rng):
    # Force the checkpoint/recompute tiled kernel (_make_kernel_tiled):
    # Q=512, T=592 -> T*W = 9472 > 9216, _pick_tile -> TT=16.  This is
    # the path the big gap buckets (e.g. (2048, 2176)) take on TPU; the
    # non-tiled tests above never reach it.
    Q, T = 512, 592
    assert gp.supports(Q, T) and T * (Q // 32) > 9216
    G = 8
    pairs = []
    for g in range(G):
        ql_g = int(rng.integers(Q - 120, Q + 1))
        tl_g = int(rng.integers(T - 120, T + 1))
        q = rng.integers(0, 4, ql_g).astype(np.uint8)
        # correlated target: mutate a copy so paths are nontrivial
        t = q[:tl_g].copy() if tl_g <= ql_g else np.concatenate(
            [q, rng.integers(0, 4, tl_g - ql_g).astype(np.uint8)]
        )
        nmut = max(1, int(0.1 * len(t)))
        sites = rng.integers(0, len(t), nmut)
        t[sites] = rng.integers(0, 4, nmut)
        pairs.append((q, t))
    modes = [g % 2 == 1 for g in range(G)]
    dist, end, moves = _run(pairs, modes, Q, T)
    qs = np.zeros((G, Q), np.uint8)
    ts = np.zeros((G, T), np.uint8)
    ql = np.zeros(G, np.int32)
    tl = np.zeros(G, np.int32)
    for g, (q, t) in enumerate(pairs):
        qs[g, : len(q)] = q
        ts[g, : len(t)] = t
        ql[g], tl[g] = len(q), len(t)
    ref = gap_dp.gap_align(qs, ql, ts, tl, np.asarray(modes, bool), Q, T)
    ref_moves = gap_dp.unpack_moves(np.asarray(ref.moves_packed),
                                    np.asarray(ref.mlen))
    np.testing.assert_array_equal(dist, np.asarray(ref.dist))
    np.testing.assert_array_equal(end, np.asarray(ref.end))
    for g in range(G):
        np.testing.assert_array_equal(
            moves[g], ref_moves[g], err_msg=f"tiled gap {g} path mismatch"
        )


def test_pallas_tiled_checkpoint_stride(rng, monkeypatch):
    # Hierarchical checkpointing (CPT > 1): shrink the VMEM budget so
    # _pick_cpt chooses a stride > 1 at (512, 592) — the traceback then
    # exercises the restore-and-refill-across-CPT-tiles path the big
    # (4096, 4352) bucket uses on TPU.
    monkeypatch.setattr(gp, "_VMEM_PLANE_BUDGET", 1_200_000)
    Q, T = 512, 592
    TT = gp._pick_tile(Q, T)
    assert gp._pick_cpt(Q, T, TT) > 1
    G = 8
    pairs = []
    for g in range(G):
        q = rng.integers(0, 4, int(rng.integers(Q - 90, Q + 1))).astype(
            np.uint8)
        t = q.copy()
        sites = rng.integers(0, len(t), max(1, len(t) // 9))
        t[sites] = rng.integers(0, 4, len(sites))
        pairs.append((q, t[: int(rng.integers(T - 90, T + 1))]))
    modes = [g % 2 == 0 for g in range(G)]
    dist, end, moves = _run(pairs, modes, Q, T)
    qs = np.zeros((G, Q), np.uint8)
    ts = np.zeros((G, T), np.uint8)
    ql = np.zeros(G, np.int32)
    tl = np.zeros(G, np.int32)
    for g, (q, t) in enumerate(pairs):
        qs[g, : len(q)] = q
        ts[g, : len(t)] = t
        ql[g], tl[g] = len(q), len(t)
    ref = gap_dp.gap_align(qs, ql, ts, tl, np.asarray(modes, bool), Q, T)
    ref_moves = gap_dp.unpack_moves(np.asarray(ref.moves_packed),
                                    np.asarray(ref.mlen))
    np.testing.assert_array_equal(dist, np.asarray(ref.dist))
    np.testing.assert_array_equal(end, np.asarray(ref.end))
    for g in range(G):
        np.testing.assert_array_equal(moves[g], ref_moves[g],
                                      err_msg=f"cpt gap {g}")


def test_pallas_negative_end_artifact():
    q = np.array([0], np.uint8)
    t = np.array([1, 1, 1], np.uint8)
    d_ref, e_ref, mv_ref = ed.shw_path(q, t)
    dist, end, moves = _run([(q, t)], [True], 32, 48)
    assert (dist[0], end[0]) == (d_ref, e_ref)
    np.testing.assert_array_equal(moves[0], mv_ref)

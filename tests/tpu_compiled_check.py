"""Mosaic-COMPILED kernel oracle checks (not interpret mode).

Run standalone on a machine with a TPU attached:

    python tests/tpu_compiled_check.py

Exit codes: 0 = all checks passed, 42 = no TPU backend (callers skip),
1 = mismatch.  tests/test_tpu_compiled.py wraps this in a subprocess so
the (CPU-forced) pytest session can include it when a TPU is present —
closing the gap that the interpret-mode suite never exercises the
Mosaic lowering itself (x64 int64 traps have bitten here before).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("no TPU backend; skipping", file=sys.stderr)
        return 42

    from lordfast_tpu.align import edlib_eq as ed
    from lordfast_tpu.ops import gap_dp_pallas as gp

    rng = np.random.default_rng(99)

    # ---- Myers kernel, non-tiled bucket, compiled ----
    def run(pairs, modes, Q, T):
        G = len(pairs)
        qs = np.zeros((G, Q), np.uint8)
        ts = np.zeros((G, T), np.uint8)
        ql = np.zeros(G, np.int32)
        tl = np.zeros(G, np.int32)
        for g, (q, t) in enumerate(pairs):
            qs[g, : len(q)] = q
            ts[g, : len(t)] = t
            ql[g], tl[g] = len(q), len(t)
        res = gp.gap_align_pl(qs, ql, ts, tl, np.asarray(modes, bool),
                              Q, T, interpret=False)
        moves = gp.decode_col_moves(np.asarray(res.colcode),
                                    np.asarray(res.end),
                                    np.asarray(res.lead))
        return np.asarray(res.dist), np.asarray(res.end), moves

    def random_pair(qmax, tmax):
        q = rng.integers(0, 4, int(rng.integers(1, qmax))).astype(np.uint8)
        t = q[: int(rng.integers(1, tmax))].copy() if rng.random() < 0.7 \
            else rng.integers(0, 4, int(rng.integers(1, tmax))).astype(
                np.uint8)
        if len(t) and rng.random() < 0.9:
            sites = rng.integers(0, len(t), max(1, len(t) // 8))
            t[sites] = rng.integers(0, 4, len(sites))
        return q, t

    pairs = [random_pair(128, 160) for _ in range(128)]
    modes = [bool(rng.integers(0, 2)) for _ in range(128)]
    dist, end, moves = run(pairs, modes, 128, 160)
    for g, (q, t) in enumerate(pairs):
        if modes[g]:
            d_ref, e_ref, mv_ref = ed.shw_path(q, t)
            assert end[g] == e_ref, f"gap {g} end {end[g]} != {e_ref}"
        else:
            d_ref, mv_ref = ed.nw_path(q, t)
        assert dist[g] == d_ref, f"gap {g} dist {dist[g]} != {d_ref}"
        assert np.array_equal(moves[g], mv_ref), f"gap {g} path"
    print("[tpu-check] Myers non-tiled (128x160): 128 gaps OK")

    # ---- Myers kernel, tiled checkpoint/recompute bucket, compiled ----
    pairs = [random_pair(512, 592) for _ in range(128)]
    modes = [bool(rng.integers(0, 2)) for _ in range(128)]
    assert 592 * (512 // 32) > 9216  # really the tiled path
    dist, end, moves = run(pairs, modes, 512, 592)
    for g, (q, t) in enumerate(pairs):
        if modes[g]:
            d_ref, e_ref, mv_ref = ed.shw_path(q, t)
            assert end[g] == e_ref, f"tiled {g} end"
        else:
            d_ref, mv_ref = ed.nw_path(q, t)
        assert dist[g] == d_ref, f"tiled {g} dist {dist[g]} != {d_ref}"
        assert np.array_equal(moves[g], mv_ref), f"tiled {g} path"
    print("[tpu-check] Myers tiled (512x592): 128 gaps OK")

    # ---- affine ksw_extend2 kernel, compiled ----
    from lordfast_tpu.ops import affine_pl

    G = 64
    Qe, Te, BW, w_max = 512, 512, 256, 100
    mat = ed.build_ksw_matrix(2, 16)
    qs = np.zeros((G, Qe), np.uint8)
    ts = np.zeros((G, Te), np.uint8)
    qlen = np.zeros(G, np.int32)
    tlen = np.zeros(G, np.int32)
    cols = {k: np.zeros(G, np.int32) for k in
            ("o_del", "e_del", "o_ins", "e_ins", "w_eff", "zdrop", "h0")}
    cases = []
    for g in range(G):
        q = rng.integers(0, 4, int(rng.integers(30, 400))).astype(np.uint8)
        t = q[: int(rng.integers(20, 480))].copy()
        if len(t):
            sites = rng.integers(0, len(t), max(1, len(t) // 7))
            t[sites] = rng.integers(0, 4, len(sites))
        od, ed_, oi, ei, w, zd = (
            (0, 1, 0, 1, 40, 40) if g % 2 else (8, 1, 4, 1, 100, 200)
        )
        qs[g, : len(q)] = q
        ts[g, : len(t)] = t
        qlen[g], tlen[g] = len(q), len(t)
        cols["o_del"][g], cols["e_del"][g] = od, ed_
        cols["o_ins"][g], cols["e_ins"][g] = oi, ei
        cols["zdrop"][g] = zd
        cols["h0"][g] = len(q)
        cols["w_eff"][g] = affine_pl.clamp_band(len(q), 2, 0, od, ed_,
                                                oi, ei, w)
        cases.append((q, t, (od, ed_, oi, ei, w, zd)))
    res = affine_pl.extend_batch(
        qs, ts, Qe, Te, BW, w_max, qlen=qlen, tlen=tlen,
        match=np.full(G, 2, np.int32),
        mismatch=np.full(G, 16, np.int32), interpret=False, **cols,
    )
    for g, (q, t, (od, ed_, oi, ei, w, zd)) in enumerate(cases):
        sc, qle, tle, gtle, gsc = ed.ksw_extend2(
            q, t, mat, od, ed_, oi, ei, w, 0, zd, len(q)
        )
        got = (int(res.score[g]), int(res.qle[g]), int(res.tle[g]),
               int(res.gtle[g]), int(res.gscore[g]))
        assert got == (sc, qle, tle, gtle, gsc), (
            f"affine {g}: {got} != {(sc, qle, tle, gtle, gsc)}"
        )
    print("[tpu-check] affine ksw_extend2 (512x512): 64 problems OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())

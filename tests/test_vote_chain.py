"""Voting and chaining device ops vs reference-semantics numpy oracles."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from lordfast_tpu.config import LordfastConfig
from lordfast_tpu.ops.chain import (CompactWindows, chain_dpn2,
                                    select_window_seeds, WindowSeeds)
from lordfast_tpu.ops.fm_index import SeedBatch
from lordfast_tpu.ops.voting import vote_windows


def make_seed_batch(per_read_seeds, MS=256, pdt=np.int32):
    """per_read_seeds: list (one per read) of lists of (tPos,qPos,len,rev)."""
    B = len(per_read_seeds)
    t = np.zeros((B, MS), pdt)
    q = np.zeros((B, MS), np.int32)
    ln = np.zeros((B, MS), np.int32)
    rv = np.zeros((B, MS), bool)
    va = np.zeros((B, MS), bool)
    for b, seeds in enumerate(per_read_seeds):
        for i, (tp, qp, l, r) in enumerate(seeds):
            t[b, i], q[b, i], ln[b, i], rv[b, i], va[b, i] = tp, qp, l, r, True
    n = va.sum(1).astype(np.int32)
    return SeedBatch(
        t_pos=jnp.asarray(t), q_pos=jnp.asarray(q), length=jnp.asarray(ln),
        is_rev=jnp.asarray(rv), valid=jnp.asarray(va),
        n_total=jnp.asarray(n), n_anchors=jnp.asarray(n),
    )


def oracle_vote(seeds, read_len, cfg):
    """findTopWins semantics (src/LordFAST.cpp:582-657) per strand, sparse."""
    results = []
    for rev in (False, True):
        cnt = {}
        for tp, qp, l, r in seeds:
            if r != rev:
                continue
            w = tp // read_len
            wt = 1 + (l - cfg.min_anchor_len)
            cnt[w] = cnt.get(w, 0) + wt
            if w - 1 >= 0:
                cnt[w - 1] = cnt.get(w - 1, 0) + wt
        for w, c in cnt.items():
            left_ok = (w == 0) or (w - 1 not in cnt) or (c >= cnt[w - 1])
            right_ok = (w + 1 not in cnt) or (c > cnt[w + 1])
            if left_ok and right_ok:
                results.append((c, w, rev))
    # reference keep-order among count ties: scan order is forward strand
    # first, ascending window (findTopWins heap replaces only on strict >,
    # src/LordFAST.cpp:646)
    results.sort(key=lambda x: (-x[0], x[2], x[1]))
    return results


def oracle_chain(seeds, cfg):
    """chain_seeds_n2 (src/Chain.cpp:232-310): seeds = [(qPos,tPos,len)]."""
    fr = sorted(seeds, key=lambda s: (s[0], s[1]))
    n = len(fr)
    if n == 0:
        return [], -1.0
    dp = [0.0] * n
    prev = [-1] * n
    best_s, best_i = -1.0, -1
    for i in range(n):
        dp[i] = fr[i][2]
        for j in range(i - 1, -1, -1):
            dist_r = fr[i][0] - (fr[j][0] + fr[j][2] - 1)
            if dist_r <= 0:
                continue
            dist_t = fr[i][1] - (fr[j][1] + fr[j][2] - 1)
            if dist_t <= 0:
                continue
            a = cfg.chain_reward * cfg.min_anchor_len
            d = abs(dist_r - dist_t)
            b = 0.0 if d <= 1 else 0.1 * d + cfg.chain_penalty * math.log(d)
            if dp[j] + a - b > dp[i]:
                dp[i] = dp[j] + a - b
                prev[i] = j
        if dp[i] > best_s:
            best_s, best_i = dp[i], i
    chain = []
    while best_i != -1:
        chain.append(fr[best_i])
        best_i = prev[best_i]
    return chain[::-1], best_s


def test_vote_windows_matches_oracle(rng):
    cfg = LordfastConfig(max_candidates=16)
    B = 6
    read_len = 1000
    all_seeds = []
    for b in range(B):
        n = int(rng.integers(3, 60))
        seeds = []
        for _ in range(n):
            tp = int(rng.integers(0, 50000))
            l = int(rng.integers(14, 30))
            seeds.append((tp, int(rng.integers(0, 900)), l, bool(rng.integers(2))))
        all_seeds.append(seeds)
    sb = make_seed_batch(all_seeds)
    cands = vote_windows(sb, jnp.full(B, read_len, jnp.int32), cfg)
    for b in range(B):
        want = oracle_vote(all_seeds[b], read_len, cfg)[: cfg.max_candidates]
        got = [
            (int(cands.cnt[b, i]), int(cands.win_id[b, i]), bool(cands.is_rev[b, i]))
            for i in range(int(np.asarray(cands.valid[b]).sum()))
        ]
        # compare as multisets of counts and exact window sets per count
        assert sorted(got) == sorted(want), f"read {b}"
        # mode decision
        best = want[0][0] if want else 0
        second = want[1][0] if len(want) > 1 else 0
        assert bool(cands.is_fine[b]) == (best < cfg.score_ratio * second)


def test_chain_dpn2_matches_oracle(rng):
    cfg = LordfastConfig()
    B, C, N = 2, 3, 64
    q = np.zeros((B, C, N), np.int32)
    t = np.zeros((B, C, N), np.int32)
    ln = np.zeros((B, C, N), np.int32)
    va = np.zeros((B, C, N), bool)
    ora = {}
    for b in range(B):
        for c in range(C):
            n = int(rng.integers(0, N))
            seeds = []
            base_t = int(rng.integers(0, 10000))
            for i in range(n):
                qp = int(rng.integers(0, 2000))
                tp = base_t + qp + int(rng.integers(-100, 100))
                l = int(rng.integers(14, 40))
                seeds.append((qp, max(tp, 0), l))
            seeds.sort(key=lambda s: (s[0], s[1]))
            for i, (qp, tp, l) in enumerate(seeds):
                q[b, c, i], t[b, c, i], ln[b, c, i], va[b, c, i] = qp, tp, l, 1
            ora[(b, c)] = oracle_chain(seeds, cfg)
    ws = WindowSeeds(
        q_pos=jnp.asarray(q), t_pos=jnp.asarray(t), length=jnp.asarray(ln),
        valid=jnp.asarray(va), n_in_range=jnp.asarray(va.sum(-1), jnp.int32),
    )
    cb = chain_dpn2(ws, cfg)
    for (b, c), (want_chain, want_score) in ora.items():
        got_len = int(cb.chain_len[b, c])
        got_score = float(cb.score[b, c])
        assert got_len == len(want_chain), (b, c)
        np.testing.assert_allclose(
            got_score, np.float32(want_score), rtol=1e-6
        )
        got_chain = [
            (int(cb.q_pos[b, c, i]), int(cb.t_pos[b, c, i]), int(cb.length[b, c, i]))
            for i in range(got_len)
        ]
        assert got_chain == want_chain, (b, c)


def oracle_clasp_sop(seeds, lam=0.15, eps=0.0):
    """bl_slClusterSop/bl_slChainSop semantics (lib/clasp/slchain.c:568-828)
    with lordFAST's parameters (src/Chain.cpp:52-55); seeds=[(qPos,tPos,len)].
    Deterministic tie-breaks as documented on chain_clasp_sop."""
    fr = sorted(seeds, key=lambda s: (s[0], s[1]))
    n = len(fr)
    if n == 0:
        return [], -1.0
    dp = [0.0] * n
    prev = [-1] * n
    for i in range(n):
        qi, ti, li = fr[i]
        dp[i] = float(li)
        best, bj = -math.inf, -1
        for j in range(n):
            qj, tj, lj = fr[j]
            if j == i:
                continue
            dy = qi - (qj + lj - 1) - 1
            dx = ti - (tj + lj - 1) - 1
            if dy < 0 or dx < 0 or j > i:
                continue
            gsop = lam * max(dx, dy) + (eps - lam) * min(dx, dy)
            v = dp[j] - gsop
            if v >= best:  # largest j among ties
                best, bj = v, j
        if best >= 0:
            dp[i] = li + best
            prev[i] = bj
    best_i = max(range(n), key=lambda i: (dp[i], -i))
    chain = []
    i = best_i
    while i != -1:
        chain.append(fr[i])
        i = prev[i]
    return chain[::-1], dp[best_i]


def test_chain_clasp_sop_matches_oracle(rng):
    from lordfast_tpu.ops.chain import chain_clasp_sop

    cfg = LordfastConfig(chain_alg="clasp")
    B, C, N = 2, 3, 64
    q = np.zeros((B, C, N), np.int32)
    t = np.zeros((B, C, N), np.int32)
    ln = np.zeros((B, C, N), np.int32)
    va = np.zeros((B, C, N), bool)
    ora = {}
    for b in range(B):
        for c in range(C):
            n = int(rng.integers(0, N))
            seeds = []
            base_t = int(rng.integers(0, 10000))
            for i in range(n):
                qp = int(rng.integers(0, 2000))
                tp = base_t + qp + int(rng.integers(-100, 100))
                l = int(rng.integers(14, 40))
                seeds.append((qp, max(tp, 0), l))
            seeds.sort(key=lambda s: (s[0], s[1]))
            for i, (qp, tp, l) in enumerate(seeds):
                q[b, c, i], t[b, c, i], ln[b, c, i], va[b, c, i] = qp, tp, l, 1
            ora[(b, c)] = oracle_clasp_sop(seeds)
    ws = WindowSeeds(
        q_pos=jnp.asarray(q), t_pos=jnp.asarray(t), length=jnp.asarray(ln),
        valid=jnp.asarray(va), n_in_range=jnp.asarray(va.sum(-1), jnp.int32),
    )
    cb = chain_clasp_sop(ws, cfg)
    for (b, c), (want_chain, want_score) in ora.items():
        got_len = int(cb.chain_len[b, c])
        assert got_len == len(want_chain), (b, c)
        np.testing.assert_allclose(
            float(cb.score[b, c]), np.float32(want_score), rtol=1e-6
        )
        got_chain = [
            (int(cb.q_pos[b, c, i]), int(cb.t_pos[b, c, i]),
             int(cb.length[b, c, i]))
            for i in range(got_len)
        ]
        assert got_chain == want_chain, (b, c)


def test_chain_seeds_dispatch():
    from lordfast_tpu.ops.chain import chain_seeds

    ws = WindowSeeds(
        q_pos=jnp.asarray([[10, 100]], jnp.int32),
        t_pos=jnp.asarray([[50, 140]], jnp.int32),
        length=jnp.asarray([[20, 20]], jnp.int32),
        valid=jnp.ones((1, 2), bool),
        n_in_range=jnp.asarray([2], jnp.int32),
    )
    cb1 = chain_seeds(ws, LordfastConfig(chain_alg="dp-n2"))
    cb2 = chain_seeds(ws, LordfastConfig(chain_alg="clasp"))
    assert int(cb1.chain_len[0]) == 2 and int(cb2.chain_len[0]) == 2
    # dp-n2 reward differs from clasp score (len-sum minus gsop)
    assert float(cb1.score[0]) != float(cb2.score[0])


def test_select_window_seeds(small_index, rng):
    idx, _ = small_index
    arrs = idx.device_arrays()
    cfg = LordfastConfig(max_chain_seeds=64)
    read_len = 1000
    B, MS = 2, 128
    seeds_list = []
    for b in range(B):
        seeds = []
        for _ in range(50):
            tp = int(rng.integers(0, idx.l_pac - 50))
            seeds.append(
                (tp, int(rng.integers(0, 900)), int(rng.integers(14, 30)),
                 bool(rng.integers(2)))
            )
        seeds_list.append(seeds)
    sb = make_seed_batch(seeds_list, MS=MS)
    from lordfast_tpu.ops.voting import CandidateBatch

    # two hand-picked windows per read, as a flat compacted list
    win_id = np.array([[3, 25], [1, 8]], np.int32)
    is_rev = np.array([[False, True], [True, False]])
    cw = CompactWindows(
        read_idx=jnp.asarray([0, 0, 1, 1], jnp.int32),
        cand_idx=jnp.asarray([0, 1, 0, 1], jnp.int32),
        win_id=jnp.asarray(win_id.reshape(-1)),
        is_rev=jnp.asarray(is_rev.reshape(-1)),
        valid=jnp.ones(4, bool),
        n_needed=jnp.asarray(4, jnp.int32),
    )
    ws = select_window_seeds(
        sb, cw, jnp.full(B, read_len, jnp.int32), arrs, cfg
    )
    ws = WindowSeeds(*[x.reshape(2, 2, -1) if x.ndim > 1 else x.reshape(2, 2)
                       for x in ws])
    for b in range(B):
        for c in range(2):
            w = int(win_id[b, c])
            t_start, t_end = w * read_len, (w + 2) * read_len - 1
            margin = read_len >> 1
            cb, ce = idx.chr_boundaries(t_start, t_end)
            lo, hi = max(t_start - margin, cb), min(t_end + margin, ce)
            want = sorted(
                (qp, tp, l)
                for (tp, qp, l, r) in seeds_list[b]
                if r == is_rev[b, c] and lo <= tp <= hi
            )
            got = sorted(
                (int(ws.q_pos[b, c, i]), int(ws.t_pos[b, c, i]),
                 int(ws.length[b, c, i]))
                for i in range(int(np.asarray(ws.valid[b, c]).sum()))
            )
            assert got == want, (b, c)


def test_vote_flat_matches_wide(rng):
    """The flat-compacted voting path (ops/voting._vote_windows_flat)
    must produce the identical CandidateBatch as the wide per-read path
    on random seed batches (incl. candidate-less and repeat-dense
    reads)."""
    from lordfast_tpu.ops.voting import (_vote_windows_flat,
                                         _vote_windows_wide)

    cfg = LordfastConfig(max_candidates=8)
    B, MS = 12, 64
    per_read = []
    for b in range(B):
        n = int(rng.integers(0, MS + 1))
        if b == 3:
            n = 0  # candidate-less read
        seeds = []
        for _ in range(n):
            tp = int(rng.integers(0, 40000))
            seeds.append((tp, int(rng.integers(0, 900)),
                          int(rng.integers(14, 40)),
                          bool(rng.integers(0, 2))))
        per_read.append(seeds)
    sb = make_seed_batch(per_read, MS=MS)
    lens = jnp.asarray(np.full(B, 1000, np.int32))
    wide = _vote_windows_wide(sb, lens, cfg)
    flat = _vote_windows_flat(sb, lens, cfg, 4096)
    for name in ("win_id", "is_rev", "cnt", "valid", "is_fine"):
        np.testing.assert_array_equal(
            np.asarray(getattr(wide, name)), np.asarray(getattr(flat, name)),
            err_msg=name,
        )
    np.testing.assert_allclose(np.asarray(wide.min_score),
                               np.asarray(flat.min_score))

"""Per-window seed selection + chaining DP (device).

``select_window_seeds`` mirrors the seed filtering of calcChainScore /
alignWin (src/LordFAST.cpp:659-680, 995-1018): window [w*rl, (w+2)*rl-1],
margin rl/2, clamped to the contig that contains the window midpoint.
Seeds are pre-sorted by (strand, tPos) once per read so each window's
seed set is a contiguous range found by binary search — the same set the
reference gathers by scanning the whole seed list per window.

``chain_dpn2`` is the O(n^2) chaining DP of chain_seeds_n2
(src/Chain.cpp:232-310) as a lax.scan over seeds (sequential in i,
vectorized over windows and j): reward = chainReward * MIN_ANCHOR_LEN,
penalty = 0.1*d + chainPenalty*log(d) with d = |distR - distT|
(src/Chain.cpp:211-225), float64 like the reference's double dp[].
Tie-breaking matches the reference exactly: predecessor = largest j among
score ties (the reference scans j descending with strict >), best chain
end = smallest i among ties (ascending scan with strict >).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class WindowSeeds(NamedTuple):
    q_pos: jnp.ndarray   # (B, C, N) int32, sorted by (qPos, tPos)
    t_pos: jnp.ndarray   # (B, C, N) position dtype
    length: jnp.ndarray  # (B, C, N) int32
    valid: jnp.ndarray   # (B, C, N) bool
    n_in_range: jnp.ndarray  # (B, C) int32: seeds in range before the N cap


class ChainBatch(NamedTuple):
    q_pos: jnp.ndarray   # (B, C, N) chain seeds, ascending qPos
    t_pos: jnp.ndarray
    length: jnp.ndarray
    chain_len: jnp.ndarray  # (B, C) int32
    score: jnp.ndarray      # (B, C) float32 (-1 when no seeds, Chain.cpp:62)


def select_window_seeds(seeds, cands, read_lens, arrs, cfg, n_sel=None):
    """Gather each candidate window's seeds into fixed-size slots."""
    B, MS = seeds.t_pos.shape
    C = cands.win_id.shape[1]
    N = n_sel or cfg.max_chain_seeds
    pdt = seeds.t_pos.dtype

    # one composite-key sort per read: (strand, tPos)
    BIGP = jnp.int64(2**40)
    key = jnp.where(
        seeds.valid,
        seeds.is_rev.astype(jnp.int64) * BIGP + seeds.t_pos.astype(jnp.int64),
        jnp.int64(2**62),
    )
    key_s, t_s, q_s, l_s = jax.lax.sort(
        (key, seeds.t_pos, seeds.q_pos, seeds.length), num_keys=1
    )

    rl = read_lens.astype(jnp.int64)[:, None]  # (B, 1)
    w = cands.win_id.astype(jnp.int64)
    t_start = w * rl
    t_end = (w + 2) * rl - 1
    margin = rl >> 1
    mid = (t_start + t_end) >> 1
    # contig of the midpoint (bns_pos2rid binary search, src/BWT.cpp:646)
    offs = arrs["contig_offsets"].astype(jnp.int64)
    ends = arrs["contig_ends"].astype(jnp.int64)
    rid = jnp.clip(
        jnp.searchsorted(offs, mid, side="right") - 1, 0, offs.shape[0] - 1
    )
    chr_beg = offs[rid]
    chr_end = ends[rid] - 1
    lo = jnp.maximum(t_start - margin, chr_beg)  # (B, C)
    hi = jnp.minimum(t_end + margin, chr_end)

    strand = cands.is_rev.astype(jnp.int64)
    lo_key = strand * BIGP + lo
    hi_key = strand * BIGP + hi
    lo_idx = jax.vmap(lambda ks, q: jnp.searchsorted(ks, q, side="left"))(
        key_s, lo_key
    )  # (B, C)
    hi_idx = jax.vmap(lambda ks, q: jnp.searchsorted(ks, q, side="right"))(
        key_s, hi_key
    )
    n_in_range = (hi_idx - lo_idx).astype(jnp.int32)

    slot = jnp.arange(N)
    gidx = jnp.clip(lo_idx[..., None] + slot, 0, MS - 1)  # (B, C, N)
    ok = slot[None, None, :] < jnp.minimum(n_in_range, N)[..., None]
    bidx = jnp.arange(B)[:, None, None]

    q = jnp.where(ok, q_s[bidx, gidx], 0)
    t = jnp.where(ok, t_s[bidx, gidx], 0)
    ln = jnp.where(ok, l_s[bidx, gidx], 0)

    # sort window seeds by (qPos, tPos) for the DP (std::sort by qPos,
    # src/Chain.cpp:244; tPos as deterministic tiebreak)
    BIGQ = jnp.int64(2**31)
    skey = jnp.where(ok, q.astype(jnp.int64) * BIGQ + t.astype(jnp.int64),
                     jnp.int64(2**62))
    sk, q2, t2, l2, ok2 = jax.lax.sort(
        (skey.reshape(B * C, N), q.reshape(B * C, N).astype(jnp.int32),
         t.reshape(B * C, N), ln.reshape(B * C, N).astype(jnp.int32),
         ok.reshape(B * C, N).astype(jnp.int32)),
        num_keys=1,
    )
    return WindowSeeds(
        q_pos=q2.reshape(B, C, N),
        t_pos=t2.reshape(B, C, N).astype(pdt),
        length=l2.reshape(B, C, N),
        valid=ok2.reshape(B, C, N) == 1,
        n_in_range=n_in_range,
    )


def chain_dpn2(ws: WindowSeeds, cfg) -> ChainBatch:
    B, C, N = ws.q_pos.shape
    W = B * C
    q = ws.q_pos.reshape(W, N).astype(jnp.int32)
    t = ws.t_pos.reshape(W, N).astype(jnp.int64)
    ln = ws.length.reshape(W, N).astype(jnp.int32)
    ok = ws.valid.reshape(W, N)

    reward = jnp.float64(cfg.chain_reward * cfg.min_anchor_len)
    jidx = jnp.arange(N, dtype=jnp.int32)

    q_end = q + ln - 1  # qPos_j + len_j - 1
    t_end = t + ln - 1

    def step(carry, i):
        dp, prev = carry
        dist_r = q[:, i][:, None] - q_end  # (W, N)
        dist_t = (t[:, i][:, None] - t_end).astype(jnp.int32)
        can = ok & (jidx[None, :] < i) & (dist_r > 0) & (dist_t > 0)
        d = jnp.abs(dist_r - dist_t)
        pen = jnp.where(
            d <= 1,
            0.0,
            0.1 * d.astype(jnp.float64)
            + cfg.chain_penalty * jnp.log(jnp.maximum(d, 2).astype(jnp.float64)),
        )
        val = jnp.where(can, dp + reward - pen, -jnp.inf)
        base = ln[:, i].astype(jnp.float64)
        best = jnp.max(val, axis=1)
        take = best > base  # strict, like dp[j]+a-b > dp[i] (Chain.cpp:275)
        # predecessor: largest j among ties (reference scans j descending
        # with strict >)
        is_best = val == best[:, None]
        pj = jnp.max(jnp.where(is_best, jidx[None, :], -1), axis=1)
        dp_i = jnp.where(take, best, base)
        prev_i = jnp.where(take, pj, -1)
        dp = dp.at[:, i].set(jnp.where(ok[:, i], dp_i, -jnp.inf))
        prev = prev.at[:, i].set(jnp.where(ok[:, i], prev_i, -1))
        return (dp, prev), None

    dp0 = jnp.full((W, N), -jnp.inf, jnp.float64)
    prev0 = jnp.full((W, N), -1, jnp.int32)
    (dp, prev), _ = jax.lax.scan(step, (dp0, prev0), jnp.arange(N))

    # best end: smallest i among ties (ascending scan, strict >)
    best_score = jnp.max(dp, axis=1)
    any_ok = jnp.any(ok, axis=1)
    best_i = jnp.argmax(dp == best_score[:, None], axis=1).astype(jnp.int32)

    # backtrack (reversed), then flip to ascending qPos
    def bt_cond(state):
        cur, k, _ = state
        return jnp.any(cur >= 0)

    def bt_body(state):
        cur, k, out = state
        act = cur >= 0
        out = out.at[jnp.arange(W), k].set(jnp.where(act, cur, -1))
        nxt = jnp.where(act, prev[jnp.arange(W), jnp.maximum(cur, 0)], -1)
        k = k + act.astype(jnp.int32)
        return nxt, k, out

    out0 = jnp.full((W, N), -1, jnp.int32)
    cur0 = jnp.where(any_ok, best_i, -1)
    _, clen, rev_idx = jax.lax.while_loop(
        bt_cond, bt_body, (cur0, jnp.zeros(W, jnp.int32), out0)
    )

    # chain[j] = rev_idx[clen-1-j]
    pos = jnp.clip(clen[:, None] - 1 - jidx[None, :], 0, N - 1)
    cidx = jnp.take_along_axis(rev_idx, pos, axis=1)
    cvalid = jidx[None, :] < clen[:, None]
    cidx = jnp.clip(cidx, 0, N - 1)

    gq = jnp.where(cvalid, jnp.take_along_axis(q, cidx, 1), 0)
    gt = jnp.where(cvalid, jnp.take_along_axis(t, cidx, 1), 0)
    gl = jnp.where(cvalid, jnp.take_along_axis(ln, cidx, 1), 0)

    score = jnp.where(any_ok, best_score, -1.0).astype(jnp.float32)
    return ChainBatch(
        q_pos=gq.reshape(B, C, N),
        t_pos=gt.reshape(B, C, N).astype(ws.t_pos.dtype),
        length=gl.reshape(B, C, N),
        chain_len=jnp.where(any_ok, clen, 0).reshape(B, C),
        score=score.reshape(B, C),
    )

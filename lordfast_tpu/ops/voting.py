"""Window voting and candidate selection (device, pure jnp).

Batched sparse re-design of ``findTopWins_coarse`` / ``findTopWins_fine``
(src/LordFAST.cpp:582-657, 819-904).  The reference scans a genome-sized
per-thread counter array per read; here votes are sparse: each seed votes
(weight = 1 + len - MIN_ANCHOR_LEN, src/LordFAST.cpp:593) into windows
``winId = tPos / readLen`` and ``winId - 1`` (src/LordFAST.cpp:590-619),
the votes are sorted per read, segment-summed, and local maxima are found
by comparing adjacent (winId, strand) groups — exactly the neighbor
conditions of src/LordFAST.cpp:630-632 (an absent neighbor passes).

Output: the top ``max_candidates`` windows per read by vote count, plus
the coarse-mode decision (best >= scoreRatio * second,
src/LordFAST.cpp:542-543) and the fine-mode threshold minScore = best /
scoreRatio (src/LordFAST.cpp:553).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CandidateBatch(NamedTuple):
    win_id: jnp.ndarray     # (B, C) int32, window index (tStart = w * rl)
    is_rev: jnp.ndarray     # (B, C) bool
    cnt: jnp.ndarray        # (B, C) int32 vote count, descending
    valid: jnp.ndarray      # (B, C) bool
    is_fine: jnp.ndarray    # (B,) bool: fine mode (chain-score re-ranking)
    min_score: jnp.ndarray  # (B,) float32: fine-mode vote threshold


def vote_windows(seeds, read_lens, cfg):
    """seeds: SeedBatch; read_lens: (B,) int32."""
    B, MS = seeds.t_pos.shape
    C = cfg.max_candidates

    rl = jnp.maximum(read_lens, 1).astype(jnp.int64)[:, None]
    win = (seeds.t_pos.astype(jnp.int64) // rl).astype(jnp.int64)
    weight = (1 + seeds.length - cfg.min_anchor_len).astype(jnp.int32)
    strand = seeds.is_rev.astype(jnp.int64)

    # two votes per seed: winId and winId-1 (skip winId-1 < 0).
    # strand in the high bits: same-strand windows stay adjacent in the
    # sorted key space so packed-neighbor checks see winId +- 1.
    BIGW = jnp.int64(2**40)
    key0 = strand * BIGW + win
    key1 = strand * BIGW + (win - 1)
    SENT = jnp.int64(2**62)
    keys = jnp.concatenate(
        [
            jnp.where(seeds.valid, key0, SENT),
            jnp.where(seeds.valid & (win >= 1), key1, SENT),
        ],
        axis=1,
    )  # (B, 2*MS)
    wts = jnp.concatenate([weight, weight], axis=1).astype(jnp.int32)
    wts = jnp.where(keys == SENT, 0, wts)

    keys_s, wts_s = jax.lax.sort((keys, wts), num_keys=1)

    # segment boundaries / ids
    prev = jnp.concatenate([jnp.full((B, 1), -1, jnp.int64), keys_s[:, :-1]], 1)
    is_start = (keys_s != prev) & (keys_s != SENT)
    gid = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1  # (B, 2MS)
    n2 = keys.shape[1]

    # densely packed per-read group tables via scatter on gid
    bidx = jnp.arange(B)[:, None].repeat(n2, 1)
    safe_gid = jnp.where(keys_s == SENT, n2 - 1, gid)
    g_total = jnp.zeros((B, n2), jnp.int32).at[bidx, safe_gid].add(
        jnp.where(keys_s == SENT, 0, wts_s)
    )
    g_key = jnp.full((B, n2), SENT, jnp.int64).at[bidx, safe_gid].min(
        jnp.where(keys_s == SENT, SENT, keys_s)
    )

    # neighbor counts: adjacent packed groups with key +-2 (same strand)
    left_key = jnp.concatenate([jnp.full((B, 1), SENT, jnp.int64), g_key[:, :-1]], 1)
    left_tot = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), g_total[:, :-1]], 1)
    right_key = jnp.concatenate([g_key[:, 1:], jnp.full((B, 1), SENT, jnp.int64)], 1)
    right_tot = jnp.concatenate([g_total[:, 1:], jnp.zeros((B, 1), jnp.int32)], 1)

    has_left = left_key == g_key - 1
    has_right = right_key == g_key + 1
    w_id = (g_key % BIGW).astype(jnp.int32)
    # local maximum (src/LordFAST.cpp:630-632); absent neighbors pass
    is_max = (
        (g_key != SENT)
        & ((w_id == 0) | ~has_left | (g_total >= left_tot))
        & (~has_right | (g_total > right_tot))
    )

    score = jnp.where(is_max, g_total, -1)
    top_cnt, top_pos = jax.lax.top_k(score, C)  # ties: lowest index first
    top_key = jnp.take_along_axis(g_key, top_pos, axis=1)
    valid = top_cnt > 0

    best = top_cnt[:, 0].astype(jnp.float32)
    second = jnp.where(valid[:, 1], top_cnt[:, 1], 0).astype(jnp.float32)
    is_fine = best < cfg.score_ratio * second
    min_score = best / cfg.score_ratio

    return CandidateBatch(
        win_id=jnp.where(valid, (top_key % BIGW).astype(jnp.int32), 0),
        is_rev=jnp.where(valid, top_key >= BIGW, False),
        cnt=jnp.where(valid, top_cnt, 0),
        valid=valid,
        is_fine=is_fine,
        min_score=min_score,
    )

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
    """seeds: SeedBatch; read_lens: (B,) int32.

    Scatter-free: after the per-read key sort, segment totals and the
    left/right-neighbor local-maximum checks are computed with prefix
    scans (cumsum/cummax propagation within sorted segments) — scatters
    of (B, 2*MS) elements are ~10x the cost of scans on TPU.
    """
    B, MS = seeds.t_pos.shape
    C = cfg.max_candidates
    n2 = 2 * MS

    rl = jnp.maximum(read_lens, 1).astype(jnp.int64)[:, None]
    win = (seeds.t_pos.astype(jnp.int64) // rl).astype(jnp.int32)
    weight = (1 + seeds.length - cfg.min_anchor_len).astype(jnp.int32)
    strand = seeds.is_rev.astype(jnp.int32)

    # two votes per seed: winId and winId-1 (skip winId-1 < 0).
    # strand in the high bit: same-strand windows stay adjacent in the
    # sorted key space so neighbor checks see winId +- 1.  Keys fit int32:
    # win < l_pac / min_read_len(>=100) < 2^30 for any supported genome.
    BIGW = jnp.int32(2**30)
    key0 = strand * BIGW + win
    key1 = strand * BIGW + (win - 1)
    SENT = jnp.int32(2**31 - 1)
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

    ok = keys_s != SENT
    prv = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), keys_s[:, :-1]], 1)
    nxt = jnp.concatenate([keys_s[:, 1:], jnp.full((B, 1), SENT, jnp.int32)], 1)
    is_start = (keys_s != prv) & ok
    is_end = (keys_s != nxt) & ok

    # full segment total, propagated to every member:
    # total(e) = cumsum at segment end - cumsum at start-1, both obtained
    # by monotone cummax propagation (cumsum is nondecreasing).
    cw = jnp.cumsum(wts_s, axis=1)
    startm1 = jax.lax.cummax(jnp.where(is_start, cw - wts_s, 0), axis=1)
    part = cw - startm1  # partial total; full at segment ends
    # backward propagation of the end value to all members: encode
    # (reverse position, value) so cummax picks the nearest end's total
    pos_r = jnp.arange(n2 - 1, -1, -1, dtype=jnp.int64)[None, :]
    enc = jnp.where(is_end, pos_r * jnp.int64(2**32) + part.astype(jnp.int64),
                    jnp.int64(-1))
    enc = jax.lax.cummax(enc[:, ::-1], axis=1)[:, ::-1]
    total = (enc & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)

    tot_prev = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), total[:, :-1]], 1)
    tot_next = jnp.concatenate([total[:, 1:], jnp.zeros((B, 1), jnp.int32)], 1)
    w_id = keys_s % BIGW
    # local maximum (src/LordFAST.cpp:630-632); absent neighbors pass.
    # left check is local at segment starts (prv is the previous segment's
    # last position), right check at segment ends; the start verdict is
    # propagated to the end by another monotone cummax.
    left_ok = (w_id == 0) | (prv != keys_s - 1) | (total >= tot_prev)
    pos_f = jnp.arange(n2, dtype=jnp.int32)[None, :]
    lenc = jax.lax.cummax(
        jnp.where(is_start, pos_f * 2 + left_ok.astype(jnp.int32), -1), axis=1
    )
    left_ok_e = (lenc & 1) == 1
    right_ok = (nxt != keys_s + 1) | (total > tot_next)
    is_max = is_end & left_ok_e & right_ok

    score = jnp.where(is_max, total, -1)
    top_cnt, top_pos = jax.lax.top_k(score, C)  # ties: lowest index first
    top_key = jnp.take_along_axis(keys_s, top_pos, axis=1)
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

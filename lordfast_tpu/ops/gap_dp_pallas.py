"""Pallas TPU kernel for the batched Myers bit-parallel gap DP.

Same semantics as ops/gap_dp.py `gap_align` (the jnp reference kernel,
which remains the oracle and the non-TPU fallback): NW / SHW edit
distance with full path under the oracle's traceback priority
(consume-query, then consume-target, then diagonal), including the edlib
negative-end SHW artifact.  Reference semantics:
/root/reference/lib/edlib/edlib.cpp:334-470 (calculateBlock),
:475-870 (NW/SHW drivers).

Why a kernel: the jnp version lowers to one XLA op-graph per scan step —
T sequential columns x W word-chain steps of (G,)-wide ops, each a
separate HLO with loop overhead, plus (T, G, W) decision bitplanes
round-tripped through HBM and a gather-per-step lockstep traceback.
Measured 2.18 Gcell/s (BENCH_r02) — CPU-class.  Here the whole DP for a
G-slab of gaps runs inside one kernel:

- G gaps ride the lane axis (vectors are (1, G); G a multiple of 128).
- The T-column fill loop runs in-kernel (while_loop in Mosaic's
  counter/bound fori pattern); Pv/Mv live in vregs; the two decision
  bitplanes (PvOut = "up" bits, pre-shift Ph = "left" bits) are written
  to VMEM scratch, never to HBM.
- Traceback runs in the same kernel, in **column lockstep**: a shared
  column cursor walks T-1..0; a gap activates when the cursor reaches
  its end column and then stays in lockstep (exactly one column
  transition per step).  Per column, the run of consume-query moves is
  the run of set bits in the "up" column below the gap's current row —
  extracted with mask + highest-set-bit arithmetic, no per-lane gather
  anywhere.  Each gap emits one (run, move) pair per column; the host
  expands these to the oracle's move array with one np.repeat per gap.

The per-column code is `(run << 2) | move` with move in {OP_MATCH,
OP_DELETE, OP_MISMATCH}; runs count OP_INSERTs preceding... (in forward
order: following) the move; `lead` counts the path-leading inserts.
Forward path = [INSERT]*lead + concat_{c=0..end}([move_c] + [INSERT]*run_c).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gap_dp import OP_MATCH, OP_INSERT, OP_DELETE, OP_MISMATCH, _build_peq

INT32_MAX = np.int32(2**31 - 1)

# Pallas path is used for buckets up to this query width (W = Q/32 <= 16);
# wider gaps keep the jnp kernel (VMEM bitplane budget; they are rare).
MAX_PALLAS_Q = 512

_VMEM_PLANE_BUDGET = 11 * 2**20  # VMEM bytes for planes + ts + colcode


class GapColsResult(NamedTuple):
    dist: jnp.ndarray      # (G,) int32
    end: jnp.ndarray       # (G,) int32 (SHW best end / -1; NW: tl-1)
    lead: jnp.ndarray      # (G,) int32 path-leading insert count
    # (T, G) uint16: (run << 2) | move per column.  Deliberately NOT
    # transposed on device: a (G, T) device array with a short minor
    # dimension device_gets ~4000x slower over tunneled backends (the
    # runtime fetches it row-by-row); (T, G) moves at full link speed
    # and the host decode reads columns via a free .T view.
    colcode: jnp.ndarray


def _g_tile(Q: int, T: int, G: int) -> int:
    """Lanes per grid step, bounded by the VMEM budget: two (T*W, GT)
    uint32 decision planes plus the (T, GT) int32 ts input and colcode
    output — GT * T * (8W + 8) bytes total."""
    W = Q // 32
    cap = _VMEM_PLANE_BUDGET // (T * (8 * W + 8))
    t = 128
    while t * 2 <= min(cap, G):
        t *= 2
    return min(t, G)


def _make_kernel(Q: int, T: int, W: int, G: int):
    def kernel(peq_ref, ts_ref, ql_ref, tl_ref, shw_ref, w64_ref, cap_ref,
               bmask_ref, dist_ref, end_ref, lead_ref, colcode_ref,
               pv_plane, ph_plane):
        u0 = jnp.uint32(0)
        u1 = jnp.uint32(1)
        uF = jnp.uint32(0xFFFFFFFF)
        # typed int32 literals: under jax_enable_x64 weak Python ints
        # promote to int64, which Mosaic cannot lower in-kernel
        i0 = jnp.int32(0)
        i1 = jnp.int32(1)
        op_match = jnp.int32(OP_MATCH)
        op_delete = jnp.int32(OP_DELETE)
        op_mismatch = jnp.int32(OP_MISMATCH)
        ql = ql_ref[0:1, :]
        tl = tl_ref[0:1, :]
        shw = shw_ref[0:1, :]
        w64 = w64_ref[0:1, :]
        neg1_cap = cap_ref[0:1, :]

        PEQ = [[peq_ref[c * W + w : c * W + w + 1, :] for w in range(W)]
               for c in range(5)]
        BM = [bmask_ref[w : w + 1, :] for w in range(W)]

        def sel_eq(tchar, w):
            eq = PEQ[0][w]
            for c in range(1, 5):
                eq = jnp.where(tchar == c, PEQ[c][w], eq)
            return eq

        # ---- fill: one Myers column per iteration ----
        def fill_body(carry):
            c, ub, Pv, Mv, score, dist, best, best_end, neg1 = carry
            tchar = ts_ref[pl.ds(c, 1), :]
            hin = jnp.ones_like(score)  # top boundary D(-1,c)=c: +1
            Pv2 = [None] * W
            Mv2 = [None] * W
            pb = jnp.zeros_like(score)
            mb = jnp.zeros_like(score)
            for w in range(W):
                eq = sel_eq(tchar, w)
                hin_pos = jnp.where(hin > 0, u1, u0)
                hin_neg = jnp.where(hin < 0, u1, u0)
                pv, mv = Pv[w], Mv[w]
                xv = eq | mv
                eq2 = eq | hin_neg
                xh = (((eq2 & pv) + pv) ^ pv) | eq2
                ph = mv | ~(xh | pv)
                mh = pv & xh
                msb = jnp.uint32(0x80000000)
                hout = jnp.where((ph & msb) != 0, i1, i0) - jnp.where(
                    (mh & msb) != 0, i1, i0
                )
                ph_s = (ph << 1) | hin_pos
                mh_s = (mh << 1) | hin_neg
                pv_o = mh_s | ~(xv | ph_s)
                mv_o = ph_s & xv
                Pv2[w] = pv_o
                Mv2[w] = mv_o
                pv_plane[pl.ds(c * W + w, 1), :] = pv_o
                ph_plane[pl.ds(c * W + w, 1), :] = ph
                pb = pb | jnp.where((ph & BM[w]) != 0, i1, i0)
                mb = mb | jnp.where((mh & BM[w]) != 0, i1, i0)
                hin = hout
            score = score + pb - mb
            dist = jnp.where(c == tl - 1, score, dist)
            in_range = c < tl
            upd = in_range & (score < best)
            best_end = jnp.where(upd, c, best_end)
            best = jnp.where(upd, score, best)
            j = c + i1
            neg1 = jnp.where(in_range & (j <= neg1_cap),
                             jnp.minimum(neg1, score + j), neg1)
            return (j, ub, tuple(Pv2), tuple(Mv2), score, dist, best,
                    best_end, neg1)

        Pv0 = tuple(jnp.full((1, G), uF) for _ in range(W))
        Mv0 = tuple(jnp.full((1, G), u0) for _ in range(W))
        # carry layout (counter, bound, ...) with cond s[0] < s[1]: the
        # exact shape Mosaic pattern-matches into an scf.For with an i32
        # induction variable (generic scf.While lowering emits an i64 that
        # fails legalization)
        init = (
            i0, jnp.int32(T), Pv0, Mv0, ql,                # score=D(ql-1,-1)
            jnp.full((1, G), INT32_MAX),
            jnp.full((1, G), INT32_MAX),
            jnp.full((1, G), np.int32(-2)),
            jnp.where(w64 >= 1, ql, INT32_MAX),            # j=0 term
        )
        (_, _, _, _, _, nw_dist, best, best_end, neg1) = jax.lax.while_loop(
            lambda s: s[0] < s[1], fill_body, init
        )

        use_neg1 = (w64 >= 1) & (neg1 <= best)
        shw_dist = jnp.where(use_neg1, neg1,
                             jnp.where(best_end == -2, ql, best))
        shw_end = jnp.where(use_neg1 | (best_end == -2), np.int32(-1),
                            best_end)
        is_shw = shw != 0
        dist = jnp.where(is_shw, shw_dist, nw_dist)
        end = jnp.where(is_shw, shw_end, tl - 1)
        dist_ref[0:1, :] = dist
        end_ref[0:1, :] = end

        # ---- traceback: shared column cursor T-1..0; active gaps stay in
        # exact lockstep (one column transition per iteration) ----
        def tb_body(carry):
            i, ub, r, c = carry
            active = c <= end
            # vertical run: highest clear bit p <= r in the "up" column
            p = jnp.full((1, G), np.int32(-1))
            for w in range(W):
                v = pv_plane[pl.ds(c * W + w, 1), :]
                rel = r - 32 * w
                relc = pltpu.bitcast(jnp.clip(rel, i0, jnp.int32(30)),
                                     jnp.uint32)
                mask = jnp.where(
                    rel < 0, u0,
                    jnp.where(rel >= 31, uF, (u1 << (relc + 1)) - u1),
                )
                z = (~v) & mask
                hb = 31 - pltpu.bitcast(jax.lax.clz(z), jnp.int32)
                p = jnp.maximum(p, jnp.where(z != 0, 32 * w + hb,
                                             np.int32(-1)))
            run = r - p
            # decide the column-transition move at row p
            rw = jnp.maximum(p, i0) >> 5
            rb = pltpu.bitcast(jnp.maximum(p, i0) & 31, jnp.uint32)
            tchar = ts_ref[pl.ds(c, 1), :]
            leftb = jnp.zeros((1, G), jnp.int32)
            eqb = jnp.zeros((1, G), jnp.int32)
            for w in range(W):
                lw = ph_plane[pl.ds(c * W + w, 1), :]
                eqw = sel_eq(tchar, w)
                selw = rw == w
                leftb = jnp.where(
                    selw & (((lw >> rb) & u1) != 0), i1, leftb
                )
                eqb = jnp.where(
                    selw & (((eqw >> rb) & u1) != 0), i1, eqb
                )
            is_del = (p < 0) | (leftb == 1)
            mv = jnp.where(
                is_del, op_delete,
                jnp.where(eqb == 1, op_match, op_mismatch),
            )
            code = jnp.where(active, mv | (run << 2), i0)
            colcode_ref[pl.ds(c, 1), :] = code
            r2 = jnp.where(active, jnp.where(is_del, p, p - i1), r)
            return (i + i1, ub, r2, c - i1)

        _, _, r_fin, _ = jax.lax.while_loop(
            lambda s: s[0] < s[1], tb_body,
            (i0, jnp.int32(T), ql - 1, jnp.int32(T - 1))
        )
        lead_ref[0:1, :] = r_fin + 1

    return kernel



def _pick_tile(Q: int, T: int):
    """Column-tile width for the checkpoint/recompute kernel: largest
    multiple of 8 dividing T with TT * W <= 4608 plane rows."""
    W = Q // 32
    tt = (4608 // W) & ~7
    while tt >= 8:
        if T % tt == 0:
            return tt
        tt -= 8
    return 0


def _pick_cpt(Q: int, T: int, TT: int):
    """Checkpoint stride (tiles per saved carry) for the tiled kernel:
    smallest power of two so the per-lane VMEM footprint — planes
    (2*TT*W words) + carries (ceil(NT/CPT)*2*W words) + ts/colcode
    (2*T words) — fits the budget at the 128-lane minimum tile.  The
    traceback refills up to CPT tiles to reach a walked tile (classic
    hierarchical checkpointing), trading ~CPT/2 extra fill passes for
    O(NT/CPT) carry memory; Q=4096 buckets fit VMEM at CPT=8."""
    W = Q // 32
    NT = T // TT
    cpt = 1
    while cpt <= NT:
        n_cp = -(-NT // cpt)
        per_lane = (2 * TT * W + n_cp * 2 * W + 2 * T) * 4
        if 128 * per_lane <= _VMEM_PLANE_BUDGET:
            return cpt
        cpt *= 2
    return 0


def supports(Q: int, T: int) -> bool:
    """Can the Pallas path handle this bucket?  Small buckets keep the
    whole bitplane set in VMEM; larger ones use the tiled kernel
    (checkpointed carries + per-tile refill during traceback)."""
    W = Q // 32
    if T * W <= 9216:
        return Q <= MAX_PALLAS_Q
    if Q > 4096:
        return False
    TT = _pick_tile(Q, T)
    return TT >= 8 and _pick_cpt(Q, T, TT) >= 1


def _make_kernel_tiled(Q: int, T: int, TT: int, W: int, G: int,
                       CPT: int = 1):
    """Myers fill + traceback with T tiled into T/TT column tiles.

    VMEM holds bitplanes for ONE tile only; Pv/Mv carries are
    checkpointed every CPT tile starts during the fill, and the
    traceback restores the nearest checkpoint and re-fills up to CPT
    tiles' planes before walking a tile's columns (hierarchical
    checkpoint/recompute: ~CPT/2 extra fill passes, O(T/(TT*CPT)) carry
    memory).  This covers buckets whose full bitplane set (T * W rows)
    exceeds VMEM — large-query gaps up to Q=4096."""
    NT = T // TT
    NCP = -(-NT // CPT)  # number of saved carries

    def kernel(peq_ref, ts_ref, ql_ref, tl_ref, shw_ref, w64_ref, cap_ref,
               bmask_ref, dist_ref, end_ref, lead_ref, colcode_ref,
               pv_plane, ph_plane, carry_buf):
        u0 = jnp.uint32(0)
        u1 = jnp.uint32(1)
        uF = jnp.uint32(0xFFFFFFFF)
        i0 = jnp.int32(0)
        i1 = jnp.int32(1)
        op_match = jnp.int32(OP_MATCH)
        op_delete = jnp.int32(OP_DELETE)
        op_mismatch = jnp.int32(OP_MISMATCH)
        ql = ql_ref[0:1, :]
        tl = tl_ref[0:1, :]
        shw = shw_ref[0:1, :]
        w64 = w64_ref[0:1, :]
        neg1_cap = cap_ref[0:1, :]

        PEQ = [[peq_ref[c * W + w : c * W + w + 1, :] for w in range(W)]
               for c in range(5)]
        BM = [bmask_ref[w : w + 1, :] for w in range(W)]

        def sel_eq(tchar, w):
            eq = PEQ[0][w]
            for c in range(1, 5):
                eq = jnp.where(tchar == c, PEQ[c][w], eq)
            return eq

        def col_step(c, c_loc, Pv, Mv, track_bits):
            """One Myers column at global column c, planes written at
            local tile offset c_loc.  Returns (Pv2, Mv2, pb, mb)."""
            tchar = ts_ref[pl.ds(c, 1), :]
            hin = jnp.ones((1, G), jnp.int32)
            Pv2 = [None] * W
            Mv2 = [None] * W
            pb = jnp.zeros((1, G), jnp.int32)
            mb = jnp.zeros((1, G), jnp.int32)
            for w in range(W):
                eq = sel_eq(tchar, w)
                hin_pos = jnp.where(hin > 0, u1, u0)
                hin_neg = jnp.where(hin < 0, u1, u0)
                pv, mv = Pv[w], Mv[w]
                xv = eq | mv
                eq2 = eq | hin_neg
                xh = (((eq2 & pv) + pv) ^ pv) | eq2
                ph = mv | ~(xh | pv)
                mh = pv & xh
                msb = jnp.uint32(0x80000000)
                hout = jnp.where((ph & msb) != 0, i1, i0) - jnp.where(
                    (mh & msb) != 0, i1, i0
                )
                ph_s = (ph << 1) | hin_pos
                mh_s = (mh << 1) | hin_neg
                pv_o = mh_s | ~(xv | ph_s)
                mv_o = ph_s & xv
                Pv2[w] = pv_o
                Mv2[w] = mv_o
                pv_plane[pl.ds(c_loc * W + w, 1), :] = pv_o
                ph_plane[pl.ds(c_loc * W + w, 1), :] = ph
                if track_bits:
                    pb = pb | jnp.where((ph & BM[w]) != 0, i1, i0)
                    mb = mb | jnp.where((mh & BM[w]) != 0, i1, i0)
                hin = hout
            return tuple(Pv2), tuple(Mv2), pb, mb

        # ---- fill with per-tile carry checkpoints ----
        def fill_body(carry):
            c, ub, Pv, Mv, score, dist, best, best_end, neg1 = carry
            tile = c // jnp.int32(TT)
            c_loc = c - tile * jnp.int32(TT)

            @pl.when((c_loc == 0) & (tile % jnp.int32(CPT) == 0))
            def _():
                base = (tile // jnp.int32(CPT)) * jnp.int32(2 * W)
                for w in range(W):
                    carry_buf[pl.ds(base + w, 1), :] = Pv[w]
                    carry_buf[pl.ds(base + W + w, 1), :] = Mv[w]

            Pv2, Mv2, pb, mb = col_step(c, c_loc, Pv, Mv, True)
            score = score + pb - mb
            dist = jnp.where(c == tl - 1, score, dist)
            in_range = c < tl
            upd = in_range & (score < best)
            best_end = jnp.where(upd, c, best_end)
            best = jnp.where(upd, score, best)
            j = c + i1
            neg1 = jnp.where(in_range & (j <= neg1_cap),
                             jnp.minimum(neg1, score + j), neg1)
            return (j, ub, Pv2, Mv2, score, dist, best, best_end, neg1)

        Pv0 = tuple(jnp.full((1, G), uF) for _ in range(W))
        Mv0 = tuple(jnp.full((1, G), u0) for _ in range(W))
        init = (
            i0, jnp.int32(T), Pv0, Mv0, ql,
            jnp.full((1, G), INT32_MAX),
            jnp.full((1, G), INT32_MAX),
            jnp.full((1, G), np.int32(-2)),
            jnp.where(w64 >= 1, ql, INT32_MAX),
        )
        (_, _, _, _, _, nw_dist, best, best_end, neg1) = jax.lax.while_loop(
            lambda st: st[0] < st[1], fill_body, init
        )

        use_neg1 = (w64 >= 1) & (neg1 <= best)
        shw_dist = jnp.where(use_neg1, neg1,
                             jnp.where(best_end == -2, ql, best))
        shw_end = jnp.where(use_neg1 | (best_end == -2), np.int32(-1),
                            best_end)
        is_shw = shw != 0
        dist = jnp.where(is_shw, shw_dist, nw_dist)
        end = jnp.where(is_shw, shw_end, tl - 1)
        dist_ref[0:1, :] = dist
        end_ref[0:1, :] = end

        # ---- traceback: per tile (reverse): restore carry, refill the
        # tile's planes, then walk its columns ----
        def tb_col(c, c_loc, r):
            active = c <= end
            p = jnp.full((1, G), np.int32(-1))
            for w in range(W):
                v = pv_plane[pl.ds(c_loc * W + w, 1), :]
                rel = r - 32 * w
                relc = pltpu.bitcast(jnp.clip(rel, i0, jnp.int32(30)),
                                     jnp.uint32)
                mask = jnp.where(
                    rel < 0, u0,
                    jnp.where(rel >= 31, uF, (u1 << (relc + 1)) - u1),
                )
                z = (~v) & mask
                hb = 31 - pltpu.bitcast(jax.lax.clz(z), jnp.int32)
                p = jnp.maximum(p, jnp.where(z != 0, 32 * w + hb,
                                             np.int32(-1)))
            run = r - p
            rw = jnp.maximum(p, i0) >> 5
            rb = pltpu.bitcast(jnp.maximum(p, i0) & 31, jnp.uint32)
            tchar = ts_ref[pl.ds(c, 1), :]
            leftb = jnp.zeros((1, G), jnp.int32)
            eqb = jnp.zeros((1, G), jnp.int32)
            for w in range(W):
                lw = ph_plane[pl.ds(c_loc * W + w, 1), :]
                eqw = sel_eq(tchar, w)
                selw = rw == w
                leftb = jnp.where(
                    selw & (((lw >> rb) & u1) != 0), i1, leftb
                )
                eqb = jnp.where(
                    selw & (((eqw >> rb) & u1) != 0), i1, eqb
                )
            is_del = (p < 0) | (leftb == 1)
            mv = jnp.where(
                is_del, op_delete,
                jnp.where(eqb == 1, op_match, op_mismatch),
            )
            code = jnp.where(active, mv | (run << 2), i0)
            colcode_ref[pl.ds(c, 1), :] = code
            return jnp.where(active, jnp.where(is_del, p, p - i1), r)

        def tile_body(carry):
            tt_i, ntc, r = carry
            tile = jnp.int32(NT - 1) - tt_i
            cp = tile // jnp.int32(CPT)          # nearest checkpoint
            base_tile = cp * jnp.int32(CPT)
            base = cp * jnp.int32(2 * W)
            Pv = tuple(carry_buf[pl.ds(base + w, 1), :] for w in range(W))
            Mv = tuple(carry_buf[pl.ds(base + W + w, 1), :]
                       for w in range(W))

            # re-fill from the checkpointed tile through the walked tile;
            # intermediate tiles overwrite the plane buffer harmlessly —
            # only the final (walked) tile's planes are read back
            n_cols = (tile - base_tile + i1) * jnp.int32(TT)
            t_base = base_tile * jnp.int32(TT)

            def refill_body(st):
                cl, ub2, Pv, Mv = st
                c_loc = cl % jnp.int32(TT)
                Pv2, Mv2, _, _ = col_step(t_base + cl, c_loc, Pv, Mv,
                                          False)
                return (cl + i1, ub2, Pv2, Mv2)

            jax.lax.while_loop(
                lambda st: st[0] < st[1], refill_body,
                (i0, n_cols, Pv, Mv),
            )

            t0 = tile * jnp.int32(TT)

            def walk_body(st):
                k, ub2, r = st
                c_loc = jnp.int32(TT - 1) - k
                r = tb_col(t0 + c_loc, c_loc, r)
                return (k + i1, ub2, r)

            _, _, r = jax.lax.while_loop(
                lambda st: st[0] < st[1], walk_body,
                (i0, jnp.int32(TT), r),
            )
            return (tt_i + i1, ntc, r)

        _, _, r_fin = jax.lax.while_loop(
            lambda st: st[0] < st[1], tile_body,
            (i0, jnp.int32(NT), ql - 1),
        )
        lead_ref[0:1, :] = r_fin + 1

    return kernel


@functools.partial(jax.jit, static_argnums=(5, 6),
                   static_argnames=("interpret",))
def gap_align_pl(qs, ql, ts, tl, is_shw, Q: int, T: int,
                 interpret: bool = False) -> GapColsResult:
    """Pallas-backed batched NW/SHW alignment; same inputs as
    gap_dp.gap_align, output as per-column run/move codes (GapColsResult).
    Exact vs the jnp kernel / host oracle (tests/test_gap_dp_pallas.py)."""
    assert Q % 32 == 0 and supports(Q, T)
    G = qs.shape[0]
    W = Q // 32
    tiled = T * W > 9216
    if tiled:
        TT = _pick_tile(Q, T)
        NT = T // TT
        CPT = _pick_cpt(Q, T, TT)
        NCP = -(-NT // CPT)
        per_lane = 2 * TT * W * 4 + T * 8 + NCP * 2 * W * 4
        GT = 128
        while GT * 2 * per_lane <= _VMEM_PLANE_BUDGET and GT * 2 <= G:
            GT *= 2
        GT = min(GT, G)
    else:
        GT = _g_tile(Q, T, G)
    assert G % GT == 0

    ql = ql.astype(jnp.int32)
    tl = tl.astype(jnp.int32)
    peq = _build_peq(jnp.asarray(qs), Q, W)          # (G, 5, W)
    peq = peq.transpose(1, 2, 0).reshape(5 * W, G)   # (5W, G)
    ts_t = jnp.asarray(ts).astype(jnp.int32).T       # (T, G)
    bw = (ql - 1) >> 5
    bb = ((ql - 1) & 31).astype(jnp.uint32)
    bmask = jnp.where(
        jnp.arange(W, dtype=jnp.int32)[:, None] == bw[None, :],
        jnp.uint32(1) << bb[None, :], jnp.uint32(0),
    )                                                # (W, G)
    w64 = ((64 - (ql % 64)) % 64).astype(jnp.int32)
    cap = jnp.minimum(w64, tl)

    row2 = lambda a: a.reshape(1, G)
    grid = (G // GT,)
    # index_map literals must be typed int32: under jax_enable_x64 a bare
    # Python 0 lowers to an i64 constant in the index-map func, which
    # Mosaic fails to legalize ("func.return (i64, i32)")
    zero = np.int32(0)
    vspec = lambda rows: pl.BlockSpec((rows, GT), lambda i: (zero, i),
                                      memory_space=pltpu.VMEM)
    if tiled:
        kern = _make_kernel_tiled(Q, T, TT, W, GT, CPT)
        scratch = [
            pltpu.VMEM((TT * W, GT), jnp.uint32),
            pltpu.VMEM((TT * W, GT), jnp.uint32),
            pltpu.VMEM((NCP * 2 * W, GT), jnp.uint32),
        ]
    else:
        kern = _make_kernel(Q, T, W, GT)
        scratch = [
            pltpu.VMEM((T * W, GT), jnp.uint32),
            pltpu.VMEM((T * W, GT), jnp.uint32),
        ]
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            vspec(5 * W),   # peq
            vspec(T),       # ts
            vspec(1), vspec(1), vspec(1), vspec(1), vspec(1),  # scalars/gap
            vspec(W),       # bmask
        ],
        out_specs=[vspec(1), vspec(1), vspec(1), vspec(T)],
        out_shape=[
            jax.ShapeDtypeStruct((1, G), jnp.int32),  # dist
            jax.ShapeDtypeStruct((1, G), jnp.int32),  # end
            jax.ShapeDtypeStruct((1, G), jnp.int32),  # lead
            jax.ShapeDtypeStruct((T, G), jnp.int32),  # colcode
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(peq, ts_t, row2(ql), row2(tl),
      row2(jnp.asarray(is_shw).astype(jnp.int32)), row2(w64), row2(cap),
      bmask)
    dist, end, lead, colcode = out
    return GapColsResult(
        dist=dist[0], end=end[0], lead=lead[0],
        colcode=colcode.astype(jnp.uint16),
    )


def _decode_native(colcode_tg, end, lead):
    """Native decode path; None when the C++ library is unavailable."""
    import ctypes

    from ..native import _load

    lib = _load()
    if lib is None or not hasattr(lib, "decode_colcodes"):
        return None
    g = len(end)
    T = colcode_tg.shape[0]
    col = np.ascontiguousarray(colcode_tg.T[:g], dtype=np.uint16)
    ends = np.ascontiguousarray(end, dtype=np.int64)
    leads = np.ascontiguousarray(lead, dtype=np.int64)
    # exact size: lead inserts + one move per emitted column + the insert
    # runs encoded in the codes themselves (columns past `end` are zeroed
    # by the kernel, so a full-row sum is the true run total).  Computed
    # from the data, not MAX_PALLAS_Q: the tiled path accepts Q up to
    # 2048, where a constant-based cap could under-size the buffer and
    # silently drop to the slow numpy decode.
    total_runs = int((col.astype(np.int64) >> 2).sum())
    cap = int(leads.sum() + (ends + 1).clip(0).sum() + total_runs)
    cap = max(cap, 64)
    out = np.empty(cap, np.uint8)
    offs = np.empty(g, np.int64)
    lens = np.empty(g, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    total = lib.decode_colcodes(
        col.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        T, ends.ctypes.data_as(i64p), leads.ctypes.data_as(i64p), g,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        offs.ctypes.data_as(i64p), lens.ctypes.data_as(i64p),
    )
    if total < 0:
        return None
    return [out[offs[i] : offs[i] + lens[i]] for i in range(g)]


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def gap_align_from_desc_pl(pac_words, reads, desc, Q: int, T: int,
                           l_pac: int) -> GapColsResult:
    """Descriptor-driven variant: device gather of the gap sequences from
    the resident read batch + packed genome (gap_dp.gather_gap_seqs —
    identical semantics to gap_align_from_desc), then the Pallas kernel."""
    from .gap_dp import gather_gap_seqs

    qs, ql, ts, tl = gather_gap_seqs(pac_words, reads, desc, Q, T, l_pac)
    return gap_align_pl(qs, ql, ts, tl, desc["is_shw"], Q, T)


def decode_col_moves(colcode_tg: np.ndarray, end: np.ndarray,
                     lead: np.ndarray) -> list:
    """Host-side: expand per-column (run, move) codes into the oracle's
    forward move arrays.  colcode_tg is the kernel's (T, G) layout (see
    GapColsResult.colcode).  Uses the native decoder when available (the
    pure-numpy path costs ~1 s/chunk in np.repeat calls at bench scale);
    both produce identical arrays."""
    native = _decode_native(colcode_tg, end, lead)
    if native is not None:
        return native
    colcode = colcode_tg.T
    G = colcode.shape[0]
    out = []
    for g in range(G):
        e = int(end[g])
        ld = int(lead[g])
        if e < 0:
            out.append(np.full(ld, OP_INSERT, np.uint8))
            continue
        codes = colcode[g, : e + 1].astype(np.int64)
        n = e + 1
        vals = np.empty(2 * n + 1, np.uint8)
        cnts = np.empty(2 * n + 1, np.int64)
        vals[0] = OP_INSERT
        cnts[0] = ld
        vals[1::2] = (codes & 3).astype(np.uint8)
        cnts[1::2] = 1
        vals[2::2] = OP_INSERT
        cnts[2::2] = codes >> 2
        out.append(np.repeat(vals, cnts))
    return out

"""edlib_path.cpp byte-exactness: differential test of edlib_band_path /
edlib_nw_dist against the REFERENCE'S OWN edlib library (compiled from
/root/reference/lib/edlib into the gitignored .refbuild/, like the
baseline binary) — the move arrays must be IDENTICAL, band-edge tie
choices and Hirschberg splits included.  Also validates nw_align (the
banded-dist + banded-path composite align_eq.cpp now exposes)."""

import ctypes
from pathlib import Path

import numpy as np
import pytest

from lordfast_tpu.native import _load

EDLIB_SO = Path(__file__).parent.parent / ".refbuild" / "libedlib.so"

u8p = ctypes.POINTER(ctypes.c_uint8)
i64p = ctypes.POINTER(ctypes.c_int64)


class EdlibAlignConfig(ctypes.Structure):
    _fields_ = [("k", ctypes.c_int), ("mode", ctypes.c_int),
                ("task", ctypes.c_int)]


class EdlibAlignResult(ctypes.Structure):
    _fields_ = [
        ("editDistance", ctypes.c_int),
        ("endLocations", ctypes.POINTER(ctypes.c_int)),
        ("startLocations", ctypes.POINTER(ctypes.c_int)),
        ("numLocations", ctypes.c_int),
        ("alignment", ctypes.POINTER(ctypes.c_ubyte)),
        ("alignmentLength", ctypes.c_int),
        ("alphabetLength", ctypes.c_int),
    ]


EDLIB_MODE_NW = 0
EDLIB_TASK_PATH = 2


@pytest.fixture(scope="module")
def libs():
    if not EDLIB_SO.exists():
        pytest.skip("reference edlib not built in .refbuild/")
    ed = ctypes.CDLL(str(EDLIB_SO))
    ed.edlibAlign.restype = EdlibAlignResult
    ed.edlibAlign.argtypes = [ctypes.c_char_p, ctypes.c_int,
                              ctypes.c_char_p, ctypes.c_int,
                              EdlibAlignConfig]
    ed.edlibFreeAlignResult.argtypes = [EdlibAlignResult]
    lib = _load()
    assert lib is not None and hasattr(lib, "edlib_band_path")
    return ed, lib


def edlib_ref(ed, q_codes, t_codes):
    """(dist, moves) from the reference's edlib, NW + TASK_PATH, k=-1."""
    qs = bytes(bytearray(b"ACGTN"[c] for c in q_codes))
    ts = bytes(bytearray(b"ACGTN"[c] for c in t_codes))
    cfg = EdlibAlignConfig(-1, EDLIB_MODE_NW, EDLIB_TASK_PATH)
    r = ed.edlibAlign(qs, len(qs), ts, len(ts), cfg)
    d = int(r.editDistance)
    mv = np.ctypeslib.as_array(r.alignment,
                               shape=(r.alignmentLength,)).copy()
    ed.edlibFreeAlignResult(r)
    return d, mv


def ours(lib, q, t, k):
    moves = np.zeros(len(q) + len(t) + 8, np.uint8)
    ml = ctypes.c_int64(0)
    rc = lib.edlib_band_path(
        q.ctypes.data_as(u8p), len(q), t.ctypes.data_as(u8p), len(t),
        int(k), moves.ctypes.data_as(u8p), ctypes.byref(ml),
    )
    assert rc == 0
    return moves[: ml.value].copy()


def _gen_pair(rng, ql, tl, related):
    q = rng.integers(0, 4, ql).astype(np.uint8)
    if related:
        t = q.copy()
        for _ in range(int(rng.integers(0, max(1, ql // 6)))):
            p = int(rng.integers(0, len(t)))
            op = rng.random()
            if op < 0.5:
                t[p] = rng.integers(0, 4)
            elif op < 0.75 and len(t) > 1:
                t = np.delete(t, p)
            else:
                t = np.insert(t, p, rng.integers(0, 4))
        if len(t) >= tl:
            t = t[:tl]
        else:
            t = np.concatenate(
                [t, rng.integers(0, 4, tl - len(t)).astype(np.uint8)]
            )
    else:
        t = rng.integers(0, 4, tl).astype(np.uint8)
    return q, np.ascontiguousarray(t, np.uint8)


def test_band_path_byte_equal_vs_reference_edlib(libs, rng):
    ed, lib = libs
    n = 0
    for it in range(400):
        related = rng.random() < 0.6
        ql = int(rng.integers(1, 300))
        tl = int(rng.integers(1, 380))
        q, t = _gen_pair(rng, ql, tl, related)
        d_ref, mv_ref = edlib_ref(ed, q, t)
        mv = ours(lib, q, t, d_ref)
        np.testing.assert_array_equal(mv, mv_ref, err_msg=f"case {it}")
        n += 1
    assert n == 400


def test_band_path_byte_equal_word_boundaries(libs, rng):
    """Query lengths straddling the 64-word boundaries (W padding edge
    cases of the banded fill/traceback)."""
    ed, lib = libs
    for ql in (63, 64, 65, 127, 128, 129, 191, 192, 193):
        for _ in range(8):
            tl = int(rng.integers(max(1, ql - 40), ql + 60))
            q, t = _gen_pair(rng, ql, tl, True)
            d_ref, mv_ref = edlib_ref(ed, q, t)
            mv = ours(lib, q, t, d_ref)
            np.testing.assert_array_equal(mv, mv_ref, err_msg=str(ql))


def test_band_path_byte_equal_hirschberg(libs):
    """Big enough that edlib itself takes the Hirschberg branch
    (> 1 MB traceback memory): alignments still byte-identical.  Own
    deterministic seeds (seed 3 caught the floor-vs-ceil half-split
    slip the session rng happened to hit)."""
    ed, lib = libs
    for seed in (0, 1, 2, 3, 4, 7, 11):
        rng2 = np.random.default_rng(seed)
        ql = int(rng2.integers(6000, 30000))
        q, t = _gen_pair(rng2, ql, ql + int(rng2.integers(-500, 500)),
                         True)
        d_ref, mv_ref = edlib_ref(ed, q, t)
        assert (2 * 8 + 4) * ((ql + 63) // 64) * len(t) >= 1 << 20
        mv = ours(lib, q, t, d_ref)
        np.testing.assert_array_equal(mv, mv_ref, err_msg=f"seed {seed}")


def test_nw_dist_matches_reference_edlib(libs, rng):
    ed, lib = libs
    for _ in range(100):
        q, t = _gen_pair(rng, int(rng.integers(1, 400)),
                         int(rng.integers(1, 400)), rng.random() < 0.5)
        d_ref, _ = edlib_ref(ed, q, t)
        d = lib.edlib_nw_dist(q.ctypes.data_as(u8p), len(q),
                              t.ctypes.data_as(u8p), len(t))
        assert d == d_ref


def test_nw_align_now_band_exact(libs, rng):
    """align_eq.nw_align (used by the stitcher for every local path)
    returns the banded-exact moves."""
    ed, lib = libs
    for _ in range(60):
        q, t = _gen_pair(rng, int(rng.integers(1, 250)),
                         int(rng.integers(1, 300)), True)
        d_ref, mv_ref = edlib_ref(ed, q, t)
        moves = np.zeros(len(q) + len(t) + 8, np.uint8)
        ml = ctypes.c_int64(0)
        d = lib.nw_align(q.ctypes.data_as(u8p), len(q),
                         t.ctypes.data_as(u8p), len(t),
                         moves.ctypes.data_as(u8p), ctypes.byref(ml))
        assert d == d_ref
        np.testing.assert_array_equal(moves[: ml.value], mv_ref)

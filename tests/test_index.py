"""Index builder unit tests against naive oracles (SURVEY.md §4: FM-index
rank/locate vs naive suffix search)."""

import numpy as np
import pytest

from lordfast_tpu.index.builder import build_index, load_index, save_index
from lordfast_tpu.index.fm_host import (
    backward_ext_np,
    bwt_b0_np,
    occ_np,
    sa_lookup_np,
)
from lordfast_tpu.native import suffix_array, _suffix_array_doubling
from lordfast_tpu.utils.pack import (
    pack_bwt_words,
    unpack_bwt_words,
    unpack_pac,
)


def naive_suffix_array(text):
    n = len(text)
    return np.array(
        sorted(range(n), key=lambda i: tuple(text[i:])), dtype=np.int64
    )


def test_sais_matches_naive(rng):
    for n in (2, 3, 10, 100, 1000):
        t = rng.integers(1, 5, size=n).astype(np.uint8)
        t[-1] = 0  # sentinel
        got = suffix_array(t)
        want = naive_suffix_array(t)
        np.testing.assert_array_equal(got, want)


def test_sais_matches_doubling(rng):
    t = rng.integers(1, 5, size=50000).astype(np.uint8)
    t[-1] = 0
    np.testing.assert_array_equal(suffix_array(t), _suffix_array_doubling(t))


def test_bwt_word_roundtrip(rng):
    codes = rng.integers(0, 4, size=1000).astype(np.uint8)
    np.testing.assert_array_equal(
        unpack_bwt_words(pack_bwt_words(codes), len(codes)), codes
    )


@pytest.fixture(scope="module")
def idx_and_text(small_index):
    idx, contigs = small_index
    fwd = np.concatenate([contigs["chrA"], contigs["chrB"]]).astype(np.uint8)
    text = np.concatenate([fwd, (3 - fwd[::-1]).astype(np.uint8)])
    return idx, text


def test_pac_roundtrip(idx_and_text):
    idx, text = idx_and_text
    np.testing.assert_array_equal(
        unpack_pac(idx.pac, 0, idx.l_pac), text[: idx.l_pac]
    )


def test_bwt_string(idx_and_text):
    """BWT string and primary row vs naive construction over T$."""
    idx, text = idx_and_text
    sa = suffix_array(np.concatenate([text + 1, np.zeros(1, np.uint8)]))
    want_primary = int(np.nonzero(sa == 0)[0][0])
    assert idx.primary == want_primary
    want_bwt = text[sa[sa > 0] - 1]
    got_bwt = unpack_bwt_words(idx.bwt_words, idx.seq_len)
    np.testing.assert_array_equal(got_bwt, want_bwt)


def test_occ_vs_naive(idx_and_text, rng):
    idx, text = idx_and_text
    bwt = unpack_bwt_words(idx.bwt_words, idx.seq_len)
    ks = np.concatenate(
        [
            np.array([-1, 0, 1, idx.primary - 1, idx.primary,
                      idx.primary + 1, idx.seq_len - 1, idx.seq_len]),
            rng.integers(0, idx.seq_len, size=300),
        ]
    ).astype(np.int64)
    for c in range(4):
        got = occ_np(
            idx.bwt_words, idx.occ_cp, idx.L2, idx.primary, idx.seq_len,
            ks, np.full_like(ks, c),
        )
        cum = np.concatenate([[0], np.cumsum(bwt == c)])
        # naive: count of c in $-removed prefix up to adjusted row k
        want = np.zeros_like(ks)
        for i, k in enumerate(ks):
            if k == -1:
                want[i] = 0
            elif k == idx.seq_len:
                want[i] = cum[-1]
            else:
                kk = k - (1 if k >= idx.primary else 0)
                want[i] = cum[kk + 1]
        np.testing.assert_array_equal(got, want)


def test_backward_search_count_vs_naive(idx_and_text, rng):
    """Full backward search count == naive occurrence count in fwd+rc text."""
    idx, text = idx_and_text
    text_bytes = bytes(text)
    for plen in (4, 8, 13):
        for _ in range(25):
            s = rng.integers(0, idx.seq_len - plen)
            pat = text[s : s + plen]
            k, l = np.array([0]), np.array([idx.seq_len])
            for c in pat[::-1]:
                k, l = backward_ext_np(
                    idx.bwt_words, idx.occ_cp, idx.L2, idx.primary,
                    idx.seq_len, k, l, np.array([int(c)]),
                )
                if k[0] > l[0]:
                    break
            got = max(0, int(l[0] - k[0] + 1)) if k[0] <= l[0] else 0
            # naive count of occurrences (overlapping) in text
            pb = bytes(pat)
            want = 0
            start = 0
            while True:
                j = text_bytes.find(pb, start)
                if j < 0:
                    break
                want += 1
                start = j + 1
            assert got == want, (s, plen)


def test_locate_vs_naive(idx_and_text, rng):
    """Backward search + sa_lookup recovers exactly the text positions."""
    idx, text = idx_and_text
    for _ in range(20):
        plen = int(rng.integers(10, 20))
        s = int(rng.integers(0, idx.seq_len - plen))
        pat = text[s : s + plen]
        k, l = np.array([0]), np.array([idx.seq_len])
        for c in pat[::-1]:
            k, l = backward_ext_np(
                idx.bwt_words, idx.occ_cp, idx.L2, idx.primary,
                idx.seq_len, k, l, np.array([int(c)]),
            )
        assert k[0] <= l[0]
        rows = np.arange(k[0], l[0] + 1)
        pos = sa_lookup_np(idx, rows)
        # naive: all positions where pat occurs
        tb, pb = bytes(text), bytes(pat)
        want = []
        st = 0
        while True:
            j = tb.find(pb, st)
            if j < 0:
                break
            want.append(j)
            st = j + 1
        assert sorted(pos.tolist()) == want


def test_bwt_b0(idx_and_text):
    idx, _ = idx_and_text
    bwt = unpack_bwt_words(idx.bwt_words, idx.seq_len)
    ks = np.arange(0, idx.seq_len, 997)
    np.testing.assert_array_equal(bwt_b0_np(idx.bwt_words, ks), bwt[ks])


def test_kmer_cache(idx_and_text, rng):
    """Cache intervals equal intervals from direct backward search."""
    idx, _ = idx_and_text
    k = idx.kcache_k
    for _ in range(50):
        kmer = rng.integers(0, 4, size=k)
        # cache idx encoding: processed right-to-left, leftmost char least
        # significant?  No: idx = sum_{i} c_{len-1-i} * 4^{k-1-i}; the
        # final (leftmost) char processed is least significant
        # (src/BWT.cpp:270-277: idx = idx*4 + c, i from len-1 down).
        ci = 0
        for c in kmer[::-1]:
            ci = ci * 4 + int(c)
        bk, bl = np.array([0]), np.array([idx.seq_len])
        for c in kmer[::-1]:
            bk, bl = backward_ext_np(
                idx.bwt_words, idx.occ_cp, idx.L2, idx.primary,
                idx.seq_len, bk, bl, np.array([int(c)]),
            )
        if bk[0] <= bl[0]:
            assert idx.kcache_beg[ci] == bk[0]
            assert idx.kcache_end[ci] == bl[0]
        else:
            assert idx.kcache_beg[ci] > idx.kcache_end[ci]


def test_save_load_roundtrip(small_index, tmp_path):
    idx, _ = small_index
    p = tmp_path / "idx.npz"
    save_index(idx, p)
    idx2 = load_index(p)
    assert idx2.l_pac == idx.l_pac
    assert idx2.primary == idx.primary
    assert idx2.contig_names == idx.contig_names
    np.testing.assert_array_equal(idx2.bwt_words, idx.bwt_words)
    np.testing.assert_array_equal(idx2.sa_samp, idx.sa_samp)
    np.testing.assert_array_equal(idx2.kcache_beg, idx.kcache_beg)


def _write_fa(tmp_path, rng, n=30011):
    codes = rng.integers(0, 4, size=n)
    p = tmp_path / "g.fa"
    seq = "".join("ACGT"[c] for c in codes)
    with open(p, "w") as f:
        f.write(">g\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i : i + 70] + "\n")
    return p


def test_densify_sa_matches_fresh_build(tmp_path, rng):
    """densify_sa(intv 32 -> 16/8) is bit-equal to building at the
    smaller interval from scratch (the walk-once-at-build-time argument
    in builder.densify_sa)."""
    from lordfast_tpu.config import LordfastConfig
    from lordfast_tpu.index.builder import densify_sa

    p = _write_fa(tmp_path, rng)
    cfg32 = LordfastConfig(kmer_cache_k=4, sa_interval=32)
    idx32 = build_index(p, cfg32, verbose=False)
    for new in (16, 8):
        fresh = build_index(
            p, cfg32.replace(sa_interval=new), verbose=False
        )
        dens = densify_sa(idx32, new, batch=1 << 12, verbose=False)
        assert dens.sa_intv == new
        np.testing.assert_array_equal(dens.sa_samp, fresh.sa_samp)
        # shared arrays untouched
        np.testing.assert_array_equal(dens.bwt_words, idx32.bwt_words)


def test_device_cache_roundtrip(tmp_path, rng):
    """save_device_cache + load_index(mmap=True) reproduce host_arrays
    and the host-query surface bit-for-bit."""
    from lordfast_tpu.config import LordfastConfig
    from lordfast_tpu.index.builder import save_device_cache

    p = _write_fa(tmp_path, rng)
    cfg = LordfastConfig(kmer_cache_k=4, sa_interval=32)
    idx = build_index(p, cfg, verbose=False)
    npz = tmp_path / "g.lft.npz"
    save_index(idx, npz)
    save_device_cache(idx, npz)
    m = load_index(npz, mmap=True)
    assert m._host_cache is not None  # actually took the mmap path
    want = idx.host_arrays()
    got = m.host_arrays()
    assert sorted(want) == sorted(got)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)
    assert m.meta == idx.meta
    assert m.contig_names == idx.contig_names
    b, ln = 123, 456
    assert m.get_ref_str(b, ln) == idx.get_ref_str(b, ln)
    assert m.chr_boundaries(10, 20) == idx.chr_boundaries(10, 20)


def test_contig_queries(small_index):
    idx, contigs = small_index
    assert idx.pos2rid(0) == 0
    assert idx.pos2rid(20010) == 0
    assert idx.pos2rid(20011) == 1
    name, ln, cb, ce = idx.intv_info(20020, 20030)
    assert name == "chrB" and ln == 9973 and cb == 9 and ce == 19
    lo, hi = idx.chr_boundaries(5, 10)
    assert (lo, hi) == (0, 20010)

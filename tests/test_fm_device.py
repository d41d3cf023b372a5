"""Device FM-index kernels vs host oracles.

The seeding oracle is a direct transliteration of the reference semantics
(getLocs_extend_whole_step, src/BWT.cpp:312-394) using naive text search,
so these tests pin the device kernels to the reference behavior without
touching reference code."""

import numpy as np
import pytest

import jax.numpy as jnp

from lordfast_tpu.config import LordfastConfig
from lordfast_tpu.index.fm_host import occ_np, sa_lookup_np
from lordfast_tpu.ops import fm_index as fmo
from lordfast_tpu.utils.pack import unpack_pac


@pytest.fixture(scope="module")
def dev(small_index):
    idx, contigs = small_index
    arrs = idx.device_arrays()
    fwd = unpack_pac(idx.pac, 0, idx.l_pac)
    text = np.concatenate([fwd, (3 - fwd[::-1]).astype(np.uint8)])
    return idx, arrs, idx.meta, text


def test_occ_device_matches_host(dev, rng):
    idx, arrs, meta, _ = dev
    ks = np.concatenate(
        [
            np.array([-1, 0, idx.primary - 1, idx.primary, idx.primary + 1,
                      idx.seq_len - 1, idx.seq_len]),
            rng.integers(0, idx.seq_len, 200),
        ]
    ).astype(np.int32)
    cs = rng.integers(0, 4, size=len(ks)).astype(np.int32)
    got = np.asarray(fmo.occ(arrs, meta, jnp.asarray(ks), jnp.asarray(cs)))
    want = occ_np(
        idx.bwt_words, idx.occ_cp, idx.L2, idx.primary, idx.seq_len,
        ks.astype(np.int64), cs.astype(np.int64),
    )
    np.testing.assert_array_equal(got, want)


def test_sa_lookup_device_matches_host(dev, rng):
    idx, arrs, meta, _ = dev
    rows = rng.integers(1, idx.seq_len + 1, size=257).astype(np.int32)
    got = np.asarray(
        fmo.sa_lookup(arrs, meta, jnp.asarray(rows), jnp.ones(len(rows), bool))
    )
    want = sa_lookup_np(idx, rows.astype(np.int64))
    np.testing.assert_array_equal(got, want)


# ---- seeding oracle: reference semantics with naive search ----

def _find_all(text: bytes, pat: bytes):
    out, st = [], 0
    while True:
        j = text.find(pat, st)
        if j < 0:
            return out
        out.append(j)
        st = j + 1


def oracle_seeds(text: bytes, l_pac: int, read: np.ndarray, cfg):
    """(fwd, rev) seed lists per getLocs_extend_whole_step semantics."""
    q_len = len(read)
    step = q_len / cfg.sampling_count
    seed_pos = 0.0
    last_pos = 0
    fwd, rev = [], []
    for _ in range(cfg.sampling_count):
        p = int(seed_pos)
        m = cfg.min_anchor_len
        window = read[p : p + m]
        if p + m <= q_len and np.all(window < 4):
            pat = bytes(window)
            hits = _find_all(text, pat)
            if hits:
                while (
                    p + m < q_len
                    and read[p + m] < 4
                    and m < fmo.MAX_ANCHOR_LEN
                ):
                    pat2 = bytes(read[p : p + m + 1])
                    h2 = _find_all(text, pat2)
                    if not h2:
                        break
                    hits, pat, m = h2, pat2, m + 1
                if len(hits) < cfg.max_ref_hits and p + m > last_pos:
                    for x in hits:
                        if x >= l_pac:
                            rev.append((2 * l_pac - x - m, q_len - p - m, m))
                        else:
                            fwd.append((x, p, m))
                    last_pos = p + m
        seed_pos += step
    return fwd, rev


def _mutate(rng, codes, sub=0.05, ind=0.05):
    """Apply PacBio-ish noise to a code sequence."""
    out = []
    for c in codes:
        r = rng.random()
        if r < sub:
            out.append((c + rng.integers(1, 4)) % 4)
        elif r < sub + ind / 2:
            continue  # deletion
        elif r < sub + ind:
            out.append(c)
            out.append(rng.integers(0, 4))  # insertion
        else:
            out.append(c)
    return np.array(out, dtype=np.uint8)


@pytest.mark.parametrize("sampling_count", [50, 171])
def test_seed_anchors_matches_oracle(dev, rng, sampling_count):
    idx, arrs, meta, text = dev
    cfg = LordfastConfig(
        sampling_count=sampling_count,
        min_anchor_len=12,
        max_seeds_per_read=2048,
    )
    text_b = bytes(text)

    B, L = 4, 1200
    reads = np.full((B, L), 4, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for b in range(B):
        start = int(rng.integers(0, idx.l_pac - 1100))
        frag = text[start : start + 1100].copy()
        if b % 2 == 1:
            frag = (3 - frag[::-1]).astype(np.uint8)  # reverse strand read
        frag = _mutate(rng, frag)[:L]
        reads[b, : len(frag)] = frag
        lens[b] = len(frag)

    sb = fmo.seed_anchors(arrs, meta, reads, lens, cfg)
    t_pos = np.asarray(sb.t_pos)
    q_pos = np.asarray(sb.q_pos)
    length = np.asarray(sb.length)
    is_rev = np.asarray(sb.is_rev)
    valid = np.asarray(sb.valid)

    for b in range(B):
        fwd_w, rev_w = oracle_seeds(text_b, idx.l_pac, reads[b, : lens[b]], cfg)
        got_f = sorted(
            (int(t_pos[b, i]), int(q_pos[b, i]), int(length[b, i]))
            for i in range(valid[b].sum())
            if not is_rev[b, i]
        )
        got_r = sorted(
            (int(t_pos[b, i]), int(q_pos[b, i]), int(length[b, i]))
            for i in range(valid[b].sum())
            if is_rev[b, i]
        )
        assert got_f == sorted(fwd_w), f"read {b} forward seeds differ"
        assert got_r == sorted(rev_w), f"read {b} reverse seeds differ"
        assert int(sb.n_total[b]) == len(fwd_w) + len(rev_w)


def test_sa_lookup_phased_compaction(rng):
    """The phased/compacted locate walk (lanes >= 2^16, sa_intv >= 8)
    must return exactly the plain lockstep walk's positions."""
    import tempfile

    import jax.numpy as jnp

    from lordfast_tpu.config import LordfastConfig
    from lordfast_tpu.index.builder import build_index
    from lordfast_tpu.ops import fm_index as fm_ops

    r = np.random.default_rng(31)
    codes = r.integers(0, 4, 30000)
    seq = "".join("ACGT"[c] for c in codes)
    with tempfile.NamedTemporaryFile("w", suffix=".fa",
                                     delete=False) as f:
        f.write(">c\n" + seq + "\n")
        path = f.name
    idx = build_index(path, LordfastConfig(kmer_cache_k=6,
                                           sa_interval=32),
                      verbose=False)
    assert idx.sa_intv == 32
    arrs = idx.device_arrays()
    meta = idx.meta
    n = 1 << 16
    rows = jnp.asarray(
        r.integers(0, idx.seq_len + 1, n), dtype=idx.pos_dtype
    )
    valid = jnp.asarray(r.random(n) < 0.4)
    got = fm_ops.sa_lookup(arrs, meta, rows, valid)          # phased
    want = fm_ops.sa_lookup(arrs, meta, rows[None], valid[None])[0]  # 2D=plain
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

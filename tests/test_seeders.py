"""Dormant seeder variants (ops/seeders.py) vs naive oracles that
re-implement the reference semantics literally (src/BWT.cpp:423-591),
plus an end-to-end smoke run through the engine."""

import io

import numpy as np
import pytest

from lordfast_tpu.config import LordfastConfig
from lordfast_tpu.ops.seeders import seeds_step2, seeds_step3


def naive_occurrences(text, pat):
    """All occurrence positions, via C-speed bytes.find."""
    tb = text.tobytes() if isinstance(text, np.ndarray) else text
    pb = pat.tobytes() if isinstance(pat, np.ndarray) else pat
    out = []
    i = tb.find(pb)
    while i >= 0:
        out.append(i)
        i = tb.find(pb, i + 1)
    return out


def _mirror_text(contigs):
    fwd = np.concatenate([c.astype(np.uint8)
                          for c in contigs.values()])
    return np.concatenate([fwd, 3 - fwd[::-1]]), len(fwd)


def oracle_step2(text, l_pac, codes, cfg):
    """Literal transcription of getLocs_extend_whole_step2 on a naive
    text search."""
    q_len = len(codes)
    step = q_len / cfg.sampling_count
    e_frac = float(q_len - 1)
    e_pos = q_len - 1
    last_pos = q_len
    fwd, rev = [], []
    while e_pos >= cfg.min_anchor_len - 1:
        # maximal leftward extension of the pattern ending at e_pos
        s = e_pos + 1
        occs = None
        while s > 0:
            cand = naive_occurrences(text, codes[s - 1 : e_pos + 1])
            if not cand:
                break
            occs = cand
            s -= 1
        m = e_pos - s + 1
        if m < cfg.min_anchor_len:
            occs = None
        if occs and len(occs) < cfg.max_ref_hits and s < last_pos:
            for p in occs:
                if p >= l_pac:
                    rev.append((2 * l_pac - p - m, q_len - s - m, m))
                else:
                    fwd.append((p, s, m))
            last_pos = s
        e_frac -= step
        e_pos = int(e_frac)
    return fwd, rev


def oracle_step3(text, l_pac, codes, cfg):
    """Literal transcription of getLocs_extend_whole_step3."""
    q_len = len(codes)
    best = {}
    for i in range(q_len):
        # longest match starting at i
        m = 0
        occs = None
        for e in range(i + cfg.min_anchor_len - 1, q_len):
            cand = naive_occurrences(text, codes[i : e + 1])
            if not cand:
                break
            occs = cand
            m = e - i + 1
        # shorter-than-min matches also recorded by the reference
        if occs is None:
            for e in range(i, min(i + cfg.min_anchor_len - 1, q_len)):
                cand = naive_occurrences(text, codes[i : e + 1])
                if not cand:
                    break
                occs = cand
                m = e - i + 1
        if occs:
            best[i] = (occs, m)
    step = q_len / cfg.sampling_count
    seed_pos = 0.0
    sp = 0
    last_pos = 0
    fwd, rev = [], []
    for _ in range(cfg.sampling_count):
        if sp in best:
            occs, m = best[sp]
            if (m >= cfg.min_anchor_len and len(occs) < cfg.max_ref_hits
                    and sp + m > last_pos):
                for p in sorted(occs):
                    if p >= l_pac:
                        rev.append((2 * l_pac - p - m, q_len - sp - m, m))
                    else:
                        fwd.append((p, sp, m))
                last_pos = sp + m
        seed_pos += step
        sp = min(int(seed_pos), q_len - 1)
    return fwd, rev


@pytest.mark.parametrize("variant", ["2", "3"])
def test_dormant_seeders_vs_oracle(small_index, rng, variant):
    idx, contigs = small_index
    text, l_pac = _mirror_text(contigs)
    cfg = LordfastConfig(sampling_count=40, max_ref_hits=50)
    for trial in range(4):
        ln = int(rng.integers(60, 220))
        st = int(rng.integers(0, l_pac - ln))
        codes = text[st : st + ln].copy()
        sites = rng.integers(0, ln, max(1, ln // 15))
        codes[sites] = rng.integers(0, 4, len(sites))
        if variant == "2":
            got = seeds_step2(idx, codes, cfg)
            want = oracle_step2(text, l_pac, codes, cfg)
        else:
            got = seeds_step3(idx, codes, cfg)
            want = oracle_step3(text, l_pac, codes, cfg)
        got = (sorted(got[0]), sorted(got[1]))
        want = (sorted(want[0]), sorted(want[1]))
        assert got == want, f"variant {variant} trial {trial}"


def test_engine_with_dormant_seeder():
    """End-to-end smoke: the engine maps the fixture through the
    extend-whole-2 seeder + the jitted post-seeding pipeline."""
    from pathlib import Path

    from lordfast_tpu.index.builder import build_index
    from lordfast_tpu.pipeline.engine import MappingEngine

    data = Path(__file__).parent / "data"
    cfg = LordfastConfig(kmer_cache_k=8, seeder="extend-whole-2",
                         max_seeds_per_read=1024, max_chain_seeds=128,
                         max_candidates=16, batch_reads=8,
                         sampling_count=100)
    idx = build_index(data / "ref.fa", cfg, verbose=False)
    eng = MappingEngine(idx, cfg)
    out = io.StringIO()
    eng.map_file(data / "reads.fq", out, "seeder2")
    recs = [l for l in out.getvalue().splitlines() if not l.startswith("@")]
    assert len(recs) >= 60  # one record per read at least
    mapped = sum(1 for l in recs if not int(l.split("\t")[1]) & 4)
    assert mapped >= 50  # the dormant seeder still maps the fixture

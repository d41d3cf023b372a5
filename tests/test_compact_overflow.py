"""Compact-window overflow escalation: a repeat-dense read whose
qualifying windows exceed the shared chaining-slot budget must escalate
through the 8x retry to the solo 512-window pipeline and still produce
the reference's SAM — never be emitted unmapped (VERDICT r2 weak #5 /
r3 weak #5; the reference chains every qualifying local max,
src/LordFAST.cpp:874-904)."""

import io
import subprocess
from pathlib import Path

import numpy as np
import pytest

from lordfast_tpu.config import LordfastConfig
from lordfast_tpu.index.builder import build_index
from lordfast_tpu.index.bwa_io import save_bwa_index
from lordfast_tpu.pipeline.engine import MappingEngine

REF_BIN = Path(__file__).parent.parent / ".refbuild" / "lordfast"

# tiny budgets so the ~55 qualifying windows saturate the candidate cap
# at level 0 (C=4) AND at the 8x retry (C=16) but fit the solo pipeline
# (C=512)
CFG = dict(
    kmer_cache_k=8,
    batch_reads=8,
    compact_windows_per_read=2,
    max_candidates=4,
    max_seeds_per_read=2048,
    max_chain_seeds=128,
)


@pytest.fixture(scope="module")
def repeat_case(tmp_path_factory):
    d = tmp_path_factory.mktemp("overflow")
    rng = np.random.default_rng(77)
    n_copies = 150
    block = rng.integers(0, 4, 1500)
    parts = [rng.integers(0, 4, 5000)]
    for _ in range(n_copies):
        # near-identical copies (~1% divergence): the read's vote counts
        # are close across every copy, so best < 4*second -> fine mode
        # with ~n_copies qualifying windows (> minScore = best/4)
        mut = block.copy()
        sites = rng.integers(0, len(mut), int(0.01 * len(mut)))
        mut[sites] = rng.integers(0, 4, len(sites))
        parts.append(mut)
        parts.append(rng.integers(0, 4, 300))  # spacer
    parts.append(rng.integers(0, 4, 5000))
    genome = np.concatenate(parts)
    seq = "".join("ACGT"[c] for c in genome)
    fa = d / "rep.fa"
    with open(fa, "w") as f:
        f.write(">repchr\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i : i + 70] + "\n")
    # a noisy read covering one interior copy (plus flanks into spacers)
    src = 5000 + 70 * (1500 + 300) + 100
    frag = genome[src : src + 1400]
    read = []
    for c in frag:
        r = rng.random()
        if r < 0.05:
            read.append(int(rng.integers(0, 4)))
        elif r < 0.10:
            read.append(int(c))
            read.append(int(rng.integers(0, 4)))
        elif r < 0.13:
            continue
        else:
            read.append(int(c))
    rd = "".join("ACGT"[c] for c in read)
    fq = d / "read.fq"
    fq.write_text(f"@rep0\n{rd}\n+\n{'I' * len(rd)}\n")
    return fa, fq


def test_overflow_escalates_to_solo(repeat_case):
    fa, fq = repeat_case
    cfg = LordfastConfig(**CFG)
    idx = build_index(fa, cfg, verbose=False)
    eng = MappingEngine(idx, cfg)
    out = io.StringIO()
    eng.map_file(fq, out, "overflow-test")
    recs = [l for l in out.getvalue().splitlines() if not l.startswith("@")]
    # the read must be mapped (flag 4 would mean the overflow gave up)
    assert recs and int(recs[0].split("\t")[1]) & 4 == 0
    assert eng.stats.get("compact_overflow", 0) == 0
    # the escalation chain actually fired
    assert eng.metrics.counters.get("compact_retry", 0) >= 1
    assert eng.metrics.counters.get("compact_solo", 0) >= 1
    return idx, out


@pytest.mark.skipif(not REF_BIN.exists(),
                    reason="reference binary not built")
def test_overflow_read_matches_reference(repeat_case, tmp_path):
    fa, fq = repeat_case
    cfg = LordfastConfig(**CFG)
    idx = build_index(fa, cfg, verbose=False)
    # export our (k=8-cache) index so the reference maps the same files
    import shutil

    ref_fa = tmp_path / "rep.fa"
    shutil.copy(fa, ref_fa)
    save_bwa_index(idx, ref_fa)
    r = subprocess.run(
        [str(REF_BIN), "--search", str(ref_fa), "--seq", str(fq),
         "-t", "1", "-o", str(tmp_path / "ref.sam")],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    golden = [l for l in open(tmp_path / "ref.sam")
              if not l.startswith("@")]

    eng = MappingEngine(idx, cfg)
    out = io.StringIO()
    eng.map_file(fq, out, "overflow-test")
    ours = [l + "\n" for l in out.getvalue().splitlines()
            if not l.startswith("@")]
    assert ours == golden
    assert eng.stats.get("compact_overflow", 0) == 0

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


def _make_repeat_case(d, rng, n_copies, div=0.01, noise=(0.05, 0.05,
                                                         0.03)):
    block = rng.integers(0, 4, 1500)
    parts = [rng.integers(0, 4, 5000)]
    for _ in range(n_copies):
        # near-identical copies (~1% divergence): the read's vote counts
        # are close across every copy, so best < 4*second -> fine mode
        # with ~n_copies qualifying windows (> minScore = best/4)
        mut = block.copy()
        if div > 0:
            sites = rng.integers(0, len(mut),
                                 max(1, int(div * len(mut))))
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
    # a noisy read covering one interior copy; with noise=(0,0,0) it
    # stays strictly INSIDE the repeat block, so every anchor's maximal
    # extension is capped by the read end while still inside the block
    # and its occ stays = n_copies (extension past a copy boundary into
    # a unique spacer would collapse occ to 1)
    src = 5000 + 70 * (1500 + 300) + 100
    frag = genome[src : src + (1400 if any(noise) else 1300)]
    s_sub, s_ins, s_del = noise
    read = []
    for c in frag:
        r = rng.random()
        if r < s_sub:
            read.append(int(rng.integers(0, 4)))
        elif r < s_sub + s_ins:
            read.append(int(c))
            read.append(int(rng.integers(0, 4)))
        elif r < s_sub + s_ins + s_del:
            continue
        else:
            read.append(int(c))
    if not any(noise):
        # exactly one substitution mid-read: two ~650 bp anchors per
        # window (chainLen 2 — the reference aligns only chainLen > 1
        # windows, src/LordFAST.cpp:1063) while occ stays = n_copies
        m = len(read) // 2
        read[m] = (read[m] + 1) % 4
    rd = "".join("ACGT"[c] for c in read)
    fq = d / "read.fq"
    fq.write_text(f"@rep0\n{rd}\n+\n{'I' * len(rd)}\n")
    return fa, fq


@pytest.fixture(scope="module")
def repeat_case(tmp_path_factory):
    d = tmp_path_factory.mktemp("overflow")
    return _make_repeat_case(d, np.random.default_rng(77), 150)


@pytest.fixture(scope="module")
def repeat_case_700(tmp_path_factory):
    """700 near-identical copies: >512 qualifying windows, so even the
    solo 512-window pipeline saturates and the engine must PAGE through
    further candidate ranks (engine window paging, VERDICT r4 #6)."""
    d = tmp_path_factory.mktemp("overflow700")
    # EXACT copies + noiseless read inside the block: every anchor has
    # occ = n_copies (maximal extension is capped by the read end, not
    # a unique spacer) and vote counts are uniform across every copy
    # window.  Equal adjacent windows fail the strict right-neighbor
    # local-max check, so ~38% of copies survive as qualifying windows:
    # 1600 copies -> ~610 > 512, forcing the paging escalation — and an
    # aggressive equal-score tie-order test against the reference.
    return _make_repeat_case(d, np.random.default_rng(78), 1600,
                             div=0.0, noise=(0.0, 0.0, 0.0))


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


# paging tests: seed slots for every copy occurrence, and a raised
# max_ref_hits (the -m CLI knob; must match the reference's invocation)
# so a 1600-occurrence anchor is not discarded
CFG700 = dict(CFG, max_seeds_per_read=8192, max_ref_hits=8000)


def test_window_paging_beyond_512(repeat_case_700):
    """>512 qualifying windows: the solo pipeline saturates, the paging
    loop fires (compact_page >= 1), and the read maps with no overflow
    give-up — compact_overflow can only occur past the 64-page cap."""
    fa, fq = repeat_case_700
    cfg = LordfastConfig(**CFG700)
    idx = build_index(fa, cfg, verbose=False)
    eng = MappingEngine(idx, cfg)
    out = io.StringIO()
    eng.map_file(fq, out, "paging-test")
    recs = [l for l in out.getvalue().splitlines()
            if not l.startswith("@")]
    assert recs and int(recs[0].split("\t")[1]) & 4 == 0
    assert eng.metrics.counters.get("compact_solo", 0) >= 1
    assert eng.metrics.counters.get("compact_page", 0) >= 1
    assert eng.stats.get("compact_overflow", 0) == 0


@pytest.mark.skipif(not REF_BIN.exists(),
                    reason="reference binary not built")
def test_window_paging_matches_reference(repeat_case_700, tmp_path):
    """The paged selection picks the reference's exact top-10 WINDOWS on
    the 1600-copy case (the reference chains every qualifying window
    with no budget at all, src/LordFAST.cpp:874-904) with identical
    flags/MAPQ/CIGAR/NM.

    POS is compared per window, not byte-for-byte: within a window
    covering two EXACT repeat copies the chain DP has two identical-
    score chains, and the reference breaks that tie by its seed-list
    enumeration order — ascending SA rank of the forward pattern's
    interval (src/BWT.cpp:348), i.e. the lexicographic order of the
    genome context FOLLOWING each copy, which can be decided arbitrarily
    far away.  Our mirror-space search enumerates the revcomp interval
    (preceding context), so on exact-tie repeats the chosen copy can
    legitimately differ by one repeat period while every score is
    equal.  (For >= 16 window seeds the reference's own order is
    std::sort implementation-defined.)  README "Known divergences"."""
    fa, fq = repeat_case_700
    cfg = LordfastConfig(**CFG700)
    idx = build_index(fa, cfg, verbose=False)
    import shutil

    ref_fa = tmp_path / "rep.fa"
    shutil.copy(fa, ref_fa)
    save_bwa_index(idx, ref_fa)
    r = subprocess.run(
        [str(REF_BIN), "--search", str(ref_fa), "--seq", str(fq),
         "-t", "1", "-m", "8000", "-o", str(tmp_path / "ref.sam")],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    golden = [l for l in open(tmp_path / "ref.sam")
              if not l.startswith("@")]
    eng = MappingEngine(idx, cfg)
    out = io.StringIO()
    eng.map_file(fq, out, "paging-test")
    ours = [l + "\n" for l in out.getvalue().splitlines()
            if not l.startswith("@")]
    assert len(ours) == len(golden)
    read_len = 1300  # noiseless one-sub read inside the block
    for a, b in zip(ours, golden):
        fa_, fb = a.split("\t"), b.split("\t")
        # flags, MAPQ, CIGAR identical; POS in the SAME window (the
        # copy choice within a window is the score-tied class above)
        assert fa_[1] == fb[1] and fa_[4] == fb[4] and fa_[5] == fb[5]
        wa = (int(fa_[3]) - 1) // read_len
        wb = (int(fb[3]) - 1) // read_len
        assert abs(wa - wb) <= 1 and (int(fa_[3]) - int(fb[3])) % 1800 \
            == 0, (fa_[3], fb[3])
    # the primary record (first scanned window, no in-window tie room
    # for it in this construction) is byte-identical
    assert ours[0] == golden[0]
    assert eng.stats.get("compact_overflow", 0) == 0


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

#!/usr/bin/env python
"""End-to-end mapping benchmark.

Prints ONE JSON line:
  {"metric": "reads_per_sec", "value": N, "unit": "reads/s/chip",
   "vs_baseline": R}

Dataset: deterministic synthetic 28 Mb genome + 512 simulated PacBio-CLR
reads (2-20 kb, ~12% error), generated into .bench_cache_big/ on first
run.  Baseline: the reference lordfast binary compiled from
/root/reference and measured on THIS machine and THIS dataset
(single-thread, warm, best of 3: 512 reads / 2.74 s mapping = 186.9
reads/s; 2 threads — every core of this host — 358 reads/s).  When the
binary is present at .refbuild/lordfast the baseline is re-measured live;
otherwise the recorded constant is used.

The benchmark warms up one pass (XLA compile + host caches), then times a
second full mapping pass.  stderr also reports the device/gap-DP/stitch
time split and a DP-extend cell-updates/s microbench of the batched Myers
kernel (BASELINE.md north-star metric).
"""

import io
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

REF_READS_PER_SEC = 186.9  # reference lordfast, 1 thread, this dataset
CACHE_DIR = Path(__file__).parent / ".bench_cache_big"
REF_BIN = Path(__file__).parent / ".refbuild" / "lordfast"
GENOME_BP = 28_000_000
N_READS = 512
SEED = 1234


def gen_dataset(dirpath: Path):
    rng = np.random.default_rng(SEED)
    codes = rng.integers(0, 4, GENOME_BP)
    seq = "".join("ACGT"[c] for c in codes)
    with open(dirpath / "bench_ref.fa", "w") as f:
        f.write(">benchchr\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i : i + 70] + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    with open(dirpath / "bench_reads.fq", "w") as f:
        for i in range(N_READS):
            ln = int(rng.integers(2000, 20000))
            st = int(rng.integers(0, GENOME_BP - ln))
            frag = seq[st : st + ln]
            if rng.random() < 0.5:
                frag = frag.translate(comp)[::-1]
            out = []
            for ch in frag:
                r = rng.random()
                if r < 0.04:
                    out.append("ACGT"[rng.integers(0, 4)])
                elif r < 0.09:
                    out.append(ch)
                    out.append("ACGT"[rng.integers(0, 4)])
                elif r < 0.12:
                    continue
                else:
                    out.append(ch)
            read = "".join(out)
            f.write(f"@b{i}\n{read}\n+\n{'I' * len(read)}\n")


def measure_reference(ref_fa: Path, reads_fq: Path) -> float | None:
    """Re-measure the reference binary on this dataset (1 thread, warm,
    best of 3 of its self-reported mapping time)."""
    if not REF_BIN.exists():
        return None
    try:
        best = None
        for _ in range(3):
            p = subprocess.run(
                [str(REF_BIN), "--search", str(ref_fa), "--seq",
                 str(reads_fq), "-t", "1", "-o", "/dev/null"],
                capture_output=True, text=True, timeout=600,
            )
            m = re.search(r"mapping\.\.\. done in ([0-9.]+) seconds",
                          p.stderr)
            if m:
                t = float(m.group(1))
                best = t if best is None else min(best, t)
        return N_READS / best if best else None
    except Exception:
        return None


def dp_microbench():
    """DP-extend cell-updates/s of the batched Myers kernel (north star)."""
    import jax

    from lordfast_tpu.ops import gap_dp

    Q, T, G = 512, 576, 256
    rng = np.random.default_rng(7)
    qs = rng.integers(0, 4, (G, Q)).astype(np.uint8)
    ts = rng.integers(0, 4, (G, T)).astype(np.uint8)
    ql = np.full(G, Q, np.int32)
    tl = np.full(G, T, np.int32)
    shw = np.zeros(G, bool)
    r = gap_dp.gap_align(qs, ql, ts, tl, shw, Q, T)  # compile + warm
    jax.block_until_ready(r.dist)
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        r = gap_dp.gap_align(qs, ql, ts, tl, shw, Q, T)
    jax.block_until_ready(r.dist)
    dt = (time.time() - t0) / reps
    cells = G * Q * T
    return cells / dt


def main():
    from lordfast_tpu.config import LordfastConfig
    from lordfast_tpu.index.builder import (build_index, load_index,
                                            save_index)
    from lordfast_tpu.pipeline.engine import MappingEngine

    CACHE_DIR.mkdir(exist_ok=True)
    ref = CACHE_DIR / "bench_ref.fa"
    reads = CACHE_DIR / "bench_reads.fq"
    if not ref.exists() or not reads.exists():
        print("[bench] generating dataset...", file=sys.stderr)
        gen_dataset(CACHE_DIR)

    cfg = LordfastConfig()
    idx_path = CACHE_DIR / "bench_index_k12.npz"
    if idx_path.exists():
        idx = load_index(idx_path)
    else:
        print("[bench] building index...", file=sys.stderr)
        idx = build_index(ref, cfg, verbose=True)
        save_index(idx, idx_path)

    baseline = measure_reference(ref, reads)
    if baseline is None:
        baseline = REF_READS_PER_SEC
        src = "recorded constant"
    else:
        src = "re-measured"
    print(f"[bench] baseline {baseline:.1f} reads/s ({src}, 1 thread)",
          file=sys.stderr)

    engine = MappingEngine(idx, cfg)

    t0 = time.time()
    engine.map_file(reads, io.StringIO(), "bench-warmup")
    warm = time.time() - t0

    t0 = time.time()
    out = io.StringIO()
    engine.map_file(reads, out, "bench")
    dt = time.time() - t0

    n_lines = sum(
        1 for l in out.getvalue().splitlines() if not l.startswith("@")
    )
    n_reads = engine.stats["reads"] // 2  # two passes
    rps = n_reads / dt
    t = engine.metrics.timers
    print(
        f"[bench] warmup {warm:.1f}s; timed {dt:.2f}s for {n_reads} reads "
        f"({n_lines} SAM records) -> {rps:.1f} reads/s | "
        f"device {t.get('device', 0):.2f}s gap_dp {t.get('gap_dp', 0):.2f}s "
        f"stitch {t.get('stitch', 0):.2f}s emit {t.get('emit', 0):.2f}s",
        file=sys.stderr,
    )
    try:
        cups = dp_microbench()
        print(f"[bench] Myers DP microbench: {cups/1e9:.2f} Gcell/s",
              file=sys.stderr)
    except Exception as e:  # microbench is informational only
        print(f"[bench] DP microbench failed: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "reads_per_sec",
                "value": round(rps, 2),
                "unit": "reads/s/chip",
                "vs_baseline": round(rps / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

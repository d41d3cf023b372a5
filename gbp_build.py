"""Generate the Gbp-scale benchmark artifacts bench.py consumes:
a 3.1 Gbp random genome (fixed seed), its index at sa_interval=16
(halves the expected locate walk vs bwa's 32 — the stage that dominates
Gbp seeding), the device-layout mmap sidecar, and the simulated CLR
read set.  One-shot, resumable (skips any artifact already present in
.bench_cache_big/); ~70 min and ~120 GB peak RSS for the suffix sort
on a 2-core host."""
import sys, time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from lordfast_tpu.config import LordfastConfig
from lordfast_tpu.index.builder import (
    build_index, load_index, save_device_cache, save_index,
)

CACHE = Path(__file__).parent / ".bench_cache_big"
CACHE.mkdir(exist_ok=True)
FA = CACHE / "grch_ref.fa"
NPZ = CACHE / "grch_ref.fa.lft.npz"
GBP = 3_100_000_000
SEED = 31

if not FA.exists():
    t0 = time.time()
    rng = np.random.default_rng(SEED)
    lut = np.frombuffer(b"ACGT", np.uint8)
    with open(FA, "wb") as f:
        f.write(b">gchr1\n")
        # stream in 64 Mb slabs, wrapped at 70 cols
        W, SLAB = 70, 70 * 1_000_000
        left = GBP
        while left > 0:
            n = min(SLAB, left)
            n -= n % W if left > SLAB else 0
            codes = rng.integers(0, 4, n, dtype=np.uint8)
            ascii_ = lut[codes]
            if n % W == 0:
                block = np.empty((n // W, W + 1), np.uint8)
                block[:, :W] = ascii_.reshape(-1, W)
                block[:, W] = ord("\n")
                f.write(block.tobytes())
            else:
                for i in range(0, n, W):
                    f.write(ascii_[i : i + W].tobytes() + b"\n")
            left -= n
    print(f"[gbp] FASTA written in {time.time()-t0:.0f}s", flush=True)

if not NPZ.exists():
    cfg = LordfastConfig(sa_interval=16)
    idx = build_index(FA, cfg, verbose=True)
    save_index(idx, NPZ)
    print("[gbp] index saved", flush=True)
    save_device_cache(idx, NPZ)
    print("[gbp] device cache saved", flush=True)
else:
    idx = load_index(NPZ, mmap=True)

reads = CACHE / "gbp_reads.fq"
if not reads.exists():
    import bench

    bench.gen_gbp_reads(idx, reads)
    print("[gbp] reads simulated", flush=True)
print("[gbp] ALL DONE", flush=True)

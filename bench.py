#!/usr/bin/env python
"""End-to-end mapping benchmark.

Headline JSON line (last line of stdout):
  {"metric": "reads_per_sec", "value": N, "unit": "reads/s/chip",
   "vs_baseline": R}
measured on the v2 dataset: a deterministic synthetic 28 Mb genome with
implanted repeat families + 560 reads (512 PacBio-CLR-like 2-20 kb at
~12% error, 40 SV/clip reads exercising the split/inversion/clip
escalations, 8 unmappable), generated into .bench_cache_big/ on first
run.  The baseline is the reference lordfast binary compiled from
/root/reference, SAME machine, SAME dataset, single thread, warm, best
of 3, divided by the same 560-read count the engine is measured on; it
is re-measured live whenever .refbuild/lordfast exists, else the
recorded constant is used.  stderr additionally reports the v1 ratio
(512 plain CLR reads, no repeats/SV — the r01/r02 regime where the
reference is fastest at ~230 reads/s; its v2 collapse is caused by the
48 SV/clip/garbage reads, ~0.5 reads/s in its escalation paths, not by
the repeats) and, when a Gbp-scale index
(.bench_cache_big/grch_ref.fa.lft.npz) is present, a Gbp-scale mapping
JSON line is printed before the headline line.

Each timed figure is a second full mapping pass after one warmup pass
(XLA compile + host caches).  stderr also reports the
device/gap-DP/stitch time split and a DP-extend cell-updates/s
microbench of the batched Myers kernel (BASELINE.md north-star metric).
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

# reference lordfast on THIS dataset (v2: repeats + SV reads), 1 thread,
# 560 reads / ~76 s mapping; re-measured live whenever .refbuild/lordfast
# exists (fallback constant matches the judge's r3 re-measurement)
REF_READS_PER_SEC = 7.4
CACHE_DIR = Path(__file__).parent / ".bench_cache_big"
REF_BIN = Path(__file__).parent / ".refbuild" / "lordfast"
GENOME_BP = 28_000_000
N_READS = 512
N_SV = 40        # structured-variant reads appended (splits/inversions/clips)
N_GARBAGE = 8    # unmappable reads
N_TOTAL = N_READS + N_SV + N_GARBAGE  # what both engine and baseline divide by
SEED = 1234
DATASET_TAG = "v2"  # bump when generation changes (invalidate caches)


def _noise(rng, frag: str) -> str:
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
    return "".join(out)


def gen_dataset(dirpath: Path, easy: bool = False):
    """28 Mb genome with implanted repeat families (fine-mode pressure) +
    512 CLR-like reads + SV/clip/garbage reads exercising the split /
    inversion / clip escalations (reference src/LordFAST.cpp:1952,2040,
    1848) — so the timed run covers the whole pipeline, not just the
    coarse single-candidate path (VERDICT r2 weak #3).

    easy=True: the v1 variant — NO implanted repeats and ONLY the 512
    plain CLR reads (no SV/clip/garbage reads).  This reproduces the
    r01/r02 dataset, the regime where the reference is FASTEST (~230
    reads/s here): measured per-class, the reference maps the 512 plain
    v1 reads in 2.2 s but spends 100 s on the 48 SV/clip/garbage reads
    alone (~0.5 reads/s) — the escalation reads, not the repeats, are
    what collapses it on v2.  Files get a v1_ prefix."""
    rng = np.random.default_rng(SEED)
    codes = rng.integers(0, 4, GENOME_BP)
    # repeat families: 120 source blocks of 2 kb, each copied to 2-4 more
    # loci at ~92% identity -> ~1 Mb of repetitive sequence that splits
    # window votes and drives reads into fine mode
    if not easy:
        for _ in range(120):
            src = int(rng.integers(0, GENOME_BP - 2000))
            block = codes[src : src + 2000].copy()
            for _ in range(int(rng.integers(2, 5))):
                mut = block.copy()
                nmut = int(0.08 * len(mut))
                sites = rng.integers(0, len(mut), nmut)
                mut[sites] = rng.integers(0, 4, nmut)
                dst = int(rng.integers(0, GENOME_BP - 2000))
                codes[dst : dst + 2000] = mut
    pre = "v1_" if easy else ""
    seq = "".join("ACGT"[c] for c in codes)
    with open(dirpath / f"{pre}bench_ref.fa", "w") as f:
        f.write(">benchchr\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i : i + 70] + "\n")
    comp = str.maketrans("ACGT", "TGCA")

    def rand_seq(n):
        return "".join("ACGT"[c] for c in rng.integers(0, 4, n))

    with open(dirpath / f"{pre}bench_reads.fq", "w") as f:
        for i in range(N_READS):
            ln = int(rng.integers(2000, 20000))
            st = int(rng.integers(0, GENOME_BP - ln))
            frag = seq[st : st + ln]
            if rng.random() < 0.5:
                frag = frag.translate(comp)[::-1]
            read = _noise(rng, frag)
            f.write(f"@b{i}\n{read}\n+\n{'I' * len(read)}\n")
        if easy:
            return
        # structured reads: deletion / jump (split), inversion, clips
        for i in range(N_SV):
            kind = i % 5
            a = int(rng.integers(0, GENOME_BP - 40000))
            if kind == 0:      # ~2.5 kb deletion -> split
                frag = seq[a : a + 2000] + seq[a + 4500 : a + 6500]
            elif kind == 1:    # long intra-genome jump -> split
                b = int(rng.integers(0, GENOME_BP - 3000))
                frag = seq[a : a + 2000] + seq[b : b + 2000]
            elif kind == 2:    # inverted middle segment -> inversion branch
                frag = (seq[a : a + 1500]
                        + seq[a + 1500 : a + 3000].translate(comp)[::-1]
                        + seq[a + 3450 : a + 4950])
                f.write(f"@sv{i}\n{frag}\n+\n{'I' * len(frag)}\n")
                continue       # noiseless (inversion branch needs sim_r)
            elif kind == 3:    # >500 bp junk left end -> clip escalation
                frag = rand_seq(800) + seq[a : a + 2500]
            else:              # junk right end
                frag = seq[a : a + 2500] + rand_seq(800)
            read = _noise(rng, frag)
            f.write(f"@sv{i}\n{read}\n+\n{'I' * len(read)}\n")
        for i in range(N_GARBAGE):
            r = rand_seq(int(rng.integers(1200, 2500)))
            f.write(f"@junk{i}\n{r}\n+\n{'I' * len(r)}\n")
    (dirpath / "DATASET_TAG").write_text(DATASET_TAG)


def measure_reference(ref_fa: Path, reads_fq: Path,
                      n_reads: int = N_TOTAL, runs: int = 3,
                      threads: int = 1) -> float | None:
    """Re-measure the reference binary on this dataset (warm, best of
    `runs` of its self-reported mapping time); n_reads must match the
    dataset so both sides divide by the same count.  The v2 baseline
    uses runs=2: one pass costs ~70 s of the driver's bench budget and
    this CPU-bound time is stable to ~1-2% run to run."""
    if not REF_BIN.exists():
        return None
    try:
        best = None
        for _ in range(runs):
            p = subprocess.run(
                [str(REF_BIN), "--search", str(ref_fa), "--seq",
                 str(reads_fq), "-t", str(threads), "-o", "/dev/null"],
                capture_output=True, text=True, timeout=600,
            )
            m = re.search(r"mapping\.\.\. done in ([0-9.]+) seconds",
                          p.stderr)
            if m:
                t = float(m.group(1))
                best = t if best is None else min(best, t)
        return n_reads / best if best else None
    except Exception:
        return None


def dp_microbench():
    """DP-extend cell-updates/s of the batched Myers kernel (north star).
    Uses the Pallas kernel on TPU (the engine's hot path), the jnp kernel
    elsewhere."""
    import jax

    from lordfast_tpu.ops import gap_dp, gap_dp_pallas

    Q, T, G = 512, 576, 256
    use_pl = jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    import jax.numpy as jnp

    # device-resident inputs: the metric is kernel cell-updates/s, not the
    # host<->device tunnel (the engine ships only descriptor tables; reads
    # and genome are already device-resident)
    qs = jnp.asarray(rng.integers(0, 4, (G, Q)).astype(np.uint8))
    ts = jnp.asarray(rng.integers(0, 4, (G, T)).astype(np.uint8))
    ql = jnp.asarray(np.full(G, Q, np.int32))
    tl = jnp.asarray(np.full(G, T, np.int32))
    shw = jnp.asarray(np.zeros(G, bool))

    def run():
        if use_pl:
            return gap_dp_pallas.gap_align_pl(qs, ql, ts, tl, shw, Q, T)
        return gap_dp.gap_align(qs, ql, ts, tl, shw, Q, T)

    r = run()  # compile + warm
    jax.block_until_ready(r.dist)
    t0 = time.time()
    reps = 20 if use_pl else 4
    for _ in range(reps):
        r = run()
    jax.block_until_ready(r.dist)
    dt = (time.time() - t0) / reps
    cells = G * Q * T
    return cells / dt


def _timed_map(idx, reads, cfg, label):
    """Warm pass + timed pass; returns (reads_per_sec, n_reads, engine)."""
    from lordfast_tpu.pipeline.engine import MappingEngine

    engine = MappingEngine(idx, cfg)
    t0 = time.time()
    engine.map_file(reads, io.StringIO(), f"{label}-warmup")
    warm = time.time() - t0
    t0 = time.time()
    out = io.StringIO()
    engine.map_file(reads, out, label)
    dt = time.time() - t0
    n_lines = sum(
        1 for l in out.getvalue().splitlines() if not l.startswith("@")
    )
    n_reads = engine.stats["reads"] // 2  # two passes
    rps = n_reads / dt
    t = engine.metrics.timers
    print(
        f"[bench:{label}] warmup {warm:.1f}s; timed {dt:.2f}s for "
        f"{n_reads} reads ({n_lines} SAM records) -> {rps:.1f} reads/s | "
        f"device {t.get('device', 0):.2f}s gap_dp {t.get('gap_dp', 0):.2f}s "
        f"stitch {t.get('stitch', 0):.2f}s emit {t.get('emit', 0):.2f}s",
        file=sys.stderr,
    )
    return rps, n_reads, engine


def _load_or_build(ref, idx_path, cfg):
    from lordfast_tpu.index.builder import (
        build_index, load_index, save_device_cache, save_index,
    )

    if idx_path.exists():
        # mmap the device-layout sidecar (written on first run): skips
        # the npz decompress + pac_words repack on every later run
        idx = load_index(idx_path, mmap=True)
        if idx._host_cache is None:
            save_device_cache(idx, idx_path)
        return idx
    print(f"[bench] building index for {ref.name}...", file=sys.stderr)
    idx = build_index(ref, cfg, verbose=True)
    save_index(idx, idx_path)
    save_device_cache(idx, idx_path)
    return idx


def gen_gbp_reads(idx, path: Path, n_reads=512):
    """Simulated CLR reads off the Gbp-scale genome (via its own packed
    index — the 3.1 GB FASTA is never re-read)."""
    rng = np.random.default_rng(4242)
    comp = str.maketrans("ACGT", "TGCA")
    l_pac = idx.l_pac
    with open(path, "w") as f:
        for i in range(n_reads):
            ln = int(rng.integers(2000, 20000))
            st = int(rng.integers(0, l_pac - ln))
            frag = idx.get_ref_str(st, ln).decode()
            if rng.random() < 0.5:
                frag = frag.translate(comp)[::-1]
            read = _noise(rng, frag)
            f.write(f"@g{i}\n{read}\n+\n{'I' * len(read)}\n")


# reference lordfast on the gbp dataset, 1 thread, measured on this host
# off OUR exported bwa-format index (512 reads / 13.77 s self-reported
# mapping time; total 56 s incl. its ~6 GB index load).  Re-measuring
# inside bench.py would cost minutes of index load per run.
REF_GBP_READS_PER_SEC = 37.2


def main():
    from lordfast_tpu.config import LordfastConfig

    CACHE_DIR.mkdir(exist_ok=True)
    ref = CACHE_DIR / "bench_ref.fa"
    reads = CACHE_DIR / "bench_reads.fq"
    tag = CACHE_DIR / "DATASET_TAG"
    stale = (not ref.exists() or not reads.exists()
             or not tag.exists() or tag.read_text() != DATASET_TAG)
    if stale:
        print("[bench] generating dataset...", file=sys.stderr)
        keep = {"grch_ref.fa", "grch_ref.fa.lft.npz", "gbp_reads.fq"}
        for f in CACHE_DIR.iterdir():  # drop stale index/ref artifacts
            if f.name not in keep:
                f.unlink()
        gen_dataset(CACHE_DIR)
    v1_ref = CACHE_DIR / "v1_bench_ref.fa"
    v1_reads = CACHE_DIR / "v1_bench_reads.fq"
    v1_tag = CACHE_DIR / "V1_TAG"
    V1 = "v1a"  # plain 512 reads only (r01/r02 regime)
    if (not v1_ref.exists() or not v1_reads.exists()
            or not v1_tag.exists() or v1_tag.read_text() != V1):
        print("[bench] generating v1 (easy) dataset...", file=sys.stderr)
        for f in CACHE_DIR.glob("v1_*"):
            f.unlink()
        gen_dataset(CACHE_DIR, easy=True)
        v1_tag.write_text(V1)

    cfg = LordfastConfig()
    idx = _load_or_build(ref, CACHE_DIR / "bench_index_k12.npz", cfg)
    idx_v1 = _load_or_build(v1_ref, CACHE_DIR / "v1_bench_index.npz", cfg)
    if not (CACHE_DIR / "v1_bench_ref.fa.bwt").exists():
        # export our index in the reference's on-disk format so the
        # baseline binary skips its own (slow) index build
        from lordfast_tpu.index.bwa_io import save_bwa_index

        save_bwa_index(idx_v1, v1_ref)

    base_v2 = measure_reference(ref, reads, runs=2)
    src = "re-measured" if base_v2 is not None else "recorded constant"
    if base_v2 is None:
        base_v2 = REF_READS_PER_SEC
    base_v1 = measure_reference(v1_ref, v1_reads, n_reads=N_READS)
    # BASELINE.md's north-star bar is vs a 32-THREAD reference; measure
    # it live (-t 32) and report honestly alongside the host's core
    # count — on a small-core host "-t 32" just saturates the cores
    # (VERDICT r4 task 5)
    ncpu = os.cpu_count() or 1
    base_v2_mt = measure_reference(ref, reads, runs=1, threads=32)
    print(f"[bench] baselines: v2 {base_v2:.1f} reads/s ({src}), "
          f"v1 {base_v1 if base_v1 else float('nan'):.1f} reads/s "
          f"(1 thread); v2 -t 32 "
          f"{base_v2_mt if base_v2_mt else float('nan'):.1f} reads/s "
          f"on a {ncpu}-core host", file=sys.stderr)

    rps_v1, _, _ = _timed_map(idx_v1, v1_reads, cfg, "v1")
    if base_v1:
        print(f"[bench:v1] vs_baseline {rps_v1 / base_v1:.2f}x "
              f"(easy data, reference at its fastest)", file=sys.stderr)

    rps, n_reads, engine = _timed_map(idx, reads, cfg, "v2")

    try:
        cups = dp_microbench()
        print(f"[bench] Myers DP microbench: {cups/1e9:.2f} Gcell/s",
              file=sys.stderr)
    except Exception as e:  # microbench is informational only
        print(f"[bench] DP microbench failed: {e}", file=sys.stderr)

    headline = json.dumps(
        {
            "metric": "reads_per_sec",
            "value": round(rps, 2),
            "unit": "reads/s/chip",
            "vs_baseline": round(rps / base_v2, 3),
            "v1_reads_per_sec": round(rps_v1, 2),
            "v1_vs_baseline": (round(rps_v1 / base_v1, 3)
                               if base_v1 else None),
            "ref32_reads_per_sec": (round(base_v2_mt, 2)
                                    if base_v2_mt else None),
            "vs_ref32": (round(rps / base_v2_mt, 3)
                         if base_v2_mt else None),
            "host_cpus": ncpu,
        }
    )
    # print the headline BEFORE the (long) Gbp section as insurance
    # against an external timeout killing the run mid-Gbp, and again
    # at the end so it is also the final line
    print(headline, flush=True)

    # ---- Gbp-scale mapping (the BASELINE.json north-star scale) ----
    gbp_npz = CACHE_DIR / "grch_ref.fa.lft.npz"
    if gbp_npz.exists() and not os.environ.get("BENCH_NO_GBP"):
        try:
            from lordfast_tpu.index.builder import load_index

            print("[bench:gbp] loading 3.1 Gbp index...", file=sys.stderr)
            t_l = time.time()
            gidx = load_index(gbp_npz, mmap=True)
            print(f"[bench:gbp] loaded in {time.time()-t_l:.0f}s "
                  f"(sa_intv={gidx.sa_intv}, "
                  f"mmap={'yes' if gidx._host_cache is not None else 'no'})",
                  file=sys.stderr)
            gbp_reads = CACHE_DIR / "gbp_reads.fq"
            if not gbp_reads.exists():
                print("[bench:gbp] simulating reads...", file=sys.stderr)
                gen_gbp_reads(gidx, gbp_reads)
            # live gbp baseline off our exported bwa-format index when
            # requested (BENCH_GBP_BASELINE=live, ~60 s: the reference
            # must load its ~6 GB index; its self-reported mapping time
            # excludes that load) — else the recorded constant
            base_g = None
            if os.environ.get("BENCH_GBP_BASELINE") == "live":
                base_g = measure_reference(
                    CACHE_DIR / "grch_ref.fa", gbp_reads, n_reads=512,
                    runs=1,
                )
            if base_g is None:
                base_g = REF_GBP_READS_PER_SEC
            rps_g, n_g, eng_g = _timed_map(gidx, gbp_reads, cfg, "gbp")
            rec = {
                "metric": "reads_per_sec_gbp",
                "value": round(rps_g, 2),
                "unit": "reads/s/chip (3.1 Gbp genome)",
            }
            if base_g:
                rec["vs_baseline"] = round(rps_g / base_g, 3)
            print(json.dumps(rec))
            headline = json.loads(headline)
            headline["gbp_reads_per_sec"] = round(rps_g, 2)
            headline["gbp_vs_baseline"] = rec.get("vs_baseline")
            headline = json.dumps(headline)
        except Exception as e:
            print(f"[bench:gbp] failed: {e}", file=sys.stderr)

    print(headline)


if __name__ == "__main__":
    main()

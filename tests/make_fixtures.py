"""Generate golden-output fixtures: synthetic genome + simulated PacBio-like
reads, mapped with the reference lordfast binary (built separately from
/root/reference; see SURVEY.md §4).  The resulting ref.fa / reads.fq /
golden.sam are committed so tests don't need the reference binary.

Usage: python tests/make_fixtures.py [path-to-lordfast-binary]
"""

import subprocess
import sys
from pathlib import Path

import numpy as np

DATA = Path(__file__).parent / "data"


def make_genome(rng, path):
    contigs = {"chr1": 30011, "chr2": 19993}
    seqs = {}
    with open(path, "w") as f:
        for name, n in contigs.items():
            codes = rng.integers(0, 4, size=n)
            # implant some repeats for realism: copy a 500bp block around
            block = codes[1000:1500].copy()
            codes[5000:5500] = block
            codes[12000:12500] = block
            seq = "".join("ACGT"[c] for c in codes)
            seqs[name] = seq
            f.write(f">{name}\n")
            for i in range(0, n, 70):
                f.write(seq[i : i + 70] + "\n")
    return seqs


def simulate_read(rng, seq, sub=0.04, ins=0.05, dele=0.03):
    """CLR-like noise."""
    out = []
    for ch in seq:
        r = rng.random()
        if r < sub:
            out.append("ACGT"[rng.integers(0, 4)])
        elif r < sub + ins:
            out.append(ch)
            out.append("ACGT"[rng.integers(0, 4)])
        elif r < sub + ins + dele:
            continue
        else:
            out.append(ch)
    return "".join(out)


def make_reads(rng, seqs, path, n_reads=60):
    comp = str.maketrans("ACGT", "TGCA")
    names = list(seqs)
    with open(path, "w") as f:
        for i in range(n_reads):
            cname = names[rng.integers(0, len(names))]
            seq = seqs[cname]
            ln = int(rng.integers(1000, 4000))
            start = int(rng.integers(0, max(1, len(seq) - ln)))
            frag = seq[start : start + ln]
            strand = "+"
            if rng.random() < 0.5:
                frag = frag.translate(comp)[::-1]
                strand = "-"
            if i % 10 == 7:
                # chimeric read: junction of two loci (split mapping test)
                other = seqs[names[rng.integers(0, len(names))]]
                st2 = int(rng.integers(0, max(1, len(other) - 800)))
                frag = frag[: ln // 2] + other[st2 : st2 + 800]
            read = simulate_read(rng, frag)
            qual = "I" * len(read)
            f.write(f"@read{i}_{cname}_{start}_{strand}\n{read}\n+\n{qual}\n")


def append_structured_reads(seqs, path):
    """Reads exercising the escalation paths of alignChain_edlib
    (src/LordFAST.cpp:1820-2230) so the golden SAM covers them:

    - a ~2 kb deletion and an intra-contig translocation-like jump
      (split: |lenDiff| >= 80 and sim < 0.40, :1952 -> supplementary
      records, flag 2048 at :378),
    - an inverted middle segment (sim_r > 0.60 inversion branch,
      :2034-2077, flipped-strand record),
    - >500 bp junk read ends (clip escalation, :1848 / :2212),
    - pure-noise reads (unmapped, flag 4).

    A dedicated RNG keeps the original 60 reads bit-identical."""
    rng = np.random.default_rng(777)
    comp = str.maketrans("ACGT", "TGCA")
    g = seqs["chr1"]

    def rand_seq(n):
        return "".join("ACGT"[c] for c in rng.integers(0, 4, n))

    cases = []  # (name, fragment[, add_noise])
    # 2 kb deletion: q-gap ~0 vs t-gap ~2000
    a = 2000
    cases.append(("sv_del2k", g[a : a + 1500] + g[a + 3500 : a + 5000]))
    # long jump within the contig (translocation-like split)
    b = 16000
    cases.append(("sv_jump", g[b : b + 1500] + g[b + 10000 : b + 11500]))
    # inverted middle segment: the enclosing gap needs sim < split_sim
    # (0.40) with >= 80 length imbalance so the split fires, while the
    # middle stays rc-similar (sim_r > 0.60) — empirically (probing the
    # reference binary) a 450 bp target surplus on a noiseless read takes
    # the inversion branch: primary flag 16 + strand-flipped supplementary
    # flag 2048 (:1952, :2040-2077)
    c = 7000
    cases.append((
        "sv_inv",
        g[c : c + 1200]
        + g[c + 1200 : c + 2700].translate(comp)[::-1]
        + g[c + 3150 : c + 4350],
        False,
    ))
    # junk left end / junk right end (> clip_len = 500)
    d = 22000
    cases.append(("sv_clipL", rand_seq(700) + g[d : d + 1400]))
    cases.append(("sv_clipR", g[d + 3000 : d + 4400] + rand_seq(700)))
    # garbage reads: unmapped
    cases.append(("garbage1", rand_seq(1500)))
    cases.append(("garbage2", rand_seq(1200)))

    with open(path, "a") as f:
        for case in cases:
            name, frag = case[0], case[1]
            noisy = case[2] if len(case) > 2 else True
            read = simulate_read(rng, frag) if noisy else frag
            f.write(f"@{name}\n{read}\n+\n{'I' * len(read)}\n")


def main():
    binary = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild/lordfast"
    DATA.mkdir(exist_ok=True)
    rng = np.random.default_rng(42)
    ref = DATA / "ref.fa"
    reads = DATA / "reads.fq"
    golden = DATA / "golden.sam"
    seqs = make_genome(rng, ref)
    make_reads(rng, seqs, reads)
    append_structured_reads(seqs, reads)
    if Path(binary).exists():
        subprocess.run([binary, "--index", str(ref)], check=True)
        with open(golden, "w") as out:
            subprocess.run(
                [binary, "--search", str(ref), "--seq", str(reads)],
                check=True, stdout=out,
            )
        print(f"golden SAM written to {golden}")
    else:
        print(f"reference binary {binary} not found; fixtures only")


if __name__ == "__main__":
    main()

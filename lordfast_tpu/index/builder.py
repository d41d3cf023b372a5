"""Offline index builder (host).

Pipeline (capability match of ``bwa_index``, lib/bwa/bwtindex.c:187-293,
plus the lordFAST k-mer cache, src/BWT.cpp:60-138):

  FASTA -> contig table + 2-bit pac (N -> rand48-seeded random base,
  exactly bntseq.c:261,290) -> text T = fwd + revcomp (bntseq.c:301-307)
  -> suffix array (native SA-IS) -> $-removed BWT + primary -> Occ
  checkpoints every 128 bases -> sampled SA (interval 32) -> 4^k k-mer
  SA-interval cache -> persisted as a single .npz.

This is a one-time offline cost; everything the mapper needs at runtime
loads from the .npz into device arrays.
"""

from __future__ import annotations

import gzip
import io
import json
import time
from pathlib import Path

import numpy as np

from ..config import LordfastConfig
from ..native import suffix_array
from ..utils.pack import Rand48, pack_bwt_words, pack_pac, seq_to_codes
from .container import FMIndex
from .fm_host import occ_np

FORMAT_VERSION = 1


def _open_maybe_gz(path):
    path = str(path)
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def parse_fasta(path):
    """Yield (name, codes uint8 0..4) per contig."""
    name = None
    chunks = []
    with _open_maybe_gz(path) as f:
        for raw in io.BufferedReader(f):
            line = raw.strip()
            if not line:
                continue
            if line.startswith(b">"):
                if name is not None:
                    yield name, seq_to_codes(b"".join(chunks))
                name = line[1:].split()[0].decode()
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        yield name, seq_to_codes(b"".join(chunks))


def _build_kmer_cache(bwt_words, occ_cp, L2, primary, seq_len, k):
    """SA-interval table for all 4^k patterns.

    Level-by-level BFS identical in effect to bwt_cache_gen
    (src/BWT.cpp:60-138): child ni = i*4 + j prepends char j to pattern i
    (backward-search step); empty parents propagate their (beg>end) marker.
    Vectorized: each level is one batched 2occ over all parents.
    """
    beg = np.array([0], dtype=np.int64)
    end = np.array([seq_len], dtype=np.int64)
    for _level in range(k):
        sz = len(beg)
        pk = np.repeat(beg, 4)
        pl = np.repeat(end, 4)
        cj = np.tile(np.arange(4, dtype=np.int64), sz)
        nonempty = pk <= pl
        ok = occ_np(bwt_words, occ_cp, L2, primary, seq_len, pk - 1, cj)
        ol = occ_np(bwt_words, occ_cp, L2, primary, seq_len, pl, cj)
        nbeg = np.where(nonempty, L2[cj] + ok + 1, pk)
        nend = np.where(nonempty, L2[cj] + ol, pl)
        beg, end = nbeg, nend
    return beg, end


def build_index(fasta_path, cfg: LordfastConfig | None = None, verbose=True) -> FMIndex:
    cfg = (cfg or LordfastConfig()).validate()
    t0 = time.time()

    names, offsets, lengths = [], [], []
    amb_off, amb_len, amb_chr = [], [], []
    fwd_parts = []
    rng = Rand48(seed=11)
    l_pac = 0
    for name, codes in parse_fasta(fasta_path):
        names.append(name)
        offsets.append(l_pac)
        lengths.append(len(codes))
        # record N holes (bntseq.c:241-259 semantics: runs of ambiguous chars)
        n_mask = codes >= 4
        if n_mask.any():
            d = np.diff(np.concatenate(([0], n_mask.view(np.int8), [0])))
            starts = np.nonzero(d == 1)[0]
            ends = np.nonzero(d == -1)[0]
            for s, e in zip(starts, ends):
                amb_off.append(l_pac + int(s))
                amb_len.append(int(e - s))
                amb_chr.append(ord("N"))
        fwd_parts.append(rng.fill_n_bases(codes))
        l_pac += len(codes)

    if l_pac == 0:
        raise ValueError(f"no sequences in {fasta_path}")

    # T = fwd + revcomp(fwd)  (bntseq.c:301-307), built in one buffer so
    # `fwd` never exists as a separate allocation (Gbp-scale RAM)
    seq_len = 2 * l_pac
    text = np.empty(seq_len, np.uint8)
    pos_w = 0
    for part in fwd_parts:
        text[pos_w : pos_w + len(part)] = part
        pos_w += len(part)
    del fwd_parts
    np.subtract(3, text[:l_pac][::-1], out=text[l_pac:])
    pac = pack_pac(text[:l_pac])

    if verbose:
        print(f"[index] packed {l_pac} bp ({len(names)} contigs) "
              f"in {time.time()-t0:.1f}s", flush=True)

    # suffix array over T$ (sentinel = 0; shift codes up by 1); the +1
    # text goes straight into its buffer (no extra copy)
    t1 = time.time()
    tbuf = np.empty(seq_len + 1, np.uint8)
    np.add(text, 1, out=tbuf[:seq_len])
    tbuf[seq_len] = 0
    sa_full = suffix_array(tbuf)
    del tbuf
    if verbose:
        print(f"[index] suffix array in {time.time()-t1:.1f}s", flush=True)

    # $-removed BWT + primary (bwa convention, lib/bwa/bwt.c:114).
    # Chunked over SA rows: the one-shot text[sa_full[sa_full > 0] - 1]
    # materializes a second int64 SA-sized copy plus a bool mask — ~2.2x
    # the SA itself in transients, the peak-RSS driver at Gbp scale.
    bwt_codes = np.empty(seq_len, np.uint8)
    primary = -1
    pos_w = 0
    CH = 1 << 26
    for s in range(0, seq_len + 1, CH):
        blk = sa_full[s : s + CH]
        z = np.nonzero(blk == 0)[0]
        if len(z):
            primary = s + int(z[0])
        keep = blk[blk > 0]
        bwt_codes[pos_w : pos_w + len(keep)] = text[keep - 1]
        pos_w += len(keep)
    assert pos_w == seq_len and primary >= 0
    bwt_words = pack_bwt_words(bwt_codes)

    # Occ checkpoints every 128 bases
    occ_int = cfg.occ_interval
    n_blocks = (seq_len + occ_int - 1) // occ_int
    # pad to whole blocks: rank kernels gather 8 words per block
    words_needed = n_blocks * (occ_int // 16)
    if len(bwt_words) < words_needed:
        bwt_words = np.concatenate(
            [bwt_words, np.zeros(words_needed - len(bwt_words), np.uint32)]
        )
    # per-block char counts, chunked (the one-shot onehot compare
    # materializes 4 text-sized bools back to back at Gbp scale)
    per_block = np.zeros((n_blocks, 4), dtype=np.uint64)
    BCH = 1 << 22  # blocks per chunk
    for b0 in range(0, n_blocks, BCH):
        b1 = min(b0 + BCH, n_blocks)
        lo = b0 * occ_int
        hi = min(b1 * occ_int, seq_len)
        seg = np.full((b1 - b0) * occ_int, 255, np.uint8)
        seg[: hi - lo] = bwt_codes[lo:hi]
        seg = seg.reshape(b1 - b0, occ_int)
        for c in range(4):
            per_block[b0:b1, c] = (seg == c).sum(axis=1)
    occ_cp = np.zeros((n_blocks + 1, 4), dtype=np.uint32)
    occ_cp[1:] = np.cumsum(per_block, axis=0).astype(np.uint32)
    # (counts of one char can exceed uint32 only beyond 17 Gbp; assert)
    assert int(per_block.sum()) == seq_len

    L2 = np.zeros(5, dtype=np.int64)
    cnt = np.bincount(text, minlength=4)
    L2[1:] = np.cumsum(cnt[:4])
    del text, bwt_codes  # Gbp-scale: drop before the cache build

    # sampled SA: rows k % intv == 0 of the conceptual (n+1)-row matrix;
    # sa_full already is that matrix (row 0 = sentinel, value seq_len).
    sa_intv = cfg.sa_interval
    if sa_intv == 0:  # auto: full SA when it fits the budget (see config)
        pos_size = 4 if seq_len < 2**31 - 1 else 8
        sa_intv = 1 if (seq_len + 1) * pos_size <= cfg.sa_mem_budget else 32
    sa_samp = sa_full[::sa_intv].copy()
    sa_samp[0] = -1  # bwa sets sa[0] = -1 (never queried; bwt.c:83)
    del sa_full

    t2 = time.time()
    kb, ke = _build_kmer_cache(
        bwt_words, occ_cp, L2, primary, seq_len, cfg.kmer_cache_k
    )
    if verbose:
        print(f"[index] 4^{cfg.kmer_cache_k} k-mer cache in "
              f"{time.time()-t2:.1f}s", flush=True)

    idx = FMIndex(
        l_pac=l_pac,
        seq_len=seq_len,
        primary=primary,
        L2=L2,
        bwt_words=bwt_words,
        occ_cp=occ_cp,
        sa_samp=sa_samp,
        sa_intv=sa_intv,
        kcache_k=cfg.kmer_cache_k,
        kcache_beg=kb,
        kcache_end=ke,
        pac=pac,
        contig_names=names,
        contig_offsets=np.asarray(offsets, dtype=np.int64),
        contig_lengths=np.asarray(lengths, dtype=np.int64),
        amb_offsets=np.asarray(amb_off, dtype=np.int64),
        amb_lengths=np.asarray(amb_len, dtype=np.int64),
        amb_chars=np.asarray(amb_chr, dtype=np.uint8),
    )
    if verbose:
        print(f"[index] total {time.time()-t0:.1f}s", flush=True)
    return idx


def save_index(idx: FMIndex, path):
    meta = {
        "version": FORMAT_VERSION,
        "l_pac": idx.l_pac,
        "seq_len": idx.seq_len,
        "primary": idx.primary,
        "sa_intv": idx.sa_intv,
        "kcache_k": idx.kcache_k,
        "contig_names": idx.contig_names,
    }
    np.savez(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        L2=idx.L2,
        bwt_words=idx.bwt_words,
        occ_cp=idx.occ_cp,
        sa_samp=idx.sa_samp,
        kcache_beg=idx.kcache_beg,
        kcache_end=idx.kcache_end,
        pac=idx.pac,
        contig_offsets=idx.contig_offsets,
        contig_lengths=idx.contig_lengths,
        amb_offsets=idx.amb_offsets,
        amb_lengths=idx.amb_lengths,
        amb_chars=idx.amb_chars,
    )


def load_index(path) -> FMIndex:
    with np.load(path) as z:
        meta = json.loads(z["meta"].tobytes().decode())
        if meta["version"] != FORMAT_VERSION:
            raise ValueError(f"index format {meta['version']} != {FORMAT_VERSION}")
        return FMIndex(
            l_pac=meta["l_pac"],
            seq_len=meta["seq_len"],
            primary=meta["primary"],
            sa_intv=meta["sa_intv"],
            kcache_k=meta["kcache_k"],
            contig_names=meta["contig_names"],
            L2=z["L2"],
            bwt_words=z["bwt_words"],
            occ_cp=z["occ_cp"],
            sa_samp=z["sa_samp"],
            kcache_beg=z["kcache_beg"],
            kcache_end=z["kcache_end"],
            pac=z["pac"],
            contig_offsets=z["contig_offsets"],
            contig_lengths=z["contig_lengths"],
            amb_offsets=z["amb_offsets"],
            amb_lengths=z["amb_lengths"],
            amb_chars=z["amb_chars"],
        )


def index_path_for(fasta_path) -> Path:
    return Path(str(fasta_path) + ".lft.npz")

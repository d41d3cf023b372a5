"""End-to-end mapping engine.

Orchestrates the per-chunk flow of the reference driver
(src/baseFAST.cpp:44-82: readChunk -> initFASTChunk -> mapSeqMT ->
releaseChunk) with the device/host split of this build:

  device (batched over reads): seeding -> window voting -> per-window seed
  selection -> chaining DP;
  host: chain stitching (gap DP via native edlib-equivalents), scoring,
  mode resolution (coarse vs fine, src/LordFAST.cpp:542-569), SAM output
  in input order (the reference's output order is thread-nondeterministic;
  we define it as input order, SURVEY.md §4).
"""

from __future__ import annotations

import sys
import time
from typing import List, Optional, TextIO

import numpy as np

from ..align.chain_align import Mapping, align_chain_edlib, score_mapping
from ..config import LordfastConfig
from ..index.container import FMIndex
from ..io import sam as sam_io
from ..io.fastx import Read, read_chunks
from ..ops import chain as chain_ops
from ..ops import fm_index as fm_ops
from ..ops import voting as vote_ops
from ..utils.pack import seq_to_codes, revcomp_codes


def _pad_to_bucket(n: int, buckets=(1024, 2048, 4096, 8192, 16384, 32768,
                                    65536, 131072, 262144)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class MappingEngine:
    def __init__(self, idx: FMIndex, cfg: Optional[LordfastConfig] = None):
        self.idx = idx
        self.cfg = (cfg or LordfastConfig()).validate()
        self.arrs = idx.device_arrays()
        self.meta = idx.meta
        self.stats = {"reads": 0, "mapped": 0, "chunks": 0, "batches": 0}

    # ---- device stage ----
    def _device_stage(self, reads_arr: np.ndarray, lens: np.ndarray):
        cfg = self.cfg
        seeds = fm_ops.seed_anchors(self.arrs, self.meta, reads_arr, lens, cfg)
        cands = vote_ops.vote_windows(seeds, lens, cfg)
        ws = chain_ops.select_window_seeds(seeds, cands, lens, self.arrs, cfg)
        chains = chain_ops.chain_dpn2(ws, cfg)
        return seeds, cands, chains

    # ---- per-read host resolution ----
    def _resolve_read(self, b: int, read: Read, cands, chains) -> List[Mapping]:
        cfg = self.cfg
        read_len = len(read.seq)
        valid = np.asarray(cands.valid[b])
        if not valid[0]:
            return []  # no candidate windows -> unmapped

        fwd = seq_to_codes(read.seq)
        rev = revcomp_codes(fwd)

        c_scores = np.asarray(chains.score[b])
        c_lens = np.asarray(chains.chain_len[b])
        cnts = np.asarray(cands.cnt[b])
        is_rev = np.asarray(cands.is_rev[b])

        if not bool(cands.is_fine[b]):
            selected = [0]  # coarse: single top-vote window
        else:
            min_score = np.float32(cands.min_score[b])
            qual_idx = [
                c for c in range(len(valid))
                if valid[c] and np.float32(cnts[c]) > min_score
            ]
            # top max_map windows by chain score (the fine-mode heap,
            # src/LordFAST.cpp:819-904)
            qual_idx.sort(key=lambda c: (-float(c_scores[c]), c))
            selected = qual_idx[: cfg.max_map]

        mappings = []
        for c in selected:
            if c_lens[c] > 1:
                n = int(c_lens[c])
                query = rev if is_rev[c] else fwd
                m = align_chain_edlib(
                    np.asarray(chains.q_pos[b, c, :n]),
                    np.asarray(chains.t_pos[b, c, :n]),
                    np.asarray(chains.length[b, c, :n]),
                    query, read_len, bool(is_rev[c]), self.idx, cfg,
                )
                score_mapping(m, read_len, bool(is_rev[c]), cfg)
            else:
                m = Mapping(records=[], total_score=-2 * read_len)
            mappings.append(m)

        # fine mode: sort by totalScore (compareSam, src/LordFAST.cpp:986)
        if bool(cands.is_fine[b]):
            mappings.sort(key=lambda m: -m.total_score)
        return mappings

    # ---- main loop ----
    def map_file(self, seq_path, out: TextIO, command_line: str = ""):
        cfg = self.cfg
        if not cfg.no_sam_header:
            sam_io.write_header(out, self.idx, cfg, command_line)

        for chunk in read_chunks(seq_path, cfg.chunk_bytes):
            t0 = time.time()
            self.stats["chunks"] += 1
            self._map_chunk(chunk, out)
            print(
                f"[engine] chunk of {len(chunk)} reads mapped in "
                f"{time.time()-t0:.2f}s",
                file=sys.stderr, flush=True,
            )

    def _map_chunk(self, chunk: List[Read], out: TextIO):
        cfg = self.cfg
        # short reads are emitted unmapped without touching the device
        # (src/LordFAST.cpp:490-499)
        work = [r for r in chunk if len(r.seq) >= cfg.min_read_len]
        # length-bucketed batches to bound padding waste
        order = sorted(range(len(work)), key=lambda i: len(work[i].seq))
        results = {}
        B = cfg.batch_reads
        for s in range(0, len(order), B):
            idxs = order[s : s + B]
            batch = [work[i] for i in idxs]
            self.stats["batches"] += 1
            L = _pad_to_bucket(max(len(r.seq) for r in batch))
            # pad the batch dimension to a fixed B so XLA compiles once
            # per length bucket, not once per (bucket, batch-size) pair
            arr = np.full((B, L), 4, dtype=np.uint8)
            lens = np.zeros(B, dtype=np.int32)
            for j, r in enumerate(batch):
                codes = seq_to_codes(r.seq)
                arr[j, : len(codes)] = codes
                lens[j] = len(codes)
            seeds, cands, chains = self._device_stage(arr, lens)
            for j, i in enumerate(idxs):
                results[i] = self._resolve_read(j, batch[j], cands, chains)

        wi = 0
        for r in chunk:
            self.stats["reads"] += 1
            if len(r.seq) < cfg.min_read_len:
                sam_io.emit_read(out, self.idx, cfg, r.name, r.seq, r.qual, [])
                continue
            mappings = results[wi]
            wi += 1
            if mappings and mappings[0].records:
                self.stats["mapped"] += 1
            sam_io.emit_read(
                out, self.idx, cfg, r.name, r.seq, r.qual, mappings
            )

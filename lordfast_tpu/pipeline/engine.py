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

from ..align.chain_align import Mapping, align_and_score
from ..config import LordfastConfig
from ..index.container import FMIndex
from ..io import sam as sam_io
from ..io.fastx import Read, read_chunks
from ..ops import chain as chain_ops
from ..ops import fm_index as fm_ops
from ..ops import voting as vote_ops
from ..utils.checkpoint import ChunkProgress
from ..utils.metrics import Metrics
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
        self.metrics = Metrics(verbosity=getattr(self.cfg, "verbosity", 0))
        # one jitted function for the whole device stage: eager op-by-op
        # dispatch costs a host<->device roundtrip per op, which dominates
        # wall time on remote/tunneled TPU backends
        from ..parallel.mesh import device_pipeline
        import jax
        self._device_fn = jax.jit(device_pipeline(self.meta, self.cfg))

    # ---- device stage ----
    def _device_stage(self, reads_arr: np.ndarray, lens: np.ndarray):
        pos = fm_ops.sample_positions_host(lens, self.cfg.sampling_count)
        return self._device_fn(self.arrs, reads_arr, lens, pos)

    # ---- per-read host resolution ----
    def _chain_rows(self, out, chains_dev, k: int, n: int):
        """Chain arrays for window row k: from the eagerly-transferred
        trimmed tensors when the chain fits, else a lazy per-row fetch of
        the full on-device tensor (rare: ultra-long reads)."""
        if n <= out["chain_ql"].shape[1]:
            ql = out["chain_ql"][k, :n]
            return (ql >> 12).astype(np.int64), out["chain_t"][k, :n], \
                (ql & 4095).astype(np.int64)
        import jax

        q, t, ln = jax.device_get(
            (chains_dev.q_pos[k, :n], chains_dev.t_pos[k, :n],
             chains_dev.length[k, :n])
        )
        return q, t, ln

    def _resolve_read(self, b: int, read: Read, out, chains_dev,
                      rows_by_read) -> List[Mapping]:
        cfg = self.cfg
        read_len = len(read.seq)
        if not out["cand_valid0"][b]:
            return []  # no candidate windows -> unmapped

        rows = rows_by_read.get(b, [])
        if not rows:
            self.stats["compact_overflow"] = (
                self.stats.get("compact_overflow", 0) + 1
            )
            return []

        is_fine = bool(out["is_fine"][b])
        if not is_fine:
            # coarse: the single top-vote window (cand index 0)
            selected = [k for k in rows if out["cw_cand_idx"][k] == 0][:1]
        else:
            # top max_map windows by chain score (the fine-mode heap,
            # src/LordFAST.cpp:819-904); ties by vote rank
            rows = sorted(
                rows,
                key=lambda k: (-float(out["chain_score"][k]),
                               int(out["cw_cand_idx"][k])),
            )
            selected = rows[: cfg.max_map]

        fwd = seq_to_codes(read.seq)
        rev = revcomp_codes(fwd)

        mappings = []
        for k in selected:
            n = int(out["chain_len"][k])
            if n > 1:
                is_rev = bool(out["cw_is_rev"][k])
                query = rev if is_rev else fwd
                cq, ct, cl = self._chain_rows(out, chains_dev, k, n)
                m = align_and_score(
                    cq, ct, cl, query, read_len, is_rev, self.idx, cfg,
                )
                if len(m.records) > 1:
                    self.metrics.add("splits", len(m.records) - 1)
                    base = 16 if is_rev else 0
                    self.metrics.add(
                        "inversions",
                        sum(1 for r in m.records if (r.flag & 16) != base),
                    )
            else:
                m = Mapping(records=[], total_score=-2 * read_len)
            mappings.append(m)

        # fine mode: sort by totalScore (compareSam, src/LordFAST.cpp:986)
        if is_fine:
            mappings.sort(key=lambda m: -m.total_score)
        return mappings

    # ---- main loop ----
    def map_file(self, seq_path, out: TextIO, command_line: str = "",
                 progress: Optional[ChunkProgress] = None):
        """Map every read of seq_path, writing SAM to out.

        progress: optional chunk-level checkpoint (SURVEY.md §5.4) — chunks
        with id <= progress.last_done are skipped (already in the output of
        a previous run); each completed chunk is recorded durably."""
        cfg = self.cfg
        resume_from = progress.last_done if progress else -1
        if not cfg.no_sam_header and resume_from < 0:
            sam_io.write_header(out, self.idx, cfg, command_line)

        for chunk_id, chunk in enumerate(read_chunks(seq_path,
                                                     cfg.chunk_bytes)):
            if chunk_id <= resume_from:
                self.metrics.log(
                    1, f"[engine] chunk {chunk_id} already done; skipping"
                )
                continue
            t0 = time.time()
            self.stats["chunks"] += 1
            self._map_chunk(chunk, out)
            if progress is not None:
                out.flush()
                progress.mark_done(chunk_id)
            print(
                "[engine] "
                + self.metrics.chunk_line(chunk_id, len(chunk),
                                          time.time() - t0),
                file=sys.stderr, flush=True,
            )
        if progress is not None:
            progress.finish()

    def _map_chunk(self, chunk: List[Read], out: TextIO):
        import jax

        cfg = self.cfg
        # short reads are emitted unmapped without touching the device
        # (src/LordFAST.cpp:490-499)
        work = [r for r in chunk if len(r.seq) >= cfg.min_read_len]
        # length-bucketed batches to bound padding waste
        order = sorted(range(len(work)), key=lambda i: len(work[i].seq))
        results = {}
        B = cfg.batch_reads

        def dispatch(s):
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
            _, chains_dev, host_out = self._device_stage(arr, lens)
            return idxs, batch, (chains_dev, host_out)

        def resolve(idxs, batch, dev):
            # one device->host transfer per batch, trimmed on device
            # (seeds and full chains stay on device)
            chains_dev, host_out = dev
            with self.metrics.timer("device"):
                out = jax.device_get(host_out)
            for name in ("seeds", "candidates", "fine_reads",
                         "chained_windows"):
                self.metrics.add(name, int(out[f"stat_{name}"]))
            rows_by_read = {}
            cw_valid = out["cw_valid"]
            cw_read = out["cw_read_idx"]
            for k in range(len(cw_valid)):
                if cw_valid[k]:
                    rows_by_read.setdefault(int(cw_read[k]), []).append(k)
            with self.metrics.timer("stitch"):
                for j, i in enumerate(idxs):
                    results[i] = self._resolve_read(
                        j, batch[j], out, chains_dev, rows_by_read
                    )

        # software pipeline: keep up to `depth` batches in flight on the
        # device so host stitching of batch k overlaps device compute of
        # batch k+1 (JAX dispatch is async; device_get is the sync point)
        depth = 2
        inflight = []
        for s in range(0, len(order), B):
            inflight.append(dispatch(s))
            if len(inflight) > depth:
                resolve(*inflight.pop(0))
        for item in inflight:
            resolve(*item)

        with self.metrics.timer("emit"):
            wi = 0
            for r in chunk:
                self.stats["reads"] += 1
                if len(r.seq) < cfg.min_read_len:
                    sam_io.emit_read(
                        out, self.idx, cfg, r.name, r.seq, r.qual, []
                    )
                    continue
                mappings = results[wi]
                wi += 1
                if mappings and mappings[0].records:
                    self.stats["mapped"] += 1
                sam_io.emit_read(
                    out, self.idx, cfg, r.name, r.seq, r.qual, mappings
                )

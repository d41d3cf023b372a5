"""Chunk-level checkpoint / resume.

The reference has no mid-run checkpointing; its durable artifacts are the
index files (written once, reloaded: src/BWT.cpp:117-133,159-187) and the
independent ~100 MB read chunks (src/baseFAST.cpp:59,64-78), so a restart
loses at most one chunk.  The TPU build keeps exactly that granularity
(SURVEY.md §5.4): a sidecar ``<out>.progress`` JSON records the
last-completed chunk id (per host, for multi-host runs); on resume,
completed chunks are skipped and output continues in append mode.
The record is fsynced after each chunk so a killed run resumes cleanly.
"""

from __future__ import annotations

import json
import os
from pathlib import Path


class ChunkProgress:
    """Tracks last-completed chunk for one (seq_file, out_file) run."""

    def __init__(self, out_path: str | os.PathLike, seq_path: str,
                 process_index: int = 0):
        self.path = Path(f"{out_path}.progress")
        self.seq_path = str(seq_path)
        self.process_index = process_index
        self.last_done = -1

    def load(self) -> int:
        """Returns the last completed chunk id (-1 if starting fresh or
        the record belongs to a different input file)."""
        try:
            rec = json.loads(self.path.read_text())
        except (FileNotFoundError, json.JSONDecodeError):
            return -1
        if rec.get("seq_path") != self.seq_path or \
                rec.get("process_index", 0) != self.process_index:
            return -1
        self.last_done = int(rec.get("last_chunk", -1))
        return self.last_done

    def mark_done(self, chunk_id: int) -> None:
        self.last_done = chunk_id
        tmp = self.path.with_suffix(".progress.tmp")
        with open(tmp, "w") as f:
            json.dump(
                {"seq_path": self.seq_path, "last_chunk": chunk_id,
                 "process_index": self.process_index}, f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)

    def finish(self) -> None:
        """Run completed: remove the sidecar so the next run starts clean."""
        try:
            self.path.unlink()
        except FileNotFoundError:
            pass

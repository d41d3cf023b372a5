"""Engine-level feature tests: multi-device sharding correctness,
over-long read handling, and checkpoint/resume output repair."""

import io
from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"

TEST_CFG = dict(
    kmer_cache_k=8,
    max_seeds_per_read=1024,
    max_chain_seeds=128,
    max_candidates=16,
    batch_reads=16,
)


@pytest.fixture(scope="module")
def fixture_index(ref8_idx):
    return ref8_idx  # session-shared k=8 index (conftest.ref8_idx)


def _map_to_string(engine, seq_path):
    out = io.StringIO()
    engine.map_file(seq_path, out, "test")
    return out.getvalue()


def test_sharded_mesh_sam_identical(fixture_index):
    """Mapping through a 1-, 2-, and 8-device mesh must produce the exact
    SAM of the unsharded engine (data parallelism over reads is pure
    partitioning; SURVEY.md §2.5)."""
    import jax
    from lordfast_tpu.config import LordfastConfig
    from lordfast_tpu.parallel.mesh import make_mesh
    from lordfast_tpu.pipeline.engine import MappingEngine

    cfg = LordfastConfig(**TEST_CFG)
    base = _map_to_string(MappingEngine(fixture_index, cfg),
                          DATA / "reads.fq")
    for n_dev in (1, 2, 8):
        mesh = make_mesh(jax.devices()[:n_dev])
        eng = MappingEngine(fixture_index, cfg, mesh=mesh)
        got = _map_to_string(eng, DATA / "reads.fq")
        assert got == base, f"{n_dev}-device mesh output differs"


def test_overlong_read_unmapped(fixture_index, tmp_path):
    """A read longer than seq_max_length is emitted unmapped instead of
    crashing the batch packer (the reference would overflow its 250k
    stack buffers, src/Common.h:51)."""
    from lordfast_tpu.config import LordfastConfig
    from lordfast_tpu.pipeline.engine import MappingEngine

    rng = np.random.default_rng(5)
    long_seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 300_000))
    fq = tmp_path / "long.fq"
    with open(fq, "w") as f:
        f.write(f"@toolong\n{long_seq}\n+\n{'I' * len(long_seq)}\n")
        # plus a normal mappable read so the batch path still runs
        normal = open(DATA / "reads.fq").read().splitlines()
        f.write("\n".join(normal[:4]) + "\n")

    cfg = LordfastConfig(**TEST_CFG)
    eng = MappingEngine(fixture_index, cfg)
    sam = _map_to_string(eng, fq)
    recs = [l.split("\t") for l in sam.splitlines()
            if l and not l.startswith("@")]
    by_name = {r[0]: r for r in recs}
    assert int(by_name["toolong"][1]) & 4, "over-long read must be unmapped"
    assert eng.stats["reads"] == 2


def test_resume_truncates_partial_chunk(fixture_index, tmp_path):
    """Simulated crash mid-chunk: the resumed run truncates the partially
    flushed output back to the last durable offset, so the final SAM
    equals an uninterrupted run (ADVICE r1: resume append duplicated the
    unfinished chunk)."""
    from lordfast_tpu.config import LordfastConfig
    from lordfast_tpu.pipeline.engine import MappingEngine
    from lordfast_tpu.utils.checkpoint import ChunkProgress

    # tiny chunks: the 60-read fixture becomes several chunks
    cfg = LordfastConfig(**TEST_CFG).replace(chunk_bytes=40_000)
    seq = DATA / "reads.fq"

    ref_out = tmp_path / "full.sam"
    eng = MappingEngine(fixture_index, cfg)
    with open(ref_out, "w") as f:
        eng.map_file(seq, f, "cmd")

    # interrupted run: process chunks 0-1, then "crash" mid-chunk 2 by
    # appending a torn partial line after the recorded offset
    out = tmp_path / "resumed.sam"
    prog = ChunkProgress(out, str(seq), chunk_bytes=cfg.chunk_bytes)

    class StopAfter(Exception):
        pass

    eng2 = MappingEngine(fixture_index, cfg)
    orig_mark = prog.mark_done
    done = []

    def mark_two(chunk_id, **kw):
        orig_mark(chunk_id, **kw)
        done.append(chunk_id)
        if chunk_id >= 1:
            raise StopAfter()

    prog.mark_done = mark_two
    with open(out, "w") as f:
        with pytest.raises(StopAfter):
            eng2.map_file(seq, f, "cmd", progress=prog)
        f.write("read999_torn\t0\tchr1\t123\t")  # torn mid-chunk write
    assert done == [0, 1]

    # resume: load sidecar, truncate to the durable offset, append
    prog2 = ChunkProgress(out, str(seq), chunk_bytes=cfg.chunk_bytes)
    assert prog2.load() == 1
    import os

    assert os.path.getsize(out) > prog2.out_offset
    with open(out, "r+") as f:
        f.truncate(prog2.out_offset)
    eng3 = MappingEngine(fixture_index, cfg)
    eng3.stats["reads"] = prog2.total_reads
    eng3.stats["mapped"] = prog2.total_mapped
    with open(out, "a") as f:
        eng3.map_file(seq, f, "cmd", progress=prog2)

    assert out.read_text() == ref_out.read_text()
    # sidecar cleaned up after completion
    assert not prog2.path.exists()


def test_resume_rejects_changed_input(fixture_index, tmp_path):
    """The sidecar refuses to resume when the input fingerprint or the
    chunking changed (ADVICE r1)."""
    from lordfast_tpu.utils.checkpoint import ChunkProgress

    seq = tmp_path / "in.fq"
    seq.write_text("@r1\nACGT\n+\nIIII\n")
    out = tmp_path / "o.sam"
    p = ChunkProgress(out, str(seq), chunk_bytes=1000)
    p.mark_done(3, out_offset=17)

    q = ChunkProgress(out, str(seq), chunk_bytes=1000)
    assert q.load() == 3 and q.out_offset == 17

    # different chunking
    assert ChunkProgress(out, str(seq), chunk_bytes=999).load() == -1
    # changed input contents (size differs)
    seq.write_text("@r1\nACGTACGT\n+\nIIIIIIII\n")
    assert ChunkProgress(out, str(seq), chunk_bytes=1000).load() == -1

"""Multi-host (DCN) path: per-host chunk ownership, SAM shard merge, and
a real 2-process jax.distributed integration run (SURVEY.md §5.8;
reference analogue: independent 100 MB chunks, src/baseFAST.cpp:64-78)."""

import io
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

DATA = Path(__file__).parent / "data"

TEST_CFG = dict(
    kmer_cache_k=8,
    max_seeds_per_read=1024,
    max_chain_seeds=128,
    max_candidates=16,
    batch_reads=16,
    chunk_bytes=40_000,  # several chunks out of the 60-read fixture
)


@pytest.fixture(scope="module")
def fixture_index(ref8_idx):
    return ref8_idx  # session-shared k=8 index (conftest.ref8_idx)


def test_chunk_sharding_and_merge(fixture_index, tmp_path):
    """Two in-process 'hosts' own alternating chunks; the ordered merge of
    their shards must equal the single-process SAM byte-for-byte."""
    from lordfast_tpu.config import LordfastConfig
    from lordfast_tpu.parallel.multihost import (merge_shards, shard_path,
                                                 write_chunk_table)
    from lordfast_tpu.pipeline.engine import MappingEngine

    cfg = LordfastConfig(**TEST_CFG)
    seq = DATA / "reads.fq"

    base = io.StringIO()
    eng = MappingEngine(fixture_index, cfg)
    eng.map_file(seq, base, "cmd")
    assert eng.stats["chunks"] >= 3, "fixture must split into chunks"

    out = tmp_path / "multi.sam"
    for pid in range(2):
        part = shard_path(out, pid)
        e = MappingEngine(fixture_index, cfg)
        with open(part, "w") as f:
            e.map_file(seq, f, "cmd", process_index=pid, num_processes=2)
        write_chunk_table(part, e.chunk_table)
        # each host owns its residue class only
        assert all(cid % 2 == pid for cid, _, _ in e.chunk_table)
        assert e.chunk_table, "both hosts must own work"

    n = merge_shards(out, 2)
    assert n == eng.stats["chunks"]
    assert out.read_text() == base.getvalue()
    # parts consumed by default
    assert not Path(shard_path(out, 0)).exists()


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_merge(tmp_path):
    """Full integration: two OS processes under one jax.distributed (CPU
    Gloo) runtime map shards of the committed fixture through the CLI and
    process 0 merges after the barrier; the merged SAM must equal a
    single-process run (modulo the @PG command line)."""
    from lordfast_tpu.config import LordfastConfig
    from lordfast_tpu.index.builder import (build_index, index_path_for,
                                            save_index)

    ref = tmp_path / "ref.fa"
    ref.write_bytes((DATA / "ref.fa").read_bytes())
    seq = DATA / "reads.fq"
    # pre-build a small-k index so the workers just load it
    idx = build_index(ref, LordfastConfig(kmer_cache_k=8), verbose=False)
    save_index(idx, index_path_for(ref))

    wrapper = tmp_path / "cpu_cli.py"
    wrapper.write_text(
        "import sys\n"
        "import jax\n"
        'jax.config.update("jax_platforms", "cpu")\n'
        "from lordfast_tpu.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).parent.parent)
    env.pop("XLA_FLAGS", None)

    def run_cli(args, **kw):
        return subprocess.run(
            [sys.executable, str(wrapper)] + args,
            env=env, capture_output=True, text=True, timeout=900, **kw
        )

    common = ["--search", str(ref), "--seq", str(seq),
              "--minReadLen", "100", "--chunkSize", "40000"]

    single = tmp_path / "single.sam"
    r = run_cli(common + ["-o", str(single)])
    assert r.returncode == 0, r.stderr[-2000:]

    port = _free_port()
    merged = tmp_path / "merged.sam"
    procs = [
        subprocess.Popen(
            [sys.executable, str(wrapper)] + common + [
                "-o", str(merged), "--numProcesses", "2",
                "--processIndex", str(pid),
                "--coordinator", f"localhost:{port}",
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]

    def body(path):
        return [l for l in Path(path).read_text().splitlines()
                if not l.startswith("@PG")]

    assert body(merged) == body(single)

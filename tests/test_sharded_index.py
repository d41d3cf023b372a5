"""Sharded-index mode (parallel/sharded_index.py) vs the replicated path.

The index arrays are striped over the 8-CPU-device mesh (conftest) and
every rank / SA lookup routed to the owning shard; outputs must be
bit-identical to the replicated pipeline (the routing changes data
placement, not semantics — lib/bwa/bwt.c:107-166)."""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lordfast_tpu.config import LordfastConfig
from lordfast_tpu.ops import fm_index as fmo
from lordfast_tpu.parallel.mesh import make_mesh, sharded_pipeline
from lordfast_tpu.parallel.sharded_index import (shard_index_arrays,
                                                 sharded_index_pipeline)

CFG = dict(
    kmer_cache_k=6,
    sampling_count=64,
    max_seeds_per_read=512,
    max_chain_seeds=128,
    max_candidates=16,
    batch_reads=16,
)


def _batch_from_index(small_index, rng, B=16, L=512):
    """Reads sampled from the small fixture genome with noise."""
    idx, contigs = small_index
    text = np.concatenate([np.asarray(v) for v in contigs.values()])
    reads = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for j in range(B):
        ln = int(rng.integers(200, L))
        st = int(rng.integers(0, len(text) - ln))
        frag = text[st : st + ln].astype(np.uint8)
        mut = rng.random(ln) < 0.08
        frag = np.where(mut, rng.integers(0, 4, ln), frag).astype(np.uint8)
        if rng.random() < 0.5:
            frag = (3 - frag[::-1]).astype(np.uint8)
        reads[j, :ln] = frag
        lens[j] = ln
    return reads, lens


def _run_both(idx, cfg, reads, lens, mesh):
    pos = fmo.sample_positions_host(lens, cfg.sampling_count)
    repl_fn = sharded_pipeline(idx, cfg, mesh)
    seeds_r, _, host_r = repl_fn(reads, lens, pos)
    sh_fn, sh_arrs = sharded_index_pipeline(idx, cfg, mesh)
    seeds_s, _, host_s = sh_fn(sh_arrs, reads, lens, pos)
    return jax.device_get((seeds_r, host_r)), jax.device_get(
        (seeds_s, host_s)
    )


def _assert_equal_trees(a, b):
    fa, ta = jax.tree_util.tree_flatten(a)
    fb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_index_pipeline_matches_replicated(small_index, rng, n_dev):
    idx, _ = small_index
    cfg = LordfastConfig(**CFG)
    reads, lens = _batch_from_index(small_index, rng)
    mesh = make_mesh(jax.devices()[:n_dev])
    (seeds_r, host_r), (seeds_s, host_s) = _run_both(
        idx, cfg, reads, lens, mesh
    )
    _assert_equal_trees(seeds_r, seeds_s)
    _assert_equal_trees(host_r, host_s)


def test_sharded_index_sa_walk_and_fallback_layout(small_index, rng):
    """Exercise the two layouts the big-genome path uses: sampled SA
    (interval 32 -> routed inverse-Psi walk) and the non-fused
    occ_cp/bwt_blocks rank layout (l_pac >= 2^32 fallback), forced here
    on the small fixture."""
    import dataclasses

    idx, _ = small_index
    idx32 = dataclasses.replace(
        idx,
        sa_samp=np.ascontiguousarray(idx.sa_samp[::32]),
        sa_intv=32,
        _device=None,
    )
    # force the fallback rank layout on both paths
    orig = idx32.host_arrays()
    assert "fm_blocks" in orig

    def forced_host_arrays():
        h = dict(orig)
        fused = h.pop("fm_blocks")
        h["occ_cp"] = np.ascontiguousarray(fused[:, :4])
        h["bwt_blocks"] = np.ascontiguousarray(fused[:, 4:])
        return h

    idx32.host_arrays = forced_host_arrays

    cfg = LordfastConfig(**CFG)
    reads, lens = _batch_from_index(small_index, rng)
    mesh = make_mesh(jax.devices())
    (seeds_r, host_r), (seeds_s, host_s) = _run_both(
        idx32, cfg, reads, lens, mesh
    )
    _assert_equal_trees(seeds_r, seeds_s)
    _assert_equal_trees(host_r, host_s)
    # and the forced layout still matches the default full-SA fused run
    (seeds_d, host_d), _ = _run_both(idx, cfg, reads, lens, mesh)
    _assert_equal_trees(seeds_d, seeds_r)


def test_sharded_index_engine_sam_identical(small_index, tmp_path, rng):
    """End-to-end: MappingEngine(shard_index=True) must emit the exact
    SAM of the plain single-device engine."""
    from lordfast_tpu.pipeline.engine import MappingEngine

    idx, contigs = small_index
    text = np.concatenate([np.asarray(v) for v in contigs.values()])
    fq = tmp_path / "reads.fq"
    with open(fq, "w") as f:
        for i in range(12):
            ln = int(rng.integers(300, 900))
            st = int(rng.integers(0, len(text) - ln))
            frag = text[st : st + ln].astype(np.uint8)
            mut = rng.random(ln) < 0.08
            frag = np.where(mut, rng.integers(0, 4, ln), frag)
            s = "".join("ACGT"[c] for c in frag)
            f.write(f"@r{i}\n{s}\n+\n{'I' * ln}\n")

    cfg = LordfastConfig(**CFG).replace(min_read_len=100)

    def run(**kw):
        out = io.StringIO()
        MappingEngine(idx, cfg, **kw).map_file(fq, out, "t")
        return out.getvalue()

    base = run()
    sharded = run(mesh=make_mesh(jax.devices()), shard_index=True)
    assert sharded == base

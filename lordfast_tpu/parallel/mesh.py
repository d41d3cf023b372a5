"""Multi-chip scale-out: data parallelism over reads.

The reference's only parallelism is a pthread pool over reads
(src/LordFAST.cpp:305-316); the TPU-native equivalent is sharding the
read-batch axis across the chips of a slice with the FM-index replicated
(SURVEY.md §2.5, §5.8).  All device stages (seeding, voting, window seed
selection, chaining) are batched on axis 0, so a NamedSharding on that
axis partitions the whole pipeline; XLA inserts no cross-chip collectives
on the hot path (the index is replicated; per-read state never crosses
chips).

For genome-scale sharded-index operation see parallel/sharded_index.py
(planned): interval-routed Occ lookups over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import chain as chain_ops
from ..ops import fm_index as fm_ops
from ..ops import voting as vote_ops


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def device_pipeline(arrs, meta, cfg):
    """The full device stage as one pure jittable function of
    (reads, lens, pos).  meta/cfg are closed over (static)."""
    meta_t = tuple(sorted((k, v) for k, v in meta.items()
                          if k != "pos_dtype"))

    def fn(reads, lens, pos):
        seeds = fm_ops._seed_anchors_impl(
            arrs, reads, lens, pos, meta_t,
            cfg.sampling_count, cfg.min_anchor_len, cfg.max_ref_hits,
            cfg.max_seeds_per_read,
        )
        cands = vote_ops.vote_windows(seeds, lens, cfg)
        k_windows = reads.shape[0] * cfg.compact_windows_per_read
        cw = chain_ops.compact_candidates(cands, cfg, k_windows)
        ws = chain_ops.select_window_seeds(seeds, cw, lens, arrs, cfg)
        chains = chain_ops.chain_dpn2(ws, cfg)
        return seeds, cands, cw, chains

    return fn


def sharded_pipeline(idx, cfg, mesh: Mesh):
    """jit the device pipeline with the read axis sharded over the mesh
    and the index replicated."""
    repl = NamedSharding(mesh, P())
    shard0 = NamedSharding(mesh, P("data"))
    arrs = idx.device_arrays(sharding=repl)
    fn = device_pipeline(arrs, idx.meta, cfg)
    return jax.jit(
        fn,
        in_shardings=(shard0, shard0, shard0),
        out_shardings=None,
    )

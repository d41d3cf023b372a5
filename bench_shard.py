"""Sharded-index lookup cost: routed all_to_all vs all-gather pattern.

Measures wall time of the sharded seeding stage on a forced 8-device CPU
mesh with each routing (the owner-routed all_to_all of
parallel/sharded_index.py vs the all-gather + psum_scatter fallback) and
prints the per-backward-step collective byte budget (analytic; a CPU
mesh cannot measure ICI, but bytes/step is machine-independent).

Writes BENCH_SHARD.json next to this file so the README's routed-vs-
all-gather claim reproduces from a tracked artifact:
  python bench_shard.py
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
sys.path.insert(0, str(Path(__file__).parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import __graft_entry__ as g  # noqa: E402
from lordfast_tpu.ops import fm_index as fm_ops  # noqa: E402
from lordfast_tpu.parallel.mesh import make_mesh  # noqa: E402
from lordfast_tpu.parallel.sharded_index import (  # noqa: E402
    sharded_index_pipeline,
)


def main():
    idx, cfg, reads, lens = g._small_setup()
    D = 8
    mesh = make_mesh(jax.devices()[:D])
    B = 4 * D
    reps = -(-B // len(reads))
    reads = np.tile(reads, (reps, 1))[:B]
    lens = np.tile(lens, reps)[:B]
    pos = fm_ops.sample_positions_host(lens, cfg.sampling_count)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    args = (jax.device_put(jnp.asarray(reads), sh),
            jax.device_put(jnp.asarray(lens), sh),
            jax.device_put(jnp.asarray(pos), sh))

    def timeit(tag):
        fn, arrs = sharded_index_pipeline(idx, cfg, mesh)
        r = fn(arrs, *args)
        jax.device_get(r[2]["chain_len"].sum())  # compile + warm
        t0 = time.time()
        for _ in range(3):
            r = fn(arrs, *args)
            jax.device_get(r[2]["chain_len"].sum())
        ms = (time.time() - t0) / 3 * 1e3
        print(f"  {tag}: {ms:.0f} ms/seed-batch")
        return ms

    print(f"[shard] mesh D={D}, B={B}, S={cfg.sampling_count}")
    ms_routed = timeit("routed all_to_all")
    orig = fm_ops._row_gather_routed
    fm_ops._row_gather_routed = fm_ops._row_gather_ag
    try:
        ms_ag = timeit("all-gather + psum_scatter")
    finally:
        fm_ops._row_gather_routed = orig

    # analytic bytes per backward-search step, per device (the CPU mesh
    # cannot measure ICI; byte counts are machine-independent)
    out = {
        "mesh_devices": D,
        "wall_ms_routed": round(ms_routed, 1),
        "wall_ms_allgather": round(ms_ag, 1),
        "byte_budget": [],
    }
    for Q, name in ((2 * B // D * cfg.sampling_count, "this dryrun"),
                    (2 * 128 // 8 * 1000, "bench shapes (B=128, D=8)")):
        val = 48  # fused rank row bytes
        rid = 8
        cap = (-(-2 * Q // D) + 7) & ~7
        # per device per step: a2a row ids out/in (D*cap ids) + a2a
        # value rows back
        routed = D * cap * (rid + val)
        # all-gather receives (D-1)*Q ids; ring reduce-scatter moves
        # (D-1)/D of the full (D*Q) value payload through each device
        ag = (D - 1) * Q * rid + (D - 1) * Q * val
        print(f"[shard] {name}: Q={Q} rank rows/device/step | "
              f"routed {routed/1e3:.0f} kB vs all-gather {ag/1e3:.0f} kB "
              f"-> {ag/routed:.1f}x fewer bytes")
        out["byte_budget"].append({
            "config": name, "rows_per_device_step": Q,
            "routed_bytes": routed, "allgather_bytes": ag,
            "ratio": round(ag / routed, 2),
        })
    path = Path(__file__).parent / "BENCH_SHARD.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"[shard] wrote {path}")


if __name__ == "__main__":
    main()

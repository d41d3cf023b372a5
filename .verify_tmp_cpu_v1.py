import os, sys, io, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
from pathlib import Path
from lordfast_tpu.config import LordfastConfig
from lordfast_tpu.index.builder import load_index
from lordfast_tpu.pipeline.engine import MappingEngine
CACHE = Path("/root/repo/.bench_cache_big")
idx = load_index(CACHE / "v1_bench_index.npz", mmap=True)
eng = MappingEngine(idx, LordfastConfig())
t0 = time.time()
with open("/tmp/v1_cpu.sam", "w") as f:
    eng.map_file(str(CACHE / "v1_bench_reads.fq"), f, "cpu-v1")
print(f"done {time.time()-t0:.0f}s", flush=True)

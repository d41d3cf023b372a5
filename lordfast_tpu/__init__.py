"""lordfast-tpu: a TPU-native long-read alignment engine.

A from-scratch reimplementation of the capabilities of lordFAST
(vpc-ccg/lordfast; Haghshenas, Sahinalp, Hach, Bioinformatics 2018) built
on JAX/XLA/Pallas for TPUs:

- FM-index anchoring as batched device kernels (reference:
  ``src/BWT.cpp:312-394``),
- window voting / candidate selection as sparse segment ops
  (``src/LordFAST.cpp:582-904``),
- seed chaining (dp-n2 / clasp-SOP semantics) as masked scans
  (``src/Chain.cpp``),
- Myers bit-parallel and affine-gap banded DP extension as batched
  device kernels (``lib/edlib/edlib.cpp``, ``lib/bwa/ksw.c``),
- SAM emission on the host, equivalent to the reference
  (``src/LordFAST.cpp:318-459``).

Reads are the data-parallel axis across chips of a slice; the index is
replicated (or sharded for genome-scale deployments).  Host code handles
sequential I/O (FASTA/FASTQ parsing, index construction, SAM formatting).

64-bit positions: genome coordinates for human-scale references exceed
2**31 (the concatenated fwd+revcomp text is ~6.2e9 bases), so this package
enables jax_enable_x64 at import.  All kernels pick int32/int64 explicitly
based on the index size, so small-genome paths still run in 32-bit.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the device stage is one large jitted
# function compiled once per read-length bucket (~minutes on a tunneled
# backend); caching compiled executables on disk makes every run after the
# first start in seconds.  Opt out with LORDFAST_NO_COMPILE_CACHE=1.
if not _os.environ.get("LORDFAST_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "LORDFAST_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                      ".jax_cache"),
    )
    # XLA:CPU's AOT cache is unreliable in this jax build: reloading a
    # cached CPU executable can hard-ABORT the process (machine-feature
    # mismatch, "Fatal Python error: Aborted" with no message) — seen as
    # flaky crashes in the CPU-forced test suite.  The persistent cache
    # therefore only serves non-CPU backends (where it saves the
    # multi-minute tunneled TPU compiles); forced-CPU processes always
    # compile fresh.
    _plat = _os.environ.get("JAX_PLATFORMS", "").strip()
    # a process may also force CPU programmatically before importing this
    # package (jax.config.update("jax_platforms", "cpu")) — honor both
    _plat_cfg = (getattr(_jax.config, "jax_platforms", None) or "").strip()
    if _plat == "cpu" or _plat_cfg == "cpu":
        _cache_dir = None
    if _cache_dir is not None:
        try:
            _os.makedirs(_cache_dir, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
        except Exception:  # cache is best-effort
            pass

__version__ = "0.1.0"

from .config import LordfastConfig  # noqa: E402,F401

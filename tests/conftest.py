"""Test configuration: force an 8-device CPU mesh before JAX initializes
so pjit/shard_map paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# The session environment may pin an experimental TPU platform plugin that
# overrides JAX_PLATFORMS at import; forcing via jax.config is reliable.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: compiled-on-TPU checks (skipped when no TPU is attached)",
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def small_index():
    """A small random-genome FM index shared across tests."""
    from lordfast_tpu.config import LordfastConfig
    from lordfast_tpu.index.builder import build_index
    import tempfile

    r = np.random.default_rng(7)
    contigs = {
        "chrA": r.integers(0, 4, size=20011),
        "chrB": r.integers(0, 4, size=9973),
    }
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        for name, codes in contigs.items():
            f.write(f">{name}\n")
            seq = "".join("ACGT"[c] for c in codes)
            for i in range(0, len(seq), 70):
                f.write(seq[i : i + 70] + "\n")
        path = f.name
    cfg = LordfastConfig(kmer_cache_k=6)
    idx = build_index(path, cfg, verbose=False)
    return idx, contigs

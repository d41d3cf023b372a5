"""Mosaic-compiled kernel oracle job (VERDICT r3 missing #4 / task 8).

The pytest session forces an 8-device CPU mesh (conftest.py), so the
compiled-on-TPU checks run in a SUBPROCESS with a clean backend: when a
real TPU is attached, tests/tpu_compiled_check.py runs the Myers
(non-tiled + tiled) and affine kernels through the actual Mosaic
lowering against the host oracles; without one it exits 42 and the test
skips.  The verify skill runs this on the chip."""

import subprocess
import sys
from pathlib import Path

import pytest

SCRIPT = Path(__file__).parent / "tpu_compiled_check.py"


@pytest.mark.tpu
def test_tpu_compiled_kernels_vs_oracles():
    import os

    # inherit the session env (the TPU plugin needs it) but undo
    # conftest's CPU force so the subprocess can grab the chip
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, str(SCRIPT)],
        capture_output=True, text=True, timeout=3000, env=env,
    )
    if r.returncode == 42:
        pytest.skip("no TPU backend in subprocess")
    sys.stderr.write(r.stderr[-2000:])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

"""Pytest wrapper for the real-TPU smoke gate (benchmarks/tpu_smoke.py).

The rest of the suite runs the Pallas kernels in interpret mode on CPU; a
Mosaic-lowering regression would pass everything there.  This test launches
the smoke gate as a subprocess under the DEFAULT environment (the test
process itself is pinned to CPU by conftest) so the kernels compile and run
on the actual chip.  Skipped when the environment has no TPU platform
configured, or under TPU_SMOKE=0 (e.g. when another process owns the TPU
tunnel — only one may use it at a time).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.tpu
def test_tpu_smoke_gate():
    if os.environ.get("TPU_SMOKE", "1") == "0":
        pytest.skip("TPU_SMOKE=0")
    # conftest pins the test process (and os.environ) to CPU; the launch
    # environment's platform was stashed before that.
    platforms = os.environ.get("_PRE_CONFTEST_JAX_PLATFORMS", "")
    if platforms and not any(p in platforms for p in ("tpu", "axon")):
        pytest.skip(f"no TPU platform configured (JAX_PLATFORMS={platforms})")

    env = dict(os.environ)
    if platforms:
        env["JAX_PLATFORMS"] = platforms
    else:
        # Platform unset in the launch env: probe the default backend in a
        # subprocess (this process is CPU-pinned) — a CPU-only machine must
        # SKIP, not spend minutes failing to Mosaic-compile on CPU.
        env.pop("JAX_PLATFORMS", None)
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=300, env=env,
        )
        backend = probe.stdout.strip().splitlines()[-1] if probe.stdout else ""
        if probe.returncode != 0 or backend not in ("tpu", "axon"):
            pytest.skip(f"default backend is {backend or 'unavailable'}")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "tpu_smoke.py")],
        capture_output=True, text=True, timeout=3000, cwd=REPO, env=env,
    )
    assert out.returncode == 0, (out.stdout + out.stderr)[-3000:]
    verdict = json.loads(out.stdout.strip().splitlines()[-1])
    assert verdict["metric"] == "tpu_smoke"
    assert verdict["pass"] is True, verdict

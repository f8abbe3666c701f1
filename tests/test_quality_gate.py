"""The cross-backend quality gate script stays runnable (CPU, xla backend).

The real gate runs on TPU across xla/pallas/fused (see benchmarks/quality.py
and CLAUDE.md's numerics invariants); this keeps the harness itself from
rotting: it must run end to end, emit valid JSON, and pass trivially when
comparing a backend against itself.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quality_seed_sweep_harness():
    """The seed-sweep harness (benchmarks/quality_sweep.py) must run end to
    end and emit per-seed deltas + sign statistics (the real sweep runs on
    TPU across xla/pallas/fused; see QUALITY_SWEEP_r03.json)."""
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "quality_sweep.py"),
         "--seeds", "0,1", "--batch", "32", "--backends", "xla"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    verdict = json.loads(out.stdout.strip().splitlines()[-1])
    assert verdict["metric"] == "quality_seed_sweep"
    assert len(verdict["per_seed"]) == 2


def test_quality_gate_cpu_xla():
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "quality.py"),
         "--batch", "64", "--inner", "5", "--backends", "xla,xla"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    verdict = json.loads(out.stdout.strip().splitlines()[-1])
    assert verdict["metric"] == "quality_distribution_gate"
    assert verdict["pass"] is True
    stats = verdict["backends"]["xla"]
    assert 0.0 <= stats["converged_frac"] <= 1.0
    assert stats["avg_cost_mean"] > 0.0

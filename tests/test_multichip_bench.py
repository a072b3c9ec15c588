"""The one-command multichip benchmark must compile, run, and keep the
camera axis sharded on the virtual 8-device mesh (docs/SCALING.md round 5;
the real-hardware path is the same code with real devices)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def test_bench_multichip_validate_runs_sharded():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "examples/bench_multichip.py", "--validate",
         "--cams-per-device", "1"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "validate OK: outputs sharded over 8 devices" in r.stdout
    assert '"n_devices": 8' in r.stdout

"""Test harness: force a virtual 8-device CPU platform before JAX loads.

Multi-chip hardware is unavailable in CI; sharding tests run against an
8-device host mesh (xla_force_host_platform_device_count), per the build
contract. Pallas kernels run in interpret mode on CPU (handled inside the
kernels via ``ocean_perception_tpu.ops.pallas.runtime``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu" at
# interpreter start; re-pin to CPU before any backend initializes so tests run
# on the virtual 8-device host platform.
jax.config.update("jax_platforms", "cpu")

# VIO / geometry tests need f64; image kernels request f32 explicitly.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng(request):
    """Per-test deterministic generator, seeded from the test id.

    A session-scoped shared generator made every test's data depend on how
    many draws EARLIER tests consumed — adding a test anywhere reshuffled
    the data of every test after it (observed: a borderline odometry case
    appearing only in full-suite runs). Order-independent by construction."""
    import zlib

    seed = zlib.adler32(request.node.nodeid.encode()) & 0xFFFFFFFF
    return np.random.default_rng(seed)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Bound the process RSS across the suite: every module compiles its own
    jitted programs and almost none are shared across modules, so dropping
    the caches between modules trades (near-zero) recompiles for memory.
    The full suite previously segfaulted inside an XLA CPU compile near the
    end of a single-process run from accumulated compile-cache pressure."""
    yield
    jax.clear_caches()


REFERENCE_DIR = os.environ.get("OCEAN_REFERENCE_DIR", "/root/reference")


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "test", "resources"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference fixture images not mounted"
)

"""Restore JAX's own `JAX_PLATFORMS` env contract under the axon plugin.

The axon TPU plugin registers itself at interpreter start (sitecustomize)
and force-sets `jax_platforms="axon,cpu"`, silently overriding the
`JAX_PLATFORMS` environment variable. Any subprocess launched with
`JAX_PLATFORMS=cpu` (the two-process fabric tests, CI, a shore laptop with
no TPU tunnel) therefore still tries to initialize the remote TPU backend
— and hangs or dies whenever the tunnel is down.

Every node CLI calls `honor_jax_platforms_env()` first thing in `main()`,
before anything can initialize a backend; library code never calls it.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (verified working through
    the axon remote-compile tunnel: executables are serialized client-side,
    so a cached program skips the 1-5 min remote Mosaic/XLA compile
    entirely). Called by bench.py and the TPU-facing examples; tests and
    CPU-only tools don't bother (CPU compiles are fast and the cache would
    churn).

    No-op (with a stderr note) when `JAX_PLATFORMS` pins a CPU-only run —
    CPU compiles are fast and the cache would churn.

    Default location: `<repo>/.jax_cache` for a source checkout; for an
    installed package (platform.py under site-packages, possibly read-only)
    the user cache dir `~/.cache/ocean_perception_tpu/jax_cache` instead.
    Overridable via `JAX_COMPILATION_CACHE_DIR` or the argument."""
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and all(p.strip() == "cpu" for p in plat.split(",") if p.strip()):
        return
    cache = path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        if os.path.basename(repo_root) == "site-packages" or not os.access(
            repo_root, os.W_OK
        ):
            cache = os.path.join(
                os.path.expanduser("~"), ".cache", "ocean_perception_tpu",
                "jax_cache",
            )
        else:
            cache = os.path.join(repo_root, ".jax_cache")
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # Cache everything that took a remote round-trip (default 1 s
        # threshold skips trivial programs, which is what we want).
    except Exception as e:  # exotic jax version or read-only fs: best effort
        import sys

        print(f"warning: compile cache disabled ({cache}: {e})",
              file=sys.stderr)


def honor_jax_platforms_env() -> None:
    """If `JAX_PLATFORMS` is set, re-apply it over any plugin override.

    No-op when the variable is unset or a backend is already initialized
    (config changes after init would be ignored anyway)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:  # backend already up, or exotic jax version: best effort
        pass

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

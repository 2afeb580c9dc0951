"""Platform selection that actually works under the axon site bootstrap.

This environment's ``sitecustomize`` imports jax at interpreter startup and
registers the remote-TPU ("axon") backend, so by the time a script body
runs, ``JAX_PLATFORMS`` from the shell env is already baked into jax's
config defaults — exporting ``JAX_PLATFORMS=cpu`` silently does nothing and
the "CPU" run crawls through the remote tunnel at ~0.1 fps. The fix (same
one tests/conftest.py uses) is to update the config OBJECT before the first
backend initialization.

Call :func:`apply_platform_env` first thing in every CLI entry point.
"""

from __future__ import annotations

import os


def apply_platform_env(default: str | None = None) -> str | None:
    """Honor ``JAX_PLATFORMS`` (or ``default``) via jax.config.

    Safe to call multiple times; no-op once backends are initialized with
    the same platform. Returns the platform string applied (or None).
    """
    plat = os.environ.get("JAX_PLATFORMS") or default
    if not plat:
        return None
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:
        # Backends already initialized (e.g. library use mid-process):
        # leave them alone rather than crash the caller.
        pass
    return plat

"""Platform selection for CLI entry points.

The deployment environment's sitecustomize pins ``JAX_PLATFORMS`` at
interpreter start, so plain env vars are too late for users who want to run
a CLI on CPU (smoke tests, laptops). ``HAIRCI_PLATFORM=cpu`` (or
``HAIRCI_FORCE_CPU=1``) routes through ``jax.config`` instead, which works
as long as it runs before the first backend touch — hence every CLI
``main()`` calls this first."""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("HAIRCI_PLATFORM", "")
    if not plat and os.environ.get("HAIRCI_FORCE_CPU", "") not in ("", "0"):
        plat = "cpu"
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

"""Persistent XLA compilation cache for every hairci entry point.

On the axon relay TPU a cold compile of a big training graph has measured
anywhere from 80 s to 853 s for the same graph (BENCH_RESULTS.md caveats);
the persistent cache is verified to work through the relay (cross-process
recompile 1.08 s -> 0.10 s), so enabling it makes every second run of a
CLI/Trainer start in seconds. The reference has no equivalent concern —
PyTorch eager has no whole-graph compile step.

Call ``enable_compilation_cache()`` before the first jit compilation; it
is idempotent and silently no-ops if the running JAX lacks the config
knobs. ``HAIRCI_JIT_CACHE`` overrides the cache directory (bench.py pins
its own repo-local dir so the driver's run always hits the warmed cache).
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "hairci", "jit")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``$HAIRCI_JIT_CACHE`` or ``~/.cache/hairci/jit``). Returns the active
    path, or None if the cache could not be enabled."""
    path = path or os.environ.get("HAIRCI_JIT_CACHE") or _DEFAULT
    try:
        import jax

        # CPU-backend runs (test suite, driver dryrun) skip the cache
        # unless HAIRCI_JIT_CACHE explicitly opts in: XLA:CPU AOT reload
        # spams machine-feature-mismatch errors (+prefer-no-gather/scatter
        # pseudo-features absent from host detection) and warns of SIGILL,
        # and CPU compiles aren't the 80-853 s relay pathology this cache
        # exists for.
        if (jax.default_backend() == "cpu"
                and not os.environ.get("HAIRCI_JIT_CACHE")):
            log.info("persistent compilation cache skipped on cpu backend")
            return None
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - version-dependent knobs
        log.info("persistent compilation cache unavailable: %s", e)
        return None
    return path

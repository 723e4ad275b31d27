"""Persistent-compilation-cache plumbing (`hairci/utils/jit_cache.py`).

The cache exists for the axon relay's 80-1,176 s cold-compile band
(BENCH_RESULTS.md "Persistent-cache finding"); on the CPU backend it must
stay OFF by default because XLA:CPU AOT reloads spam machine-feature
mismatch errors on this host. These tests pin both sides of that gate.
"""

import os
import subprocess
import sys

from hairci.utils import enable_compilation_cache

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cpu_backend_skips_by_default(monkeypatch):
    """The suite runs on the forced-CPU conftest mesh: without an explicit
    HAIRCI_JIT_CACHE opt-in the cache must not be enabled (returns None,
    config untouched)."""
    monkeypatch.delenv("HAIRCI_JIT_CACHE", raising=False)
    import jax

    assert jax.default_backend() == "cpu"
    before = jax.config.jax_compilation_cache_dir
    assert enable_compilation_cache() is None
    assert jax.config.jax_compilation_cache_dir == before


def test_explicit_optin_sets_config(tmp_path):
    """HAIRCI_JIT_CACHE overrides the CPU skip (bench.py pins a repo-local
    dir this way). Run in a subprocess so this process's JAX config stays
    pristine for the rest of the suite."""
    cache = tmp_path / "jit"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from hairci.utils import enable_compilation_cache\n"
        "p = enable_compilation_cache()\n"
        "assert p == jax.config.jax_compilation_cache_dir, (p,)\n"
        "assert jax.config.jax_persistent_cache_min_compile_time_secs == 2.0\n"
        "print('OK', p)\n"
    )
    env = dict(os.environ, HAIRCI_JIT_CACHE=str(cache), JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=ROOT,
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"OK {cache}" in out.stdout

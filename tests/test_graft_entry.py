"""Exercise the driver hooks in ``__graft_entry__.py``.

Round-1 verdict: ``MULTICHIP_r01.json`` was red because ``dryrun_multichip``
ran on the 1-device axon platform and nothing in ``tests/`` had ever driven
the hook.  These tests drive both hooks, including the subprocess fallback
path that self-hosts the virtual CPU mesh under driver conditions (no
conftest platform forcing in the child).
"""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__  # noqa: E402


def test_entry_traces_and_lowers():
    fn, args = __graft_entry__.entry()
    lowered = jax.jit(fn).lower(*args)
    text = lowered.as_text()
    assert "stablehlo" in text or "module" in text


def test_dryrun_multichip_inprocess():
    # conftest forces an 8-device virtual CPU backend, so the direct
    # (no-subprocess) path runs here.
    assert jax.default_backend() == "cpu" and len(jax.devices()) >= 8
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_self_hosts_without_conftest():
    """Driver conditions: a clean interpreter whose backend is NOT an
    8-device CPU mesh.  ``dryrun_multichip`` must build its own virtual mesh
    via the subprocess fallback."""
    child = (
        "import jax, sys\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    env = dict(os.environ)
    # Make sure the child does NOT inherit the conftest's virtual device
    # count — the hook itself must add it.
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    proc = subprocess.run(
        [sys.executable, "-c", child], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SHAM staged steps ok" in proc.stdout
    assert "TP margin head ok" in proc.stdout
    assert "DINOv2 ViT dp step ok" in proc.stdout

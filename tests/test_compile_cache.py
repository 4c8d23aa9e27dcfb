"""Persistent XLA compilation cache wiring (utils/config.py).

The cache itself is JAX's; these tests cover OUR wiring: package import
points jax at the cache dir, the env kill-switch works, and a compiled
program actually lands in the directory (so fresh processes — and the
axon relay's 20s-5min compiles — reuse it)."""

import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


def test_package_import_sets_cache_dir():
    import jax

    import hyperbolic_vae_tpu  # noqa: F401  (import triggers the wiring)

    from hyperbolic_vae_tpu.utils.config import COMPILE_CACHE_PATH

    assert jax.config.jax_compilation_cache_dir == str(COMPILE_CACHE_PATH)


def test_env_kill_switch(tmp_path):
    """HVT_NO_COMPILE_CACHE=1 must leave the jax config untouched
    (fresh subprocess: the wiring runs at import time)."""
    code = (
        "import jax, hyperbolic_vae_tpu;"
        "print(repr(jax.config.jax_compilation_cache_dir))"
    )
    env = dict(
        os.environ, HVT_NO_COMPILE_CACHE="1", PYTHONPATH=str(REPO_ROOT),
        JAX_PLATFORMS="cpu",
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "None"


def test_compiled_program_lands_in_cache(tmp_path):
    """A jitted program (compile time forced cacheable) writes an entry."""
    code = (
        "import jax, jax.numpy as jnp;"
        "jax.config.update('jax_platforms', 'cpu');"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1);"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0);"
        "print(float(jax.jit(lambda x: (jnp.sin(x) * 3.25).sum())(jnp.arange(64.0))))"
    )
    env = dict(
        os.environ, HVT_COMPILE_CACHE=str(tmp_path / "cc"),
        PYTHONPATH=str(REPO_ROOT), JAX_PLATFORMS="cpu",
    )
    out = subprocess.run(
        [sys.executable, "-c", "import hyperbolic_vae_tpu;" + code],
        env=env, capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    entries = list((tmp_path / "cc").iterdir())
    assert entries, "no cache entry written"

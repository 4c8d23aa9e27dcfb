"""Persistent XLA compilation cache wiring (utils/config.py).

The cache itself is JAX's; these tests cover OUR wiring: package import
points jax at the cache dir (except on CPU-forced runs), the env kill
switch works, and a compiled program actually lands in the directory
(so fresh processes — and the axon relay's 20s-5min compiles — reuse
it). Subprocess-based: the wiring runs at import time."""

import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


def _run(code: str, **env_overrides):
    env = dict(os.environ, PYTHONPATH=str(REPO_ROOT))
    env.pop("HVT_NO_COMPILE_CACHE", None)  # conftest sets it for THIS proc
    env.pop("HVT_COMPILE_CACHE", None)
    for k, v in env_overrides.items():
        if v is None:
            env.pop(k, None)
        else:
            env[k] = v
    return subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )


def test_package_import_sets_cache_dir(tmp_path):
    out = _run(
        "import hyperbolic_vae_tpu, jax;"
        "print(repr(jax.config.jax_compilation_cache_dir))",
        HVT_COMPILE_CACHE=str(tmp_path / "cc"), JAX_PLATFORMS="cpu",
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == repr(str(tmp_path / "cc"))


def test_env_kill_switch():
    out = _run(
        "import hyperbolic_vae_tpu, jax;"
        "print(repr(jax.config.jax_compilation_cache_dir))",
        HVT_NO_COMPILE_CACHE="1", JAX_PLATFORMS="cpu",
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "None"


def test_cpu_forced_runs_skip_cache_by_default():
    """JAX_PLATFORMS=cpu without an explicit dir: cache off (CPU AOT
    entries are machine-feature-sensitive across processes)."""
    out = _run(
        "import hyperbolic_vae_tpu, jax;"
        "print(repr(jax.config.jax_compilation_cache_dir))",
        JAX_PLATFORMS="cpu",
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "None"


def test_compiled_program_lands_in_cache(tmp_path):
    code = (
        "import hyperbolic_vae_tpu;"
        "import jax, jax.numpy as jnp;"
        "jax.config.update('jax_platforms', 'cpu');"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1);"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0);"
        "print(float(jax.jit(lambda x: (jnp.sin(x) * 3.25).sum())(jnp.arange(64.0))))"
    )
    out = _run(code, HVT_COMPILE_CACHE=str(tmp_path / "cc"), JAX_PLATFORMS="cpu")
    assert out.returncode == 0, out.stderr
    entries = list((tmp_path / "cc").iterdir())
    assert entries, "no cache entry written"

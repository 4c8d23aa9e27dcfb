"""Path constants (reference hyperbolic_vae/config.py:4-6) and the
persistent XLA compilation cache."""

import os
from pathlib import Path

PROJECT_ROOT = Path(__file__).resolve().parent.parent.parent
DATA_PATH = PROJECT_ROOT / "data"
CHECKPOINTS_PATH = PROJECT_ROOT / "checkpoints"
RUNS_PATH = PROJECT_ROOT / "runs"

COMPILE_CACHE_PATH = Path(
    os.environ.get("HVT_COMPILE_CACHE") or "~/.cache/hyperbolic_vae_tpu/xla"
).expanduser()


def enable_compilation_cache(cache_dir=None) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    On remote-relay TPU backends (axon) even a trivial program costs
    tens of seconds to compile; the persistent cache makes every
    subsequent PROCESS reuse it (measured on this chip: 67 s -> 0.45 s
    for the same program in a fresh interpreter). Keyed by program +
    platform/topology, so CPU test runs and TPU runs never collide.
    Called automatically at package import; disable with
    ``HVT_NO_COMPILE_CACHE=1`` or redirect with ``HVT_COMPILE_CACHE``.

    Returns False (and stays silent) when the cache cannot be set up —
    e.g. read-only filesystem or a jax without the config — since the
    cache is an optimization, never a requirement.
    """
    if os.environ.get("HVT_NO_COMPILE_CACHE"):
        return False
    cpu_forced = (
        os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"
        or os.environ.get("HVAE_FORCE_CPU")  # experiments' CPU switch
    )
    if cpu_forced and not os.environ.get("HVT_COMPILE_CACHE") and cache_dir is None:
        # CPU-forced runs (tests, dryruns, HVAE_FORCE_CPU experiment
        # runs): compiles are fast and CPU AOT entries are
        # machine-feature-sensitive across processes (XLA warns about
        # SIGILL risk on reuse) — not worth caching unless the user
        # opted in with an explicit dir.
        return False
    try:
        import jax

        path = Path(cache_dir) if cache_dir else COMPILE_CACHE_PATH
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        return True
    except Exception:
        return False

"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

Note: this image's sitecustomize registers the TPU (axon) backend at
interpreter start and sets jax_platforms itself, so the env var alone is
not enough — we must override the jax config after import, before any
array is created.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# CPU test tier: skip the persistent compile cache (fast compiles; CPU
# AOT entries are machine-feature-sensitive across processes)
os.environ.setdefault("HVT_NO_COMPILE_CACHE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

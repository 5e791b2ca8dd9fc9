import os
import sys

# Multi-chip tests run on a virtual 8-device CPU mesh; real-TPU benches run
# outside pytest.  Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_configure(config):
    import jax
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU via
    # config (tests must run on the virtual 8-device CPU mesh).
    jax.config.update("jax_platforms", "cpu")
    # persistent XLA compile cache: VarDCT pipeline graphs compile once
    cache_dir = os.path.join("/tmp", "jxl_tpu_xla_cache_cpu")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_ASSETS = "/root/reference/app/src/main/assets"


def asset(name: str) -> bytes:
    """Load a real-world corpus file from the (read-only) reference checkout.

    These are data files (test images), read in place — never copied into
    this repo.  Tests that need them skip when the reference isn't mounted.
    """
    path = os.path.join(REFERENCE_ASSETS, name)
    if not os.path.exists(path):
        pytest.skip(f"reference corpus not available: {name}")
    with open(path, "rb") as f:
        return f.read()


def all_assets():
    if not os.path.isdir(REFERENCE_ASSETS):
        return []
    return sorted(f for f in os.listdir(REFERENCE_ASSETS) if f.endswith(".jxl"))

"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the TPU-native equivalent of a fake
distributed backend — SURVEY.md §4): JAX_PLATFORMS=cpu plus
--xla_force_host_platform_device_count=8 must be set BEFORE jax is imported.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU: parity tests need f32 math (the TPU MXU defaults to bf16-ish
# matmul precision), and the sharding tests need the 8-device farm. jax is
# already imported by the environment's sitecustomize, so the env var alone is
# too late — update the live config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_graft_entry():
    """Import __graft_entry__ by explicit path (no sys.path mutation)."""
    import importlib.util
    import sys

    mod = sys.modules.get("__graft_entry__")
    if mod is not None:
        return mod
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(REPO_ROOT, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__graft_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Multi-chip TPU hardware is not available in CI; sharding tests run against
XLA's host-platform device virtualization instead (same SPMD partitioner,
same collectives).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# A pytest plugin may import jax before this conftest's env vars are seen;
# jax.config wins over an already-read JAX_PLATFORMS.
import jax

jax.config.update("jax_platforms", "cpu")

import sys
import types
import importlib.util
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
REFERENCE_ROOT = Path("/root/reference")
sys.path.insert(0, str(REPO_ROOT))


def load_reference_unicycle():
    """Load the reference torch Unicycle for golden-value parity tests.

    Loads only dynamics/base.py + dynamics/unicycle.py via importlib (the full
    tbsim package pulls torchvision, which is absent). Returns None when the
    reference or torch is unavailable — parity tests skip in that case.
    """
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    base_path = REFERENCE_ROOT / "src/tbsim/dynamics/base.py"
    uni_path = REFERENCE_ROOT / "src/tbsim/dynamics/unicycle.py"
    if not base_path.exists():
        return None

    pkg = types.ModuleType("tbsim")
    pkg.__path__ = [str(REFERENCE_ROOT / "src/tbsim")]
    dyn_pkg = types.ModuleType("tbsim.dynamics")
    dyn_pkg.__path__ = [str(REFERENCE_ROOT / "src/tbsim/dynamics")]
    sys.modules.setdefault("tbsim", pkg)
    sys.modules.setdefault("tbsim.dynamics", dyn_pkg)

    spec = importlib.util.spec_from_file_location("tbsim.dynamics.base", base_path)
    base_mod = importlib.util.module_from_spec(spec)
    sys.modules["tbsim.dynamics.base"] = base_mod
    spec.loader.exec_module(base_mod)

    spec = importlib.util.spec_from_file_location("tbsim.dynamics.unicycle", uni_path)
    uni_mod = importlib.util.module_from_spec(spec)
    sys.modules["tbsim.dynamics.unicycle"] = uni_mod
    spec.loader.exec_module(uni_mod)
    return uni_mod


@pytest.fixture(scope="session")
def reference_unicycle():
    mod = load_reference_unicycle()
    if mod is None:
        pytest.skip("reference unicycle not importable")
    return mod

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


def install_reference_stubs():
    """Install torchvision + trajdata module stubs so the reference tbsim
    package (and the project models importing it) can be loaded for golden
    parity tests. Only names referenced at import time are stubbed; calling
    a stubbed torchvision factory raises."""
    import enum

    def mkpkg(name):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules[name] = m
        return m

    tv = mkpkg("torchvision")
    tvm = mkpkg("torchvision.models")
    tvr = mkpkg("torchvision.models.resnet")
    tvf = mkpkg("torchvision.models.feature_extraction")
    tvo = mkpkg("torchvision.ops")

    def _stub(*a, **k):
        raise RuntimeError("torchvision stub called")

    tvr.resnet18 = tvr.resnet34 = tvr.resnet50 = _stub
    tvf.create_feature_extractor = _stub

    class RoIAlign:  # referenced at import in cnn_roi_encoder
        def __init__(self, *a, **k):
            pass

    tvo.RoIAlign = RoIAlign
    tv.models, tvm.resnet, tvm.feature_extraction, tv.ops = tvm, tvr, tvf, tvo

    td = mkpkg("trajdata")

    class AgentType(enum.IntEnum):
        UNKNOWN = 0
        VEHICLE = 1
        PEDESTRIAN = 2
        BICYCLE = 3
        MOTORCYCLE = 4

    for cls_name in ("AgentBatch", "SceneBatch", "UnifiedDataset"):
        setattr(td, cls_name, type(cls_name, (), {}))
    td.AgentType = AgentType
    ds = mkpkg("trajdata.data_structures")
    ds.AgentType = AgentType
    st = mkpkg("trajdata.data_structures.state")
    st.StateTensor = type("StateTensor", (), {})
    st.StateArray = type("StateArray", (), {})
    be = mkpkg("trajdata.data_structures.batch_element")
    be.AgentBatchElement = type("AgentBatchElement", (), {})
    be.SceneBatchElement = type("SceneBatchElement", (), {})
    mkpkg("trajdata.utils")
    au = mkpkg("trajdata.utils.arr_utils")
    au.angle_wrap = lambda x: x
    au.transform_angles_np = au.transform_coords_np = au.transform_xyh_np = (
        lambda *a, **k: None
    )
    su = mkpkg("trajdata.utils.state_utils")
    su.transform_state_np_2d = lambda *a, **k: None
    mp = mkpkg("trajdata.maps")
    mp.VectorMap = type("VectorMap", (), {})
    vme = mkpkg("trajdata.maps.vec_map_elements")
    vme.RoadLane = type("RoadLane", (), {})
    ma = mkpkg("trajdata.maps.map_api")
    ma.MapAPI = type("MapAPI", (), {})
    mkpkg("trajdata.visualization")
    visv = mkpkg("trajdata.visualization.vis")
    visv.draw_map = visv.draw_agent = visv.draw_history = lambda *a, **k: None


def load_reference_project_file(relpath: str, modname: str):
    """importlib-load a reference project file (e.g. models/dm/dm_model.py)
    after install_reference_stubs(); reference tbsim resolves via sys.path."""
    path = REFERENCE_ROOT / relpath
    if not path.exists():
        return None
    # load_reference_unicycle installs a hand-built PARTIAL tbsim package
    # (dynamics.base + unicycle only). If that ran earlier in the session it
    # shadows the real package and reference imports die on missing
    # attributes — evict it so tbsim resolves fresh via sys.path.
    if getattr(sys.modules.get("tbsim"), "__file__", None) is None:
        for name in [n for n in sys.modules if n == "tbsim" or n.startswith("tbsim.")]:
            del sys.modules[name]
    for p in (str(REFERENCE_ROOT / "src"), str(REFERENCE_ROOT)):
        if p not in sys.path:
            sys.path.append(p)
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def reference_env():
    """Stubbed import environment for reference golden-parity tests."""
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch unavailable")
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference tree unavailable")
    install_reference_stubs()
    return load_reference_project_file

"""Golden parity for the converter's batch parse vs the LIVE reference parser.

Runs the reference's `parse_node_centric`
(`/root/reference/src/tbsim/utils/trajdata_utils.py:346-475`) — pure torch,
loaded under the conftest trajdata/torchvision stubs — on hand-built
StateTensor-shaped fixtures, and asserts `cld_tpu.data.convert.parse_raw_batch`
reproduces every shared field. This shrinks the one risk the stub contract
test (`test_convert_contract.py`) cannot catch: semantic drift between our
parse and the reference's (NaN conventions, mask derivation, raster matrix,
painted-history channels, the invalid-map drivable convention), without
needing a trajdata install — `parse_node_centric` only duck-types the batch
dict (VERDICT r4 directive 7).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import REFERENCE_ROOT  # noqa: E402

B, TH, TF, S = 4, 6, 8, 3  # batch, hist len, fut len, neighbors
RASTER, C, PX = 64, 3, 0.5
FILL = -1.0


def _rigid(theta, tx, ty):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, tx], [s, c, ty], [0, 0, 1]], np.float32)


def _state8(rng, *lead):
    """trajdata 8-dim state rows: x, y, vx, vy, ax, ay, sin(h), cos(h)."""
    x = rng.normal(size=(*lead, 8)).astype(np.float32) * 3.0
    h = rng.uniform(-np.pi, np.pi, size=lead).astype(np.float32)
    x[..., 6] = np.sin(h)
    x[..., 7] = np.cos(h)
    return x


def _fixture_arrays():
    rng = np.random.default_rng(1234)
    agent_hist = _state8(rng, B, TH)
    agent_fut = _state8(rng, B, TF)
    neigh_hist = _state8(rng, B, S, TH)
    neigh_fut = _state8(rng, B, S, TF)
    # NaN patterns the real loader produces: short ego history, a fully
    # padded neighbor, truncated neighbor futures
    agent_hist[1, :2] = np.nan
    neigh_hist[:, 2] = np.nan
    neigh_fut[:, 2] = np.nan
    neigh_fut[0, 1, 5:] = np.nan

    hist_extent = rng.uniform(1.0, 3.0, size=(B, TH, 3)).astype(np.float32)
    hist_extent[1, :2] = np.nan
    neigh_extent = rng.uniform(1.0, 3.0, size=(B, S, TH, 3)).astype(np.float32)
    neigh_extent[:, 2] = 0.0

    curr_xyh = np.stack(
        [
            agent_hist[:, -1, 0],
            agent_hist[:, -1, 1],
            np.arctan2(agent_hist[:, -1, 6], agent_hist[:, -1, 7]),
        ],
        axis=-1,
    ).astype(np.float32)

    maps = (rng.uniform(size=(B, C, RASTER, RASTER)) > 0.5).astype(np.float32)
    maps[3] = FILL  # one sample with no map coverage (trajdata fill)

    a_from_w = np.stack(
        [_rigid(rng.uniform(-np.pi, np.pi), *rng.normal(size=2) * 20) for _ in range(B)]
    )
    return dict(
        agent_hist=agent_hist, agent_fut=agent_fut, neigh_hist=neigh_hist,
        neigh_fut=neigh_fut, hist_extent=hist_extent, neigh_extent=neigh_extent,
        curr_xyh=curr_xyh, maps=maps, a_from_w=a_from_w,
    )


@pytest.fixture(scope="module")
def ref_parsed(reference_env):
    """Run the live reference parser on the fixture."""
    tu = reference_env("src/tbsim/utils/trajdata_utils.py", "ref_trajdata_utils")
    if tu is None:
        pytest.skip("reference trajdata_utils not loadable")
    tu.set_global_trajdata_batch_env("nusc_trainval")
    tu.set_global_trajdata_batch_raster_cfg(
        dict(
            include_hist=True, pixel_size=PX, raster_size=RASTER,
            ego_center=(-0.5, 0.0), num_sem_layers=C,
            no_map_fill_value=FILL, drivable_layers=None,
        )
    )
    import sys

    st_mod = sys.modules["trajdata.data_structures.state"]

    class FixtureStateTensor(st_mod.StateTensor):
        """Duck-typed trajdata StateTensor over (x, y, h) columns."""

        def __init__(self, xyh):
            self._t = torch.as_tensor(xyh)

        def __getitem__(self, idx):
            return self._t[idx]

        @property
        def position(self):
            return self._t[:, :2]

        @property
        def heading(self):
            return self._t[:, 2:3]

        @property
        def device(self):
            return self._t.device

    f = _fixture_arrays()
    t = lambda a: torch.as_tensor(np.array(a, copy=True))
    batch = dict(
        agent_hist=t(f["agent_hist"]),
        agent_fut=t(f["agent_fut"]),
        curr_agent_state=FixtureStateTensor(f["curr_xyh"]),
        agent_type=torch.ones(B, dtype=torch.long),  # nusc VEHICLE
        agent_hist_extent=t(f["hist_extent"]),
        neigh_indices=torch.arange(B * S).reshape(B, S),
        neigh_hist=t(f["neigh_hist"]),
        neigh_fut=t(f["neigh_fut"]),
        neigh_types=torch.ones(B, S),
        neigh_hist_extents=t(f["neigh_extent"]),
        agents_from_world_tf=t(f["a_from_w"]),
        maps=t(f["maps"]),
        map_names=["m"] * B,
    )
    return tu.parse_node_centric(batch), f


class _DuckState:
    """What our converter duck-types off a trajdata StateTensor."""

    def __init__(self, s8):
        self._s = torch.as_tensor(np.array(s8, copy=True))

    @property
    def position(self):
        return self._s[..., :2]

    @property
    def velocity(self):
        return self._s[..., 2:4]

    @property
    def heading(self):
        return torch.atan2(self._s[..., 6:7], self._s[..., 7:8])


@pytest.fixture(scope="module")
def ours_parsed(ref_parsed):
    from cld_tpu.data.convert import parse_raw_batch

    _, f = ref_parsed
    t = lambda a: torch.as_tensor(np.array(a, copy=True))
    raw = dict(
        agent_hist=_DuckState(f["agent_hist"]),
        agent_fut=_DuckState(f["agent_fut"]),
        neigh_hist=_DuckState(f["neigh_hist"]),
        neigh_fut=_DuckState(f["neigh_fut"]),
        agent_hist_extent=t(f["hist_extent"]),
        agents_from_world_tf=t(f["a_from_w"]),
        maps=t(f["maps"]),
    )
    return parse_raw_batch(raw, raster_size=RASTER, pixel_size=PX, future_frames=TF)


FIELD_PAIRS = [
    # (reference key, our key, atol)
    ("history_positions", "history_positions", 1e-6),
    ("history_yaws", "history_yaws", 1e-6),
    ("history_availabilities", "history_availabilities", 0),
    ("curr_speed", "curr_speed", 1e-6),
    ("target_positions", "target_positions", 1e-6),
    ("target_yaws", "target_yaws", 1e-6),
    ("target_availabilities", "target_availabilities", 0),
    ("extent", "extent", 1e-6),
    ("raster_from_agent", "raster_from_agent", 0),
    ("world_from_agent", "world_from_agent", 1e-4),
    ("all_other_agents_history_positions", "all_other_agents_history_positions", 1e-6),
    ("all_other_agents_history_yaws", "all_other_agents_history_yaws", 1e-6),
    ("all_other_agents_history_availability", "all_other_agents_history_availability", 0),
    ("all_other_agents_future_positions", "all_other_agents_future_positions", 1e-6),
    ("all_other_agents_future_availability", "all_other_agents_future_availability", 0),
]


@pytest.mark.parametrize("ref_key,our_key,atol", FIELD_PAIRS)
def test_field_parity(ref_parsed, ours_parsed, ref_key, our_key, atol):
    ref, _ = ref_parsed
    want = np.asarray(ref[ref_key].detach().numpy(), np.float32)
    got = np.asarray(ours_parsed[our_key], np.float32)
    # reference yaw fields are [..., 1]; ours may match or squeeze
    if want.shape != got.shape:
        want, got = want.squeeze(), got.squeeze()
    assert want.shape == got.shape, (ref_key, want.shape, got.shape)
    np.testing.assert_allclose(got, want, atol=atol, rtol=0, err_msg=ref_key)


def test_drivable_map_parity(ref_parsed, ours_parsed):
    """Including the invalid-map convention: the fully no-map sample is
    entirely drivable in BOTH parsers (trajdata_utils.py:159-222)."""
    ref, _ = ref_parsed
    want = np.asarray(ref["drivable_map"].numpy(), np.float32)
    got = np.asarray(ours_parsed["drivable_map"], np.float32)
    np.testing.assert_array_equal(got, want)
    assert got[3].min() == 1.0  # the no-map sample


def test_image_parity(ref_parsed, ours_parsed):
    """Painted history channels + semantic layers, exact: ego +1 wins over
    neighbor -1, invalid positions land on (and are erased from) index 0,
    out-of-bound clamps erased from the max index."""
    ref, _ = ref_parsed
    want = np.asarray(ref["image"].numpy(), np.float32)  # [B, TH+C, H, W]
    got = np.asarray(ours_parsed["image"], np.float32).transpose(0, 3, 1, 2)
    assert want.shape == got.shape
    np.testing.assert_array_equal(got, want)

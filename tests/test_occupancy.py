"""Occupancy-grid metric tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.sim.occupancy import occupancy_init, occupancy_metrics, occupancy_update


def test_splat_mass_centered():
    st = occupancy_init(origin=(-10.0, -10.0), size=(20, 20), step=1.0, sigma=1.0)
    st = occupancy_update(st, jnp.array([[0.0, 0.0]]))
    g = np.asarray(st.grid)
    # peak at the cell containing the point (origin -10 -> cell 10)
    assert g[10, 10] == g.max()
    np.testing.assert_allclose(g[10, 10], 1.0, atol=1e-6)  # exp(0)
    # symmetric falloff
    np.testing.assert_allclose(g[10, 11], g[10, 9], atol=1e-6)
    assert g[10, 11] < g[10, 10]


def test_out_of_grid_positions_ignored():
    st = occupancy_init(origin=(0.0, 0.0), size=(8, 8), step=1.0)
    st = occupancy_update(st, jnp.array([[100.0, 100.0]]))
    np.testing.assert_allclose(np.asarray(st.grid), 0.0)


def test_accumulation_and_jit():
    st = occupancy_init(origin=(0.0, 0.0), size=(16, 16), step=1.0)
    upd = jax.jit(occupancy_update)
    for i in range(3):
        st = upd(st, jnp.array([[5.0, 5.0]]))
    np.testing.assert_allclose(float(st.grid[5, 5]), 3.0, atol=1e-5)


def test_occupancy_metrics_offroad_fraction():
    st = occupancy_init(origin=(0.0, 0.0), size=(16, 16), step=1.0, sigma=0.25)
    # drivable = lower half of a world map aligned with the grid
    drivable = jnp.zeros((16, 16)).at[:8].set(1.0)
    st = occupancy_update(st, jnp.array([[4.0, 4.0]]))  # on-road
    m_on = occupancy_metrics(st, drivable, jnp.zeros(2), 1.0)
    assert m_on["offroad_occupancy_fraction"] < 0.2
    st = occupancy_update(st, jnp.array([[4.0, 12.0], [5.0, 13.0], [6.0, 12.0]]))
    m_mix = occupancy_metrics(st, drivable, jnp.zeros(2), 1.0)
    assert m_mix["offroad_occupancy_fraction"] > m_on["offroad_occupancy_fraction"]
    assert m_mix["occupancy_coverage"] > 0

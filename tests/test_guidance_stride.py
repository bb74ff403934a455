"""Guidance stride: skipping perturbation on non-guided steps."""

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.algos.dm import sample_traj
from cld_tpu.ops.diffusion import make_schedule


def test_stride_applies_subset_of_steps():
    sch = make_schedule(10)
    dn = lambda x, c, t: jnp.zeros_like(x)
    cond = jnp.zeros((1, 8))

    def shift(mean, t):
        return mean + 1.0

    full = sample_traj(dn, sch, jax.random.key(0), cond, 8, 4,
                       guidance_fn=shift, guidance_stride=1)
    strided = sample_traj(dn, sch, jax.random.key(0), cond, 8, 4,
                          guidance_fn=shift, guidance_stride=3)
    none = sample_traj(dn, sch, jax.random.key(0), cond, 8, 4)
    d_full = float(jnp.abs(full["pred_traj"] - none["pred_traj"]).mean())
    d_strided = float(jnp.abs(strided["pred_traj"] - none["pred_traj"]).mean())
    assert d_strided > 0.1  # guidance still applied on some steps
    assert d_strided < d_full  # but fewer of them


def test_stride_jits():
    sch = make_schedule(10)
    dn = lambda x, c, t: jnp.zeros_like(x)
    cond = jnp.zeros((2, 8))
    out = jax.jit(
        lambda r: sample_traj(dn, sch, r, cond, 8, 4,
                              guidance_fn=lambda m, t: m * 0.9,
                              guidance_stride=4)
    )(jax.random.key(1))
    assert np.isfinite(np.asarray(out["pred_traj"])).all()

def test_guidance_output_skips_final_step():
    """Reference apply_guidance_output=False (`scene_edit_config.py:85`,
    `diffuser.py:879-881`): the final t=0 step emits the unperturbed
    posterior mean; guidance_output=True perturbs it too."""
    sch = make_schedule(10)
    dn = lambda x, c, t: jnp.zeros_like(x)
    cond = jnp.zeros((1, 8))

    def bump_final(mean, t):
        # huge offset ONLY at t == 0 — visible in pred_traj iff the final
        # step is guided (no noise is added at t == 0)
        return mean + jnp.where(t[0] == 0, 1e4, 0.0)

    off = sample_traj(dn, sch, jax.random.key(0), cond, 8, 4,
                      guidance_fn=bump_final)
    on = sample_traj(dn, sch, jax.random.key(0), cond, 8, 4,
                     guidance_fn=bump_final, guidance_output=True)
    assert float(jnp.abs(off["pred_traj"]).max()) < 1e3
    assert float(jnp.abs(on["pred_traj"]).max()) > 1e3
    # the skip composes with striding
    strided = sample_traj(dn, sch, jax.random.key(0), cond, 8, 4,
                          guidance_fn=bump_final, guidance_stride=3)
    assert float(jnp.abs(strided["pred_traj"]).max()) < 1e3


def test_perturb_th_schedules():
    """make_perturbation_guidance per-step opt params (`diffuser.py:884-905`):
    perturb_th=None clips to the posterior sigma at t; an explicit bound
    with n_timesteps decays sigmoidally from ~4 to the bound at t=0."""
    from cld_tpu.guidance.losses import GuidanceContext
    from cld_tpu.guidance.perturbation import (
        GuidanceSpec,
        make_perturbation_guidance,
    )

    ctx = GuidanceContext(
        drivable_map=jnp.ones((2, 8, 8)),
        raster_from_agent=jnp.eye(3)[None].repeat(2, 0),
        extent=jnp.ones((2, 3)),
        curr_speed=jnp.ones((2,)),
        world_from_agent=jnp.eye(3)[None].repeat(2, 0),
        scene_index=jnp.zeros((2,), jnp.int32),
    )

    class HugeGrad:
        def __call__(self, x, ctx, agt_mask=None):
            return 1e6 * jnp.mean(x, axis=(-1, -2))  # constant huge gradient

    specs = [GuidanceSpec(HugeGrad(), weight=1.0)]
    # identity-ish decode: cost gradient reaches z through the first column
    decode_fn = lambda z: jnp.tile(z[:, None, :, :1], (1, 1, 1, 6))

    sigmas = jnp.linspace(0.01, 0.5, 10)
    x0 = jnp.zeros((2, 4, 3))

    # sigma clip: |delta| <= sigma[t]
    gfn = make_perturbation_guidance(ctx, specs, decode_fn, lr=10.0,
                                     perturb_th=None, sigma_schedule=sigmas)
    for t in (0, 9):
        d = gfn(x0, jnp.full((2,), t)) - x0
        assert float(jnp.abs(d).max()) <= float(sigmas[t]) + 1e-6

    # sigmoid decay: th(t=0) = bound, th(t=T-1) ~ 4
    gfn2 = make_perturbation_guidance(ctx, specs, decode_fn, lr=10.0,
                                      perturb_th=1.0, n_timesteps=10)
    d0 = gfn2(x0, jnp.zeros((2,), jnp.int32)) - x0
    dT = gfn2(x0, jnp.full((2,), 9)) - x0
    assert float(jnp.abs(d0).max()) <= 1.0 + 1e-6
    assert float(jnp.abs(dT).max()) > 3.0  # near the ~4 start of the decay

    # lr = sigma when lr is None
    gfn3 = make_perturbation_guidance(ctx, specs, decode_fn, lr=None,
                                      perturb_th=None, sigma_schedule=sigmas)
    d3 = gfn3(x0, jnp.zeros((2,), jnp.int32)) - x0
    assert np.isfinite(np.asarray(d3)).all()

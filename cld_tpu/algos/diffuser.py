"""Raw-trajectory action diffuser — the CTG model family.

Capability parity with `DiffuserModel`
(`/root/reference/src/tbsim/models/diffuser.py:42-1065`, the policy used by
`DiffuserTrafficModel`, `algos/algos.py:1633`), TPU-native:

* the diffusion variable is the scaled ACTION sequence [B, T, 2]
  ('state_and_action' input mode: the network sees the full [B, T, 6]
  state+action trajectory with states re-integrated from the actions through
  the unicycle every step, but only actions are noised/denoised —
  `diffuser.py:746-775`);
* the network predicts x0 (clean actions); classifier-free guidance mixes
  conditional/unconditional predictions in noise space
  (eps = (1+w)*eps_c - w*eps_u, `diffuser.py:781-792`);
* stationary agents' reconstructed actions are zeroed in descaled space
  (`disable_control_on_stationary`, `diffuser.py:800-812`);
* ancestral sampling is one lax.scan with optional guidance perturbation of
  the posterior mean ('clean' guidance perturbs x_recon, `p_sample:844-929`).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from cld_tpu.ops.diffusion import (
    DiffusionSchedule,
    extract,
    predict_start_from_noise,
    q_posterior_mean,
    q_sample,
)
from cld_tpu.ops.dynamics import UnicycleParams, unicycle_forward_dynamics
from cld_tpu.ops.normalization import TrajNormalizer

DenoiseNet = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
# (traj_in [B, T, 6], cond_feat [B, C], t [B]) -> x0_hat actions [B, T, 2]


def predict_noise_from_start(schedule, x_t, t, x0):
    """eps implied by (x_t, x0) (`diffuser.py` predict_noise_from_start)."""
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
    ) / extract(schedule.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def q_posterior(schedule, x0, x_t, t):
    """(mean, log_var) of q(x_{t-1} | x_t, x0) — thin wrapper over the
    shared ops.diffusion helpers so the math lives in one module."""
    mean = q_posterior_mean(schedule, x0, x_t, t)
    log_var = extract(schedule.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, log_var


class RawActionDiffuser:
    """Functional CTG-style diffuser over action sequences."""

    def __init__(
        self,
        net: DenoiseNet,
        schedule: DiffusionSchedule,
        dyn_params: UnicycleParams,
        normalizer: Optional[TrajNormalizer] = None,
        dt: float = 0.1,
    ):
        # NOTE: the stationary mask is computed by the CALLER
        # (stationary_mask_from_speed) and passed into loss/sample — a
        # threshold stored here would be a knob that does nothing
        self.net = net
        self.schedule = schedule
        self.dyn = dyn_params
        self.normalizer = normalizer or TrajNormalizer()
        self.dt = dt

    # -- shared pieces ---------------------------------------------------
    def actions_to_traj(self, actions_scaled: jnp.ndarray, curr_states: jnp.ndarray) -> jnp.ndarray:
        """Scaled actions -> scaled [B, T, 6] network input via dynamics
        (`diffuser.py:818-824` state_action_grad_inner_transform)."""
        actions = self.normalizer.descale(actions_scaled, [4, 5])
        states = unicycle_forward_dynamics(self.dyn, curr_states, actions, self.dt)
        full = jnp.concatenate([states, actions], axis=-1)
        return self.normalizer.scale(full)

    def query_map_feats(
        self, traj_scaled: jnp.ndarray, map_grid: jnp.ndarray,
        grid_from_agent: jnp.ndarray,
    ) -> jnp.ndarray:
        """Per-step map features under the (detached) trajectory positions
        (`diffuser.py:752-760` query_map_feats / use_map_feat_grid): descale
        positions, project into feature-grid pixels, bilinear-query."""
        from cld_tpu.models.roi_encoder import query_feature_grid
        from cld_tpu.ops.geometry import transform_points

        pos = jax.lax.stop_gradient(
            self.normalizer.descale(traj_scaled[..., :2], [0, 1])
        )
        pix = transform_points(pos, grid_from_agent)
        return query_feature_grid(pix, map_grid)

    def _x0_hat(
        self, x_actions, curr_states, cond_feat, t, class_free_guide_w=0.0,
        stationary_mask=None, map_grid=None, grid_from_agent=None,
    ):
        traj_in = self.actions_to_traj(x_actions, curr_states)
        if map_grid is not None:
            feats = self.query_map_feats(traj_in, map_grid, grid_from_agent)
            traj_in = jnp.concatenate([traj_in, feats], axis=-1)
        x0 = self.net(traj_in, cond_feat, t)
        if class_free_guide_w != 0.0:
            x0_uncond = self.net(traj_in, jnp.zeros_like(cond_feat), t)
            eps_c = predict_noise_from_start(self.schedule, x_actions, t, x0)
            eps_u = predict_noise_from_start(self.schedule, x_actions, t, x0_uncond)
            eps = (1 + class_free_guide_w) * eps_c - class_free_guide_w * eps_u
            x0 = predict_start_from_noise(self.schedule, x_actions, eps, t)
        if stationary_mask is not None:
            # zero actions (in descaled space) for stationary agents
            zero_scaled = self.normalizer.scale(jnp.zeros_like(x0), [4, 5])
            x0 = jnp.where(stationary_mask[:, None, None], zero_scaled, x0)
        return x0

    # -- training --------------------------------------------------------
    def loss(self, rng, gt_traj_scaled: jnp.ndarray, curr_states, cond_feat,
             cond_drop_prob: float = 0.1, map_grid=None, grid_from_agent=None,
             ) -> jnp.ndarray:
        """x0-prediction MSE on noised actions, with conditioning dropout for
        CFG training (`diffuser.py` loss path + CTG cond dropout)."""
        actions0 = gt_traj_scaled[..., 4:6]
        B = actions0.shape[0]
        t_rng, n_rng, d_rng = jax.random.split(rng, 3)
        t = jax.random.randint(t_rng, (B,), 0, self.schedule.n_timesteps)
        noise = jax.random.normal(n_rng, actions0.shape, actions0.dtype)
        x_noisy = q_sample(self.schedule, actions0, t, noise)
        drop = jax.random.bernoulli(d_rng, cond_drop_prob, (B,))
        cond = jnp.where(drop[:, None], 0.0, cond_feat)
        x0_hat = self._x0_hat(
            x_noisy, curr_states, cond, t, map_grid=map_grid,
            grid_from_agent=grid_from_agent,
        )
        return jnp.mean((x0_hat - actions0) ** 2)

    # -- sampling ----------------------------------------------------------
    def sample(
        self,
        rng,
        curr_states: jnp.ndarray,
        cond_feat: jnp.ndarray,
        horizon: int,
        num_samp: int = 1,
        class_free_guide_w: float = 0.0,
        guidance_fn: Optional[Callable] = None,
        guide_clean: bool = True,
        stationary_mask: Optional[jnp.ndarray] = None,
        map_grid: Optional[jnp.ndarray] = None,
        grid_from_agent: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Ancestral sampling scan (`p_sample_loop`, `diffuser.py:932-993`).

        guidance_fn(x, t) perturbs either the clean recon (guide_clean, the
        reference's default 'clean' mode) or the posterior mean.
        Returns descaled [B*N, T, 6] trajectories + scaled actions.
        """
        B = cond_feat.shape[0]
        cond = jnp.repeat(cond_feat, num_samp, axis=0)
        curr = jnp.repeat(curr_states, num_samp, axis=0)
        stat = None if stationary_mask is None else jnp.repeat(stationary_mask, num_samp, axis=0)
        if map_grid is not None:
            map_grid = jnp.repeat(map_grid, num_samp, axis=0)
            grid_from_agent = jnp.repeat(grid_from_agent, num_samp, axis=0)
        BN = B * num_samp

        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, (BN, horizon, 2), jnp.float32)
        steps = jnp.arange(self.schedule.n_timesteps - 1, -1, -1)
        step_rngs = jax.random.split(rng, self.schedule.n_timesteps)

        def body(x, inp):
            i, step_rng = inp
            t = jnp.full((BN,), i, jnp.int32)
            x0 = self._x0_hat(
                x, curr, cond, t, class_free_guide_w, stat,
                map_grid=map_grid, grid_from_agent=grid_from_agent,
            )
            if guidance_fn is not None and guide_clean:
                x0 = guidance_fn(x0, t)
            mean, log_var = q_posterior(self.schedule, x0, x, t)
            if guidance_fn is not None and not guide_clean:
                mean = guidance_fn(mean, t)
            sigma = jnp.exp(0.5 * log_var)
            noise = jax.random.normal(step_rng, x.shape, jnp.float32)
            nonzero = (i != 0).astype(jnp.float32)
            return (mean + nonzero * sigma * noise).astype(jnp.float32), None

        x, _ = jax.lax.scan(body, x, (steps, step_rngs))

        actions = self.normalizer.descale(x, [4, 5])
        states = unicycle_forward_dynamics(self.dyn, curr, actions, self.dt)
        traj = jnp.concatenate([states, actions], axis=-1)
        return {"trajectories": traj, "actions_scaled": x, "cond_feat": cond}


def stationary_mask_from_speed(curr_speed: jnp.ndarray, th: float = 0.5) -> jnp.ndarray:
    """disable_control_on_stationary 'any_speed' criterion
    (`trajdata_utils.py:1091` get_stationary_mask)."""
    return jnp.abs(curr_speed) < th

"""STRIVE-style latent attack tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.algos.latent_attack import latent_attack


def test_latent_attack_reaches_target_with_plausibility():
    """Toy generator: z -> straight trajectory whose lateral offset is z.
    Attack objective: collide with a victim at y=3. The optimized latent
    should move the trajectory toward the victim while the prior penalty
    keeps |z| bounded."""

    def decode_fn(z):
        # z [B, 1] -> traj [B, T, 6] with constant y = 2*z
        T = 20
        traj = jnp.zeros((z.shape[0], T, 6))
        return traj.at[..., 1].set(2 * z)

    victim_y = 3.0

    def objective(traj):
        return jnp.mean((traj[..., 1] - victim_y) ** 2)

    z0 = jnp.zeros((2, 1))
    z_opt, info = jax.jit(
        lambda z: latent_attack(decode_fn, objective, z, prior_weight=0.05,
                                lr=0.2, steps=100)
    )(z0)
    final_y = float(decode_fn(z_opt)[0, 0, 1])
    assert abs(final_y - victim_y) < 0.5  # reached the victim
    assert float(info["objective"]) < 0.3
    # stronger prior pulls the scenario back toward likely (smaller |z|)
    z_tight, _ = latent_attack(decode_fn, objective, z0, prior_weight=5.0,
                               lr=0.2, steps=100)
    assert abs(float(z_tight[0, 0])) < abs(float(z_opt[0, 0]))


def test_latent_attack_with_dm_decoder():
    """Composes with the real pipeline: attack the latent DM's z through the
    frozen VAE decoder + unicycle toward a waypoint."""
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.models.vae import VaeModel, convert_action_to_state_and_action
    from cld_tpu.ops.dynamics import UnicycleParams
    from cld_tpu.ops.normalization import TrajNormalizer

    batch = synthetic_batch(seed=0, batch_size=1, raster_size=32)
    vae = VaeModel(curr_state_feat_dim=8, map_feature_dim=16, cond_feat_dim=16,
                   vae_hidden_size=8)
    vv = vae.init({"params": jax.random.key(0), "sample": jax.random.key(1)},
                  batch, 0.05)
    _, _, _, aux = vae.apply(vv, batch, method="encode",
                             rngs={"sample": jax.random.key(2)})
    dyn = UnicycleParams(max_steer=0.5, max_yawvel=6.28, acce_lo=-10, acce_hi=8)
    norm = TrajNormalizer()
    curr = jnp.concatenate([batch.history_positions[:, -1],
                            batch.curr_speed[:, None], batch.history_yaws[:, -1]], -1)

    def decode_fn(z):
        acts = vae.apply(vv, z, aux["cond_feat"], method="decode")
        return convert_action_to_state_and_action(acts, curr, dyn, norm,
                                                  descaled_output=True)

    target = jnp.array([20.0, 4.0])

    def objective(traj):
        return jnp.sum((traj[:, -1, :2] - target) ** 2)

    z0 = jnp.zeros((1, 52, 4))
    base_d = float(jnp.linalg.norm(decode_fn(z0)[0, -1, :2] - target))
    z_opt, info = latent_attack(decode_fn, objective, z0, prior_weight=0.01,
                                lr=0.1, steps=60)
    att_d = float(jnp.linalg.norm(decode_fn(z_opt)[0, -1, :2] - target))
    assert att_d < base_d  # the latent attack steers the scenario

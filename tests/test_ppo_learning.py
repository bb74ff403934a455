"""PPO learning-signal test: the third training stage demonstrably improves
the policy, not just moves parameters.

Toy setting mirroring the reference's stage-3 objective
(`/root/reference/src/trainers/guide_dm_trainer.py:84-183`: PPO fine-tuning
to reduce offroad/collision): a tiny denoiser over a synthetic scene whose
drivable band is narrowed to |y| < 1 m, reward = negative offroad count
(`criticmodel.py:12-29`). The reference-parity quirk is kept — log-prob is
evaluated at t=0 where posterior sigma is clipped (CLAUDE.md invariants), so
importance ratios saturate after the first minibatch of each update phase
and learning rides on the fresh-sample REINFORCE-style gradient. The toy
therefore uses SHORT update phases (ppo_update_times=2): the first iter of
each phase is exact REINFORCE (ratio==1), and long phases at toy-scale lr
sit on a numeric knife edge (reduction-order noise between 1- and 8-device
XLA flips convergence). With 2-iter phases the trajectory is bitwise
identical on 1 and 8 virtual devices and improves ~30% in 12 cycles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cld_tpu.training.ppo as ppo_mod
from cld_tpu.algos.reward import offroad_reward
from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.training.dm import DMTrainer
from cld_tpu.training.ppo import PPOTrainer, buffer_init
from cld_tpu.training.vae import VAETrainer
from cld_tpu.utils.registry import get_registered_experiment_config


def _toy_reward(state_act, batch, state_act_scaled, collision_thresh=0.8, dt=0.1):
    """Negative offroad only — the isolated learning signal."""
    return offroad_reward(state_act[..., :2], batch).reshape(-1)


@pytest.fixture(scope="module")
def setup(monkeypatch_module):
    monkeypatch_module.setattr(ppo_mod, "compute_reward", _toy_reward)

    cfg = get_registered_experiment_config("cld_smoke").unlock()
    cfg.algo.num_samp = 4
    cfg.algo.buffer_max = 64  # exactly one fresh collect per update phase
    cfg.algo.ppo_update_times = 2  # short phases: stable REINFORCE-dominated
    cfg.algo.ppo_epochs = 1
    cfg.algo.ppo_mini_batch = 16
    cfg.algo.optim_params.dm.learning_rate.initial = 1e-2  # toy-scale lr
    cfg.lock()

    B = 16
    batch = synthetic_batch(seed=0, batch_size=B, raster_size=64)
    # narrow the drivable band to |y| < 1 m so the untrained policy is
    # offroad often enough to provide signal
    H = 64
    ys = (np.arange(H) - 32) / 2.0  # row -> agent-frame y at 0.5 m/px
    narrow = (np.abs(ys) < 1.0).astype(np.float32)
    dmap = np.broadcast_to(narrow[None, :, None], (B, H, H)).copy()
    batch = batch._replace(drivable_map=jnp.asarray(dmap))

    vt = VAETrainer(cfg)
    vs = vt.init_state(jax.random.key(0), batch)
    vae_vars = {"params": vs.params, "batch_stats": vs.batch_stats}
    dm = DMTrainer(cfg, vae_vars)
    dm_state = dm.init_state(jax.random.key(2))
    ppo = PPOTrainer(cfg, dm)
    return cfg, batch, ppo, dm_state


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


def _fresh_buf(cfg):
    return buffer_init(
        cfg.algo.buffer_max, cfg.algo.horizon, cfg.algo.vae.latent_size,
        cfg.algo.cond_feat_dim,
    )


def test_ppo_improves_reward(setup):
    """k collect+update cycles: mean reward improves and the offroad
    failure rate drops vs the pre-PPO policy (deterministic eval rng, so the
    change isolates the parameter update)."""
    cfg, batch, ppo, dm_state = setup

    def eval_reward(state):
        _, m = ppo.collect_step(state, _fresh_buf(cfg), batch, jax.random.key(7777))
        return float(m["reward"])

    def eval_offroad_rate(state):
        # binary any-offroad-step rate is quantized at 1/16 per seed; average
        # over 5 eval seeds for a usable resolution
        vals = [
            float(ppo.test_step(state, batch, jax.random.key(8880 + i))[0][
                "offroad_failure_rate"])
            for i in range(5)
        ]
        return sum(vals) / len(vals)

    r_pre = eval_reward(dm_state)
    off_pre = eval_offroad_rate(dm_state)
    assert r_pre < -5.0  # the narrowed road makes the untrained policy bad

    last_pm = None
    for cyc in range(12):
        buf, _ = ppo.collect_step(dm_state, _fresh_buf(cfg), batch,
                                  jax.random.key(100 + cyc))
        dm_state, last_pm = ppo.ppo_update(dm_state, buf, jax.random.key(200 + cyc))

    r_post = eval_reward(dm_state)
    off_post = eval_offroad_rate(dm_state)
    # measured: 12 cycles give ~30% reward improvement (-10.78 -> -7.56) and
    # a 0.10 offroad-rate drop (0.7125 -> 0.6125) on this seed, identical on
    # 1 and 8 virtual devices; require half that headroom
    assert r_post > r_pre * 0.85, (r_pre, r_post)
    assert off_post <= off_pre - 0.04, (off_pre, off_post)

    # PPO health stats are reported by the update (guide_dm_trainer.py:170
    # logs only the loss; ratio/clip stats are the standard diagnostics)
    for k in ("loss", "ratio_mean", "ratio_max", "clip_fraction", "approx_kl"):
        assert k in last_pm, sorted(last_pm)
    assert 0.0 <= float(last_pm["clip_fraction"]) <= 1.0
    assert np.isfinite(float(last_pm["loss"]))


def test_of_record_phase_is_degenerate(setup):
    """Executable pin of the PARITY.md "PPO at the of-record update shape"
    analysis (round-4 probe, `scripts/ppo_of_record_probe.py`): at the
    reference's of-record shape — log-prob evaluated at t=0 where the
    posterior sigma is clipped to 1e-10 (`guide_dm_trainer.py:127-183` +
    the diffuser's posterior_log_variance clip; CLAUDE.md invariant) — the
    clipped-surrogate gradient is EXACTLY zero at every iteration, via one
    of two mechanisms per element:

    (a) bit-identical recompute: x0 was recorded at the posterior mode, so
        logp_new == logp_old exactly -> ratio == 1.0 and
        d logp/d theta = (x0 - mu)/sigma^2 * d mu = 0 exactly;
    (b) any recompute deviation (different XLA program than the collect
        path): the 1/sigma^2 = 1e20 amplification drives diff = logp_new -
        logp_old to huge NEGATIVE values (logp_old is the exact maximum:
        the quadratic term is 0 there), exp underflows ratio to exactly
        0.0, and both surrogate branches have zero gradient.

    Either way all parameter movement in a long of-record phase is the
    coupled L2 decay (wd added to the gradient before Adam), so the phase
    acts as decay + the rare exact-REINFORCE iteration — which is why this
    suite's learning test uses 2-iter phases. If a refactor breaks the
    bit-exactness property or the sigma clip, these assertions fail."""
    cfg, batch, ppo, dm_state = setup
    from cld_tpu.algos.dm import transition_log_prob

    buf = _fresh_buf(cfg)
    buf, _ = ppo.collect_step(dm_state, buf, batch, jax.random.key(4242))

    schedule = ppo.dm.schedule
    denoise = ppo.dm.denoise_fn
    clip_eps = 0.2
    mb = 16

    def one_iter(state, it_rng):
        idx = jax.random.randint(it_rng, (mb,), 0, jnp.maximum(buf.size, 1))
        x0, x1 = buf.x0[idx], buf.x1[idx]
        logp_old = buf.log_p[idx]
        adv = buf.reward[idx] - buf.baseline
        cond = buf.cond_feat[idx]
        t = jnp.zeros((mb,), jnp.int32)  # the of-record t=0 evaluation

        def loss_fn(params):
            logp_new = transition_log_prob(
                denoise(params), schedule, x1, x0, cond, t
            )
            ratio = jnp.exp(logp_new - logp_old)
            surr1 = ratio * adv
            surr2 = jnp.clip(ratio, 1 - clip_eps, 1 + clip_eps) * adv
            return -jnp.mean(jnp.minimum(surr1, surr2)), ratio

        (loss, ratio), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        gnorm_sq = sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))
        new_state = state.apply_gradients(grads=grads)
        pdelta_sq = sum(
            jnp.sum((a - b) ** 2)
            for a, b in zip(
                jax.tree.leaves(new_state.params), jax.tree.leaves(state.params)
            )
        )
        return new_state, (gnorm_sq, ratio, pdelta_sq)

    one_iter_j = jax.jit(one_iter)
    p_l2 = lambda s: float(
        jnp.sqrt(sum(jnp.sum(p**2) for p in jax.tree.leaves(s.params)))
    )
    l2_pre = p_l2(dm_state)
    state = dm_state
    moved = 0.0
    n_iters = 40
    for i, r in enumerate(jax.random.split(jax.random.key(31), n_iters)):
        state, (gnorm_sq, ratio, pdelta_sq) = one_iter_j(state, r)
        # THE pin: the surrogate gradient is exactly zero — not small, zero
        assert float(gnorm_sq) == 0.0, (i, float(gnorm_sq))
        # ratios are BIMODAL: exactly underflowed-0, or ~1 where the
        # recomputed mean matches x0 bitwise (the theta-dependent quadratic
        # is exactly 0; the ~1e-6 wobble is cross-program rounding of the
        # theta-INDEPENDENT -0.5*sum(log 2*pi*sigma^2) constant, which
        # carries no gradient)
        r_np = np.asarray(ratio)
        assert np.all((r_np == 0.0) | (np.abs(r_np - 1.0) < 1e-5)), (i, r_np)
        moved = max(moved, float(pdelta_sq))

    # ... yet parameters MOVE (the coupled L2 decay through Adam; the first
    # iters can sit at the warmup-zero LR, so check the max over the phase)
    assert moved > 0.0
    # and the movement is contraction: pure decay shrinks the param norm
    assert p_l2(state) < l2_pre

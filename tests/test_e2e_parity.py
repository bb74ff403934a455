"""End-to-end golden trajectory parity vs the reference torch pipeline.

Module-level parity (schedule buffers, LSTM-VAE, UNet) lives in
test_network_parity.py; here the FULL pipeline is chained under injected
weights and an injected noise sequence:

* `test_sampler_decode_dynamics_e2e_parity` — drives the reference
  `DmModel.sample_traj` (`models/dm/dm_model.py:103-174`) and our
  `sample_traj` scan through all 100 DDPM steps with identical UNet weights
  and identical per-step Gaussian draws, then decodes each side's own x_0
  through the LSTM decoder (`models/vae/lstm_vae.py:60-99`) and the real
  reference `VaeModel.convert_action_to_state_and_action`
  (`models/vae/vae_model.py:100-129`) into descaled [B, T, 6] trajectories.
* `test_perturbation_step_parity` — one latent-space
  `PerturbationGuidance.perturb` Adam step with a decoder
  (`src/tbsim/utils/guidance_loss.py:2221-2282`) under the `target_pos`
  rule (`guidance_loss.py:672-711`) vs our functional `perturb`, including
  the cumulative perturb_th clip and multi-step Adam moments.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_network_parity import (
    AttrDict,
    _conv1dblock_params,
    _conv_params,
    _dense_from_linear,
    _ref_dm_model,
    _resblock_params,
    _stack_params,
    _t2j,
)

B, N, T, D, COND = 2, 1, 8, 4, 256
N_TIMESTEPS = 100
DYN_KW = dict(max_steer=0.5, max_yawvel=6.28, acce_bound=(-10, 8))


def _unet_params_from_ref(ref_unet):
    """Reference TemporalMapUnet -> our flax param tree (same mapping as
    test_temporal_unet_parity)."""
    params = {
        "time_dense0": _dense_from_linear(ref_unet.time_mlp[1]),
        "time_dense1": _dense_from_linear(ref_unet.time_mlp[3]),
    }
    for ind, (res0, res1, down) in enumerate(ref_unet.downs):
        params[f"down{ind}_res0"] = _resblock_params(res0)
        params[f"down{ind}_res1"] = _resblock_params(res1)
        if not isinstance(down, torch.nn.Identity):
            params[f"down{ind}_downsample"] = {"Conv_0": _conv_params(down.conv)}
    params["mid_res0"] = _resblock_params(ref_unet.mid_block1)
    params["mid_res1"] = _resblock_params(ref_unet.mid_block2)
    for ind, (res0, res1, up) in enumerate(ref_unet.ups):
        params[f"up{ind}_res0"] = _resblock_params(res0)
        params[f"up{ind}_res1"] = _resblock_params(res1)
        if not isinstance(up, torch.nn.Identity):
            w = up.conv.weight.detach().numpy()  # [in, out, k]
            params[f"up{ind}_upsample"] = {
                "ConvTranspose_0": {
                    "kernel": jnp.asarray(w.transpose(2, 0, 1)[::-1].copy()),
                    "bias": _t2j(up.conv.bias),
                }
            }
    params["final_block"] = _conv1dblock_params(ref_unet.final_conv[0])
    params["final_conv"] = _conv_params(ref_unet.final_conv[1])
    return params


def _lstm_vae_pair(reference_env, hidden=16):
    """(ref torch LSTMVAE, our flax LSTMVAE, injected params)."""
    mod = reference_env("models/vae/lstm_vae.py", "ref_lstm_vae_e2e")
    torch.manual_seed(3)
    ref = mod.LSTMVAE(6, hidden, D, 2, device=torch.device("cpu")).eval()

    from cld_tpu.models.lstm import LSTMVAE

    ours = LSTMVAE(input_size=6, hidden_size=hidden, latent_size=D, output_size=2)
    params = {
        "lstm_enc": {"stack": _stack_params(ref.lstm_enc)},
        "lstm_dec": {
            "stack": _stack_params(ref.lstm_dec),
            "hid2act": _dense_from_linear(ref.lstm_dec.hid2act),
        },
        "mu": _dense_from_linear(ref.mu),
        "logvar": _dense_from_linear(ref.logvar),
    }
    return ref, ours, params


def _ref_vae_shim(vae_mod):
    """Reference VaeModel instance exposing the REAL
    convert_action_to_state_and_action / scale_traj / descale_traj methods
    (vae_model.py:100-173) without constructing the ResNet context encoder:
    __new__ + the attributes those methods read."""
    from cld_tpu.ops.normalization import NUSC_NORM_ADD, NUSC_NORM_DIV

    shim = vae_mod.VaeModel.__new__(vae_mod.VaeModel)
    torch.nn.Module.__init__(shim)
    shim.add_coeffs = np.asarray(NUSC_NORM_ADD)
    shim.div_coeffs = np.asarray(NUSC_NORM_DIV)
    shim.default_chosen_inds = [0, 1, 2, 3, 4, 5]
    shim.dt = 0.1
    shim.dyn = vae_mod.dynamics.Unicycle("dynamics", **DYN_KW)
    return shim


def _patch_cpu_tensor(monkeypatch):
    """The reference scale_traj/descale_traj pass `tensor.get_device()` (-1
    on CPU) straight into torch.tensor(device=...), which only accepts CUDA
    indices — map negative indices to cpu so the real methods run here."""
    real_tensor = torch.tensor

    def cpu_tensor(data, *a, device=None, **kw):
        if isinstance(device, int) and device < 0:
            device = "cpu"
        return real_tensor(data, *a, device=device, **kw)

    monkeypatch.setattr(torch, "tensor", cpu_tensor)


def _our_dyn():
    from cld_tpu.ops.dynamics import UnicycleParams

    return UnicycleParams(
        max_steer=DYN_KW["max_steer"], max_yawvel=DYN_KW["max_yawvel"],
        acce_lo=DYN_KW["acce_bound"][0], acce_hi=DYN_KW["acce_bound"][1],
    )


def test_sampler_decode_dynamics_e2e_parity(reference_env, monkeypatch):
    from cld_tpu.algos.dm import sample_traj
    from cld_tpu.models.temporal_unet import TemporalMapUnet
    from cld_tpu.models.vae import convert_action_to_state_and_action
    from cld_tpu.ops.diffusion import make_schedule
    from cld_tpu.ops.normalization import TrajNormalizer

    ref = _ref_dm_model(reference_env, horizon=T, latent=D, cond=COND, dim=8)
    ref.eval()
    unet_params = _unet_params_from_ref(ref.model)
    ours_unet = TemporalMapUnet(transition_dim=D, output_dim=D, dim=8, dim_mults=(2, 4, 8))

    # Replicate sample_traj's rng chain so both samplers see the SAME
    # Gaussian draws: init latent first, then one draw per reverse step
    # (i = 99..0 maps to step_rngs[0..99]).
    rng0 = jax.random.key(42)
    rng_steps, init_rng = jax.random.split(rng0)
    x_init = jax.random.normal(init_rng, (B * N, T, D), jnp.float32)
    step_rngs = jax.random.split(rng_steps, N_TIMESTEPS)
    noise_queue = [np.asarray(x_init).reshape(B, N, T, D)] + [
        np.asarray(jax.random.normal(r, (B * N, T, D), jnp.float32))
        for r in step_rngs
    ]
    drawn = {"i": 0}

    def _pop(shape):
        arr = noise_queue[drawn["i"]]
        drawn["i"] += 1
        assert tuple(shape) == arr.shape, (shape, arr.shape)
        return torch.as_tensor(arr)

    def fake_randn(*size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, list, torch.Size)):
            size = tuple(size[0])
        return _pop(size)

    monkeypatch.setattr(torch, "randn", fake_randn)
    monkeypatch.setattr(torch, "randn_like", lambda x, **kw: _pop(tuple(x.shape)))

    cond_np = np.random.default_rng(5).normal(size=(B, COND)).astype(np.float32)
    algo = AttrDict(num_samp=N, horizon=T, vae=AttrDict(latent_size=D))
    with torch.no_grad():
        out_ref = ref.sample_traj(
            {"history_positions": torch.zeros(B, 3, 2)},
            algo,
            {"cond_feat": torch.as_tensor(cond_np)},
        )
    assert drawn["i"] == len(noise_queue)  # init + one draw per step
    monkeypatch.undo()

    def denoise_fn(x, c, t):
        return ours_unet.apply({"params": unet_params}, x, c, t)

    out = jax.jit(
        lambda c: sample_traj(
            denoise_fn, make_schedule(N_TIMESTEPS), rng0, c, T, D, num_samp=N
        )
    )(jnp.asarray(cond_np))

    x0_ref = out_ref["pred_traj"].numpy()
    np.testing.assert_allclose(np.asarray(out["pred_traj"]), x0_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["x1"]), out_ref["x1"].numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["log_prob_final"]),
        out_ref["log_prob_final"].numpy(),
        rtol=1e-4,
    )

    # decode each side's OWN x_0 through LSTM decoder + unicycle integration
    ref_lstm, our_lstm, lstm_params = _lstm_vae_pair(reference_env)
    vae_mod = reference_env("models/vae/vae_model.py", "ref_vae_model")
    shim = _ref_vae_shim(vae_mod)
    _patch_cpu_tensor(monkeypatch)

    curr = np.random.default_rng(6).normal(size=(B, 4)).astype(np.float32)
    curr[:, 2] = np.abs(curr[:, 2]) * 4.0  # forward speeds
    curr[:, 3] *= 0.3

    with torch.no_grad():
        act_ref = ref_lstm.lstm_dec(
            torch.as_tensor(x0_ref), torch.as_tensor(cond_np)
        )
        traj_ref = shim.convert_action_to_state_and_action(
            act_ref, torch.as_tensor(curr), scaled_input=True, descaled_output=True
        ).numpy()

    acts = our_lstm.apply(
        {"params": lstm_params}, out["pred_traj"], jnp.asarray(cond_np),
        method="decode",
    )
    traj = convert_action_to_state_and_action(
        acts, jnp.asarray(curr), _our_dyn(), TrajNormalizer(), descaled_output=True
    )
    assert traj.shape == (B, T, 6)
    np.testing.assert_allclose(np.asarray(traj), traj_ref, rtol=1e-3, atol=2e-3)


def test_perturbation_step_parity(reference_env, monkeypatch):
    """Two latent-space Adam perturbation steps (decoder + unicycle in the
    cost graph, cumulative perturb_th clip) match the reference
    PerturbationGuidance.perturb bit-for-bit in float32 tolerance."""
    from cld_tpu.guidance.losses import GuidanceContext, TargetPosLoss
    from cld_tpu.guidance.perturbation import GuidanceSpec, perturb
    from cld_tpu.models.vae import convert_action_to_state_and_action
    from cld_tpu.ops.normalization import TrajNormalizer

    gmod = reference_env("src/tbsim/utils/guidance_loss.py", "ref_guidance_loss")
    vae_mod = reference_env("models/vae/vae_model.py", "ref_vae_model_p")
    ref_lstm, our_lstm, lstm_params = _lstm_vae_pair(reference_env)
    shim = _ref_vae_shim(vae_mod)
    _patch_cpu_tensor(monkeypatch)

    NS = 2  # num_samp
    rng = np.random.default_rng(7)
    x_init = rng.normal(size=(B * NS, T, D)).astype(np.float32)
    cond = rng.normal(size=(B * NS, COND)).astype(np.float32)
    curr = rng.normal(size=(B * NS, 4)).astype(np.float32)
    curr[:, 2] = np.abs(curr[:, 2]) * 4.0
    target = rng.normal(size=(B, 2)).astype(np.float32) * 3.0
    # perturb_th=None: in the reference's plain perturb the cumulative clip
    # is dead code — `x_guidance = x_initial` aliases, in-place Adam moves
    # both, so x_delta == 0 always (guidance_loss.py:2239,2274-2279). Our
    # live clip follows the video_diffusion path (:2324-2328) instead; the
    # unclipped dynamics below are where the two implementations coincide.
    opt_params = dict(optimizer="adam", lr=0.3, grad_steps=2, perturb_th=None)

    # --- reference: PerturbationGuidance with decoder + transform ---
    pg = gmod.PerturbationGuidance(
        transform=lambda acts, db, tp, bsize=1, num_samp=1: (
            shim.convert_action_to_state_and_action(
                acts, torch.as_tensor(curr), scaled_input=True,
                descaled_output=True,
            )
        ),
        transform_params={},
    )
    pg.set_guidance(
        [[dict(name="target_pos", weight=1.0,
               params=dict(target_pos=target.tolist()), agents=None)]]
    )
    data_batch = {"scene_index": torch.zeros(B, dtype=torch.long)}
    x_ref = torch.as_tensor(x_init.copy())
    x_ref_out, _ = pg.perturb(
        x_ref, data_batch, opt_params, num_samp=NS,
        decoder=lambda z: ref_lstm.lstm_dec(z, torch.as_tensor(cond)),
    )
    x_ref_out = x_ref_out.detach().numpy()

    # --- ours: functional perturb with the same decode chain ---
    def decode_fn(z):
        acts = our_lstm.apply(
            {"params": lstm_params}, z, jnp.asarray(cond), method="decode"
        )
        traj = convert_action_to_state_and_action(
            acts, jnp.asarray(curr), _our_dyn(), TrajNormalizer(),
            descaled_output=True,
        )
        return traj.reshape(B, NS, T, 6)

    ctx = GuidanceContext(
        drivable_map=jnp.ones((B, 8, 8)),
        raster_from_agent=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        extent=jnp.ones((B, 3)),
        curr_speed=jnp.asarray(curr[:B, 2]),
        world_from_agent=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        scene_index=jnp.zeros((B,), jnp.int32),
    )
    x_ours = jax.jit(
        lambda x: perturb(
            x, ctx, [GuidanceSpec(TargetPosLoss(target_pos=target), 1.0)],
            decode_fn, lr=0.3, grad_steps=2, perturb_th=None,
        )
    )(jnp.asarray(x_init))

    assert not np.allclose(np.asarray(x_ours), x_init)  # it actually moved
    np.testing.assert_allclose(np.asarray(x_ours), x_ref_out, rtol=1e-4, atol=1e-5)


def _ref_diffuser_module(reference_env):
    """Import the reference tbsim.models.diffuser as a real package member
    (it uses relative imports, so file-location loading breaks); the
    reference_env fixture has already installed the torchvision/trajdata
    stubs and put reference/src on sys.path."""
    import importlib

    reference_env("models/dm/dm_model.py", "ref_dm_model")  # ensure sys.path
    return importlib.import_module("tbsim.models.diffuser")


def _diffuser_sched_shim(reference_env, *, p_mean_variance, pg,
                         guidance_optimization_params,
                         apply_guidance_output=False,
                         final_step_opt_params=None,
                         n_timesteps=N_TIMESTEPS):
    """DiffuserModel.__new__ shim exposing the REAL `p_sample`
    (`src/tbsim/models/diffuser.py:844-929`) — i.e. the real per-step
    guidance-optimization scheduling block — without constructing the full
    model: only the attributes p_sample reads are set, and p_mean_variance
    is injected by the caller."""
    dmod = _ref_diffuser_module(reference_env)
    shim = dmod.DiffuserModel.__new__(dmod.DiffuserModel)
    torch.nn.Module.__init__(shim)
    shim.current_perturbation_guidance = pg
    shim.guidance_optimization_params = guidance_optimization_params
    shim.apply_guidance_intermediate = True
    shim.apply_guidance_output = apply_guidance_output
    shim.final_step_opt_params = final_step_opt_params
    shim.n_timesteps = n_timesteps
    shim.p_mean_variance = p_mean_variance
    shim.diffuser_input_mode = "state"  # skip the trailing dyn conversion
    return shim


class _RecordingPG:
    """Stands in for PerturbationGuidance: records the (lr, perturb_th) the
    real scheduling block hands to perturb(), perturbs nothing."""

    def __init__(self):
        self.current_guidance = object()  # truthy: guidance is set
        self.calls = []

    def perturb(self, x_initial, data_batch, opt_params, num_samp=1,
                return_grad_of=None):
        self.calls.append((opt_params["lr"], opt_params["perturb_th"]))
        return x_initial, {}

    def compute_guidance_loss(self, *a, **k):
        return None, {}


def _scalar(v):
    if torch.is_tensor(v):
        return float(v.flatten()[0])
    return float(v)


def test_guidance_opt_schedule_series_parity(reference_env):
    """The per-step (lr, perturb_th) series our `guidance_opt_schedule`
    computes matches the series the REFERENCE's p_sample scheduling block
    (`diffuser.py:875-905`) hands to PerturbationGuidance.perturb, for all
    100 steps, in all three of-record modes:

    * perturb_th=None  -> th = posterior sigma at t (`scene_edit_config.py:79`)
    * explicit perturb_th -> sigmoid decay from ~4 down to the bound
    * lr=None          -> lr = sigma

    plus the t=0 skip: with apply_guidance_output=False (of record,
    `scene_edit_config.py:85`) the final step must NOT call perturb.
    """
    from cld_tpu.guidance.perturbation import guidance_opt_schedule
    from cld_tpu.ops.diffusion import make_schedule

    ref_dm = _ref_dm_model(reference_env, horizon=T, latent=D, cond=COND, dim=8)
    plv = ref_dm.posterior_log_variance_clipped  # [100] torch
    ours = make_schedule(N_TIMESTEPS)
    sig_ours = jnp.exp(0.5 * ours.posterior_log_variance_clipped)

    x = torch.as_tensor(
        np.random.default_rng(0).normal(size=(B, T, D)).astype(np.float32)
    )

    def run_series(opt_params):
        pg = _RecordingPG()

        def p_mean_variance(x=None, t=None, aux_info=None, class_free_guide_w=0.0):
            lv = torch.full((x.shape[0], 1, 1), float(plv[int(t[0])]))
            return x * 0.9, None, lv, (None, None, None)

        shim = _diffuser_sched_shim(
            reference_env, p_mean_variance=p_mean_variance, pg=pg,
            guidance_optimization_params=opt_params,
        )
        dmod = _ref_diffuser_module(reference_env)
        for i in reversed(range(N_TIMESTEPS)):
            t = torch.full((B,), i, dtype=torch.long)
            dmod.DiffuserModel.p_sample(shim, x, t, {}, aux_info={}, num_samp=1)
        return pg.calls

    # --- mode 1: config of record (lr 0.3, perturb_th None -> sigma) ---
    calls = run_series(dict(optimizer="adam", lr=0.3, grad_steps=1, perturb_th=None))
    assert len(calls) == N_TIMESTEPS - 1  # every step EXCEPT t=0 (skip of record)
    for step, (ref_lr, ref_th) in enumerate(calls):
        t = N_TIMESTEPS - 1 - step
        our_lr, our_th = guidance_opt_schedule(
            t, lr=0.3, perturb_th=None, sigma_schedule=sig_ours,
            n_timesteps=N_TIMESTEPS,
        )
        assert _scalar(ref_lr) == 0.3 and our_lr == 0.3
        np.testing.assert_allclose(_scalar(ref_th), float(our_th), rtol=1e-5)

    # --- mode 2: explicit bound -> sigmoid decay from ~4 to the bound ---
    calls = run_series(dict(optimizer="adam", lr=0.3, grad_steps=1, perturb_th=1.0))
    th_series = []
    for step, (_, ref_th) in enumerate(calls):
        t = N_TIMESTEPS - 1 - step
        _, our_th = guidance_opt_schedule(
            t, lr=0.3, perturb_th=1.0, sigma_schedule=None,
            n_timesteps=N_TIMESTEPS,
        )
        np.testing.assert_allclose(_scalar(ref_th), float(our_th), rtol=1e-5)
        th_series.append(_scalar(ref_th))
    assert th_series[0] > 3.9 and abs(th_series[-1] - th_series[0]) > 1.0

    # --- mode 3: lr=None -> lr = sigma ---
    calls = run_series(dict(optimizer="adam", lr=None, grad_steps=1, perturb_th=None))
    for step, (ref_lr, _) in enumerate(calls):
        t = N_TIMESTEPS - 1 - step
        our_lr, _ = guidance_opt_schedule(
            t, lr=None, perturb_th=None, sigma_schedule=sig_ours,
            n_timesteps=N_TIMESTEPS,
        )
        np.testing.assert_allclose(_scalar(ref_lr), float(our_lr), rtol=1e-5)

    # --- final-step opt params: apply_guidance_output=True routes t=0 to
    # final_step_opt_params (`diffuser.py:877-879`) ---
    pg = _RecordingPG()

    def pmv(x=None, t=None, aux_info=None, class_free_guide_w=0.0):
        lv = torch.full((x.shape[0], 1, 1), float(plv[int(t[0])]))
        return x * 0.9, None, lv, (None, None, None)

    final_params = dict(optimizer="adam", lr=0.3, grad_steps=1, perturb_th=1)
    shim = _diffuser_sched_shim(
        reference_env, p_mean_variance=pmv, pg=pg,
        guidance_optimization_params=dict(
            optimizer="adam", lr=0.3, grad_steps=1, perturb_th=None
        ),
        apply_guidance_output=True, final_step_opt_params=final_params,
    )
    dmod = _ref_diffuser_module(reference_env)
    dmod.DiffuserModel.p_sample(
        shim, x, torch.zeros(B, dtype=torch.long), {}, aux_info={}, num_samp=1
    )
    assert len(pg.calls) == 1 and pg.calls[0] == (0.3, 1)


class _DecoderBoundPG:
    """Adapter binding a latent decoder into the real
    PerturbationGuidance.perturb call the real p_sample makes (p_sample
    passes no decoder; the latent pipeline needs one)."""

    def __init__(self, pg, decoder):
        self._pg = pg
        self._decoder = decoder

    @property
    def current_guidance(self):
        return self._pg.current_guidance

    def perturb(self, x_initial, data_batch, opt_params, num_samp=1,
                return_grad_of=None):
        return self._pg.perturb(
            x_initial, data_batch, opt_params, num_samp=num_samp,
            decoder=self._decoder, return_grad_of=return_grad_of,
        )

    def compute_guidance_loss(self, *a, **k):
        return self._pg.compute_guidance_loss(*a, **k)


def test_guided_sampler_e2e_parity(reference_env, monkeypatch):
    """Full guided chain parity under the of-record optimization params
    (adam, lr 0.3, grad_steps 1, perturb_th None): the REFERENCE side runs
    the real `DiffuserModel.p_sample` per step — real scheduling block,
    real `PerturbationGuidance.perturb` Adam ascent through the real LSTM
    decoder + unicycle transform — over all 100 steps with injected UNet
    weights and an injected noise queue; ours runs the jitted guided
    `sample_traj` scan with `make_perturbation_guidance`.

    Clip-semantics note (documented divergence, guidance/perturbation.py):
    in the reference's plain `perturb` the perturb_th clip is DEAD CODE —
    `x_guidance = x_initial` aliases and torch.optim mutates in place, so
    the delta is always 0 and the of-record sigma threshold never binds
    (`guidance_loss.py:2239,2274-2279`). Our live clip follows the
    video_diffusion semantics instead, so for exact parity this test runs
    ours with the clip off (sigma_schedule=None) — the reference's
    EFFECTIVE of-record behavior. The th series itself is parity-tested in
    test_guidance_opt_schedule_series_parity; the live-clip behavior in
    test_guidance_stride.py.
    """
    from cld_tpu.algos.dm import sample_traj
    from cld_tpu.guidance.losses import GuidanceContext, TargetPosLoss
    from cld_tpu.guidance.perturbation import GuidanceSpec, make_perturbation_guidance
    from cld_tpu.models.temporal_unet import TemporalMapUnet
    from cld_tpu.models.vae import convert_action_to_state_and_action
    from cld_tpu.ops.diffusion import make_schedule
    from cld_tpu.ops.normalization import TrajNormalizer

    gmod = reference_env("src/tbsim/utils/guidance_loss.py", "ref_guidance_loss_e2e")
    vae_mod = reference_env("models/vae/vae_model.py", "ref_vae_model_ge2e")
    ref_dm = _ref_dm_model(reference_env, horizon=T, latent=D, cond=COND, dim=8)
    ref_dm.eval()
    unet_params = _unet_params_from_ref(ref_dm.model)
    ours_unet = TemporalMapUnet(transition_dim=D, output_dim=D, dim=8, dim_mults=(2, 4, 8))
    ref_lstm, our_lstm, lstm_params = _lstm_vae_pair(reference_env)
    vshim = _ref_vae_shim(vae_mod)
    _patch_cpu_tensor(monkeypatch)

    rng = np.random.default_rng(11)
    cond_np = rng.normal(size=(B, COND)).astype(np.float32)
    curr = rng.normal(size=(B, 4)).astype(np.float32)
    curr[:, 2] = np.abs(curr[:, 2]) * 4.0
    curr[:, 3] *= 0.3
    target = rng.normal(size=(B, 2)).astype(np.float32) * 3.0

    # shared noise queue: init latent + one draw per reverse step, the same
    # rng chain sample_traj uses
    rng0 = jax.random.key(21)
    rng_steps, init_rng = jax.random.split(rng0)
    x_init = np.asarray(jax.random.normal(init_rng, (B, T, D), jnp.float32))
    step_rngs = jax.random.split(rng_steps, N_TIMESTEPS)
    noise_queue = [
        np.asarray(jax.random.normal(r, (B, T, D), jnp.float32))
        for r in step_rngs
    ]
    drawn = {"i": 0}

    def fake_randn_like(ref, **kw):
        arr = noise_queue[drawn["i"]]
        drawn["i"] += 1
        assert tuple(ref.shape) == arr.shape
        return torch.as_tensor(arr)

    # --- reference: real p_sample per step, real perturb + Adam ---
    pg = gmod.PerturbationGuidance(
        transform=lambda acts, db, tp, bsize=1, num_samp=1: (
            vshim.convert_action_to_state_and_action(
                acts, torch.as_tensor(curr), scaled_input=True,
                descaled_output=True,
            )
        ),
        transform_params={},
    )
    pg.set_guidance(
        [[dict(name="target_pos", weight=1.0,
               params=dict(target_pos=target.tolist()), agents=None)]]
    )
    bound_pg = _DecoderBoundPG(
        pg, decoder=lambda z: ref_lstm.lstm_dec(z, torch.as_tensor(cond_np))
    )

    def p_mean_variance(x=None, t=None, aux_info=None, class_free_guide_w=0.0):
        with torch.no_grad():
            eps = ref_dm.model(x, aux_info, t)
            mean, log_var = ref_dm.x_tminus1_mean_var(x, eps, t)
        return mean, None, log_var, (None, None, None)

    shim = _diffuser_sched_shim(
        reference_env, p_mean_variance=p_mean_variance, pg=bound_pg,
        guidance_optimization_params=dict(
            optimizer="adam", lr=0.3, grad_steps=1, perturb_th=None
        ),
    )
    dmod = _ref_diffuser_module(reference_env)
    monkeypatch.setattr(torch, "randn_like", fake_randn_like)
    aux_info = {"cond_feat": torch.as_tensor(cond_np)}
    x_ref = torch.as_tensor(x_init.copy())
    for i in reversed(range(N_TIMESTEPS)):
        t = torch.full((B,), i, dtype=torch.long)
        x_ref, _ = dmod.DiffuserModel.p_sample(
            shim, x_ref, t, {"scene_index": torch.zeros(B, dtype=torch.long)},
            aux_info=aux_info, num_samp=1,
        )
    assert drawn["i"] == N_TIMESTEPS
    monkeypatch.undo()
    x0_ref = x_ref.detach().numpy()

    # --- ours: guided sample_traj scan under the same noise ---
    def denoise_fn(x, c, t):
        return ours_unet.apply({"params": unet_params}, x, c, t)

    def decode_fn(z):
        acts = our_lstm.apply(
            {"params": lstm_params}, z, jnp.asarray(cond_np), method="decode"
        )
        traj = convert_action_to_state_and_action(
            acts, jnp.asarray(curr), _our_dyn(), TrajNormalizer(),
            descaled_output=True,
        )
        return traj.reshape(B, 1, T, 6)

    ctx = GuidanceContext(
        drivable_map=jnp.ones((B, 8, 8)),
        raster_from_agent=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        extent=jnp.ones((B, 3)),
        curr_speed=jnp.asarray(curr[:, 2]),
        world_from_agent=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        scene_index=jnp.zeros((B,), jnp.int32),
    )
    gfn = make_perturbation_guidance(
        ctx, [GuidanceSpec(TargetPosLoss(target_pos=target), 1.0)],
        decode_fn, lr=0.3, grad_steps=1, perturb_th=None, sigma_schedule=None,
    )
    out = jax.jit(
        lambda c: sample_traj(
            denoise_fn, make_schedule(N_TIMESTEPS), rng0, c, T, D,
            num_samp=1, guidance_fn=gfn,
        )
    )(jnp.asarray(cond_np))

    x0_ours = np.asarray(out["pred_traj"])
    # guidance must have steered the chain (compare vs the unguided sampler
    # under the same noise)
    out_plain = jax.jit(
        lambda c: sample_traj(
            denoise_fn, make_schedule(N_TIMESTEPS), rng0, c, T, D, num_samp=1
        )
    )(jnp.asarray(cond_np))
    assert float(jnp.max(jnp.abs(out["pred_traj"] - out_plain["pred_traj"]))) > 0.1
    np.testing.assert_allclose(x0_ours, x0_ref, rtol=1e-3, atol=2e-3)

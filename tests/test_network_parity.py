"""Golden parity tests vs the reference torch networks (VERDICT #6).

Loads the real reference modules (torchvision/trajdata stubbed in
conftest.install_reference_stubs) and asserts OUR flax modules reproduce
their outputs under injected weights:

* DDPM schedule buffers (dm_model.py:29-56) — all 13 buffers;
* LSTM-VAE encoder heads + decoder (lstm_vae.py:6-99);
* TemporalMapUnet forward (temporal.py:49-180).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


class AttrDict(dict):
    __getattr__ = dict.__getitem__


def _ref_dm_model(reference_env, horizon=8, latent=4, cond=16, dim=8):
    mod = reference_env("models/dm/dm_model.py", "ref_dm_model")
    if mod is None:
        pytest.skip("reference dm_model missing")
    cfg = AttrDict(
        horizon=horizon, step_time=0.1, vae=AttrDict(latent_size=latent),
        cond_feat_dim=cond, base_dim=dim, dim_mults=(2, 4, 8),
        dynamics=AttrDict(type="Unicycle", max_steer=0.5, max_yawvel=6.28,
                          acce_bound=(-10, 8)),
    )
    torch.manual_seed(0)
    return mod.DmModel(cfg, None, n_timesteps=100)


SCHEDULE_BUFFERS = [
    "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
    "posterior_variance", "posterior_log_variance_clipped",
    "posterior_mean_coef1", "posterior_mean_coef2", "x_t_cof", "noise_cof",
]


def test_schedule_buffers_match_reference(reference_env):
    from cld_tpu.ops.diffusion import make_schedule

    ref = _ref_dm_model(reference_env)
    ours = make_schedule(100)
    for name in SCHEDULE_BUFFERS:
        want = getattr(ref, name).numpy()
        got = np.asarray(getattr(ours, name))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7, err_msg=name)


def _t2j(w):
    return jnp.asarray(w.detach().numpy())


def _dense_from_linear(linear):
    return {"kernel": _t2j(linear.weight).T, "bias": _t2j(linear.bias)}


def _cell_params_from_torch_lstm(lstm, layer):
    """torch nn.LSTM layer -> flax OptimizedLSTMCell params. Both use gate
    order (i, f, g, o); torch fuses [4H, in] matrices, flax splits per-gate
    Dense kernels with the bias carried on the hidden-side gates."""
    H = lstm.hidden_size
    w_ih = getattr(lstm, f"weight_ih_l{layer}").detach().numpy()  # [4H, I]
    w_hh = getattr(lstm, f"weight_hh_l{layer}").detach().numpy()  # [4H, H]
    b = (
        getattr(lstm, f"bias_ih_l{layer}") + getattr(lstm, f"bias_hh_l{layer}")
    ).detach().numpy()
    out = {}
    for g, name in enumerate("ifgo"):
        sl = slice(g * H, (g + 1) * H)
        out[f"i{name}"] = {"kernel": jnp.asarray(w_ih[sl].T)}
        out[f"h{name}"] = {
            "kernel": jnp.asarray(w_hh[sl].T),
            "bias": jnp.asarray(b[sl]),
        }
    return out


def _stack_params(ref_enc_or_dec):
    """Reference Encoder/Decoder -> our _CondLSTMStack param subtree."""
    p = {"cond2hidden": _dense_from_linear(ref_enc_or_dec.cond2hidden)}
    for layer in range(ref_enc_or_dec.lstm.num_layers):
        p[f"lstm_{layer}"] = _cell_params_from_torch_lstm(ref_enc_or_dec.lstm, layer)
    return p


def test_lstm_vae_parity(reference_env):
    """Encoder mean/logvar heads and decoder actions match the reference
    LSTM-VAE under injected weights (lstm_vae.py:6-99)."""
    mod = reference_env("models/vae/lstm_vae.py", "ref_lstm_vae")
    torch.manual_seed(1)
    H, L, COND = 16, 4, 256  # cond_dim fixed at 256 inside the reference
    ref = mod.LSTMVAE(6, H, L, 2, device=torch.device("cpu")).eval()

    from cld_tpu.models.lstm import LSTMVAE

    ours = LSTMVAE(input_size=6, hidden_size=H, latent_size=L, output_size=2)
    x = np.random.default_rng(0).normal(size=(3, 10, 6)).astype(np.float32)
    cond = np.random.default_rng(1).normal(size=(3, COND)).astype(np.float32)

    variables = ours.init(
        {"params": jax.random.key(0)}, jnp.asarray(x), jnp.asarray(cond)
    )
    params = {
        "lstm_enc": {"stack": _stack_params(ref.lstm_enc)},
        "lstm_dec": {
            "stack": _stack_params(ref.lstm_dec),
            "hid2act": _dense_from_linear(ref.lstm_dec.hid2act),
        },
        "mu": _dense_from_linear(ref.mu),
        "logvar": _dense_from_linear(ref.logvar),
    }
    # structural agreement between the injected tree and the real init
    # (leaf paths + shapes; container types may differ: dict vs FrozenDict)
    def leaf_shapes(tree):
        return {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_leaves_with_path(tree)
        }

    assert leaf_shapes(params) == leaf_shapes(variables["params"])

    with torch.no_grad():
        h_ref = ref.lstm_enc(torch.as_tensor(x), torch.as_tensor(cond))
        mean_ref = ref.mu(h_ref).numpy()
        logvar_ref = ref.logvar(h_ref).numpy()

    _, mean, logvar = ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(cond), method="traj2z"
    )
    np.testing.assert_allclose(np.asarray(mean), mean_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar), logvar_ref, rtol=1e-4, atol=1e-5)

    z = np.random.default_rng(2).normal(size=(3, 10, L)).astype(np.float32)
    with torch.no_grad():
        act_ref = ref.lstm_dec(torch.as_tensor(z), torch.as_tensor(cond)).numpy()
    act = ours.apply(
        {"params": params}, jnp.asarray(z), jnp.asarray(cond), method="decode"
    )
    np.testing.assert_allclose(np.asarray(act), act_ref, rtol=1e-4, atol=1e-5)


def _conv_params(tconv):
    return {
        "kernel": _t2j(tconv.weight).transpose(2, 1, 0),
        "bias": _t2j(tconv.bias),
    }


def _conv1dblock_params(ref_block):
    conv, _, gn, _, _ = ref_block.block
    return {
        "conv": _conv_params(conv),
        "norm": {"scale": _t2j(gn.weight), "bias": _t2j(gn.bias)},
    }


def _resblock_params(ref_res):
    p = {
        "block0": _conv1dblock_params(ref_res.blocks[0]),
        "block1": _conv1dblock_params(ref_res.blocks[1]),
        "time_dense": _dense_from_linear(ref_res.time_mlp[1]),
    }
    if not isinstance(ref_res.residual_conv, torch.nn.Identity):
        p["residual_conv"] = _conv_params(ref_res.residual_conv)
    return p


def test_temporal_unet_parity(reference_env):
    """Full TemporalMapUnet forward matches the reference under injected
    weights (temporal.py:49-180), including down/up ladders, skip concat,
    GroupNorm+Mish conv blocks, and the stride-2 transposed-conv upsample
    (flax kernel = flipped torch ConvTranspose1d kernel)."""
    ref = _ref_dm_model(reference_env, horizon=8, latent=4, cond=16, dim=8)
    ref_unet = ref.model.eval()

    from cld_tpu.models.temporal_unet import TemporalMapUnet

    ours = TemporalMapUnet(transition_dim=4, output_dim=4, dim=8, dim_mults=(2, 4, 8))

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

    B, T = 3, 8
    x = np.random.default_rng(0).normal(size=(B, T, 4)).astype(np.float32)
    cond = np.random.default_rng(1).normal(size=(B, 16)).astype(np.float32)
    t = np.array([0, 37, 99], np.int64)

    variables = ours.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t)
    )

    def leaf_shapes(tree):
        return {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_leaves_with_path(tree)
        }

    assert leaf_shapes(params) == leaf_shapes(variables["params"])

    with torch.no_grad():
        out_ref = ref_unet(
            torch.as_tensor(x), {"cond_feat": torch.as_tensor(cond)},
            torch.as_tensor(t),
        ).numpy()
    out = ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t)
    )
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-4, atol=2e-5)

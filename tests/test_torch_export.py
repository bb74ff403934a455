"""Torch-checkpoint exporter validation (cld_tpu/utils/torch_export.py).

Two complementary checks per converter:
  * round-trip: export(flax) -> import == the original flax tree
    (bitwise, since both directions are pure layout shuffles);
  * strict torch load: a live torch module with the reference key layout
    accepts the exported dict with ``strict=True`` and its forward matches
    the flax forward under the exported weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cld_tpu.utils.torch_export import (
    export_checkpoint,
    export_dm_checkpoint,
    export_lstm_vae,
    export_mlp,
    export_resnet,
    export_temporal_unet,
    export_vae_checkpoint,
    save_state_dict_file,
)
from cld_tpu.utils.torch_import import (
    import_dm_checkpoint,
    import_lstm_vae,
    import_mlp,
    import_resnet,
    import_temporal_unet,
    import_vae_checkpoint,
)

from test_torch_import import _RefMLP, _TvResNet18, _RefContextEncoder, _randomize_bn_stats
from test_network_parity import _ref_dm_model


def _trees_equal(a, b):
    eq = jax.tree_util.tree_map(lambda x, y: bool(jnp.array_equal(x, y)), a, b)
    return all(jax.tree_util.tree_leaves(eq))


# ------------------------------------------------------------------ MLP


def test_export_mlp_roundtrip_and_strict_load():
    from cld_tpu.models.nets import MLP

    ours = MLP(64, layer_dims=(64, 64), normalization=True)
    x = np.random.default_rng(0).normal(size=(5, 4)).astype(np.float32)
    params = ours.init(jax.random.key(0), jnp.asarray(x))["params"]

    sd = export_mlp(params)
    assert _trees_equal(import_mlp(sd), params)

    ref = _RefMLP(4, 64, (64, 64)).eval()
    ref.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()}, strict=True)
    with torch.no_grad():
        want = ref(torch.as_tensor(x)).numpy()
    got = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ LSTM-VAE


def test_export_lstm_vae_roundtrip_and_strict_load(reference_env):
    mod = reference_env("models/vae/lstm_vae.py", "te_lstm_vae")
    from cld_tpu.models.lstm import LSTMVAE

    H, L, COND = 16, 4, 256
    ours = LSTMVAE(input_size=6, hidden_size=H, latent_size=L, output_size=2)
    x = np.random.default_rng(0).normal(size=(3, 10, 6)).astype(np.float32)
    cond = np.random.default_rng(1).normal(size=(3, COND)).astype(np.float32)
    params = ours.init({"params": jax.random.key(1)}, jnp.asarray(x),
                       jnp.asarray(cond))["params"]

    sd = export_lstm_vae(params)
    assert _trees_equal(import_lstm_vae(sd, root="lstmvae"), params)

    ref = mod.LSTMVAE(6, H, L, 2, device=torch.device("cpu")).eval()
    bare = {k[len("lstmvae."):]: torch.as_tensor(v) for k, v in sd.items()}
    ref.load_state_dict(bare, strict=True)

    z = np.random.default_rng(2).normal(size=(3, 10, L)).astype(np.float32)
    with torch.no_grad():
        h = ref.lstm_enc(torch.as_tensor(x), torch.as_tensor(cond))
        mean_ref = ref.mu(h).numpy()
        act_ref = ref.lstm_dec(torch.as_tensor(z), torch.as_tensor(cond)).numpy()
    _, mean, _ = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(cond),
                            method="traj2z")
    act = ours.apply({"params": params}, jnp.asarray(z), jnp.asarray(cond),
                     method="decode")
    np.testing.assert_allclose(np.asarray(mean), mean_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(act), act_ref, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ ResNet


def test_export_resnet_roundtrip_and_strict_load():
    from cld_tpu.models.resnet import ResNetEncoder

    ours = ResNetEncoder(arch="resnet18", feature_dim=32)
    x = np.random.default_rng(4).normal(size=(2, 32, 32, 7)).astype(np.float32)
    init = ours.init(jax.random.key(2), jnp.asarray(x))
    params, stats = init["params"], init["batch_stats"]

    sd = export_resnet(params, stats)
    rt_params, rt_stats = import_resnet(sd)
    assert _trees_equal(rt_params, params) and _trees_equal(rt_stats, stats)

    ref = _TvResNet18(in_ch=7, feature_dim=32).eval()
    ref.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()}, strict=True)
    with torch.no_grad():
        want = ref(torch.as_tensor(x.transpose(0, 3, 1, 2).copy())).numpy()
    got = ours.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                     train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


# ------------------------------------------------------------------ UNet


def test_export_temporal_unet_roundtrip_and_strict_load(reference_env):
    from cld_tpu.models.temporal_unet import TemporalMapUnet

    ours = TemporalMapUnet(transition_dim=4, output_dim=4, dim=8, dim_mults=(2, 4, 8))
    B, T = 3, 8
    x = np.random.default_rng(0).normal(size=(B, T, 4)).astype(np.float32)
    cond = np.random.default_rng(1).normal(size=(B, 16)).astype(np.float32)
    t = np.array([0, 37, 99], np.int64)
    params = ours.init(jax.random.key(3), jnp.asarray(x), jnp.asarray(cond),
                       jnp.asarray(t))["params"]

    # round-trip through the full dm. prefix chain
    sd = export_dm_checkpoint({"params": params})
    assert _trees_equal(import_dm_checkpoint(sd)["params"], params)

    ref = _ref_dm_model(reference_env, horizon=8, latent=4, cond=16, dim=8)
    ref_unet = ref.model.eval()
    bare = {k[len("dm.model."):]: torch.as_tensor(v) for k, v in sd.items()}
    ref_unet.load_state_dict(bare, strict=True)
    with torch.no_grad():
        want = ref_unet(torch.as_tensor(x), {"cond_feat": torch.as_tensor(cond)},
                        torch.as_tensor(t)).numpy()
    got = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(cond),
                     jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


# ------------------------------------------------------------------ full ckpt


def test_export_vae_checkpoint_roundtrip_and_file(tmp_path):
    """Full VaeModel variables -> vae.-prefixed Lightning file -> imported
    back bitwise; the torch context encoder strict-loads the subtree."""
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.models.vae import VaeModel
    from cld_tpu.utils.torch_import import load_state_dict_file

    H, L, T = 16, 4, 8
    batch = synthetic_batch(seed=0, batch_size=2, raster_size=32, hist_frames=4,
                            horizon=T, num_neighbors=2)
    ours = VaeModel(vae_hidden_size=H, vae_latent_size=L, horizon=T)
    init = ours.init({"params": jax.random.key(4), "sample": jax.random.key(5)},
                     batch, beta=1.0)
    variables = {"params": init["params"], "batch_stats": init["batch_stats"]}

    sd = export_vae_checkpoint(variables)
    assert all(k.startswith("vae.") for k in sd)
    rt = import_vae_checkpoint(sd)
    assert _trees_equal(rt["params"], variables["params"])
    assert _trees_equal(rt["batch_stats"], variables["batch_stats"])

    # context-encoder subtree strict-loads into live torch modules
    in_ch = batch.image.shape[-1]
    ref_ctx = _RefContextEncoder(in_ch, 64, 256, 256).eval()
    ctx_sd = {
        k[len("vae.context_encoder."):]: torch.as_tensor(v)
        for k, v in sd.items() if k.startswith("vae.context_encoder.")
    }
    ref_ctx.load_state_dict(ctx_sd, strict=True)

    # file round-trip via the Lightning-shaped container
    path = str(tmp_path / "export.ckpt")
    save_state_dict_file(path, sd, meta={"epoch": 1})
    loaded = load_state_dict_file(path)
    assert set(loaded) == set(sd)
    np.testing.assert_array_equal(loaded["vae.lstmvae.mu.weight"],
                                  np.asarray(sd["vae.lstmvae.mu.weight"]))


def test_export_checkpoint_kinds():
    with pytest.raises(ValueError):
        export_checkpoint({}, "nope")

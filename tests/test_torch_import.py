"""Torch-checkpoint importer validation (cld_tpu/utils/torch_import.py).

Each converter is validated NUMERICALLY: a real torch module with the
reference's state-dict key layout is initialised randomly, its state dict is
exported to numpy, imported, and the flax forward must match the torch
forward. The torchvision trunk (absent on this box) is reproduced by a
minimal in-test ResNet-18 that uses torchvision's exact parameter naming.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from cld_tpu.utils.torch_import import (
    import_context_encoder,
    import_dm_checkpoint,
    import_lstm_vae,
    import_mlp,
    import_resnet,
    import_temporal_unet,
    import_vae_checkpoint,
)

from test_network_parity import AttrDict, _ref_dm_model


def _sd(module, prefix=""):
    return {
        (f"{prefix}.{k}" if prefix else k): v.detach().numpy()
        for k, v in module.state_dict().items()
    }


def _leaf_shapes(tree):
    return {
        jax.tree_util.keystr(k): tuple(v.shape)
        for k, v in jax.tree_util.tree_leaves_with_path(tree)
    }


# ------------------------------------------------------------------ MLP


class _RefMLP(tnn.Module):
    """Reference base_models.MLP key layout (`base_models.py:52-71`):
    hidden Linear+LayerNorm+ReLU triplets inside ``_model``."""

    def __init__(self, input_dim, output_dim, layer_dims, normalization=True):
        super().__init__()
        layers, dim = [], input_dim
        for width in layer_dims:
            layers.append(tnn.Linear(dim, width))
            if normalization:
                layers.append(tnn.LayerNorm(width))
            layers.append(tnn.ReLU())
            dim = width
        layers.append(tnn.Linear(dim, output_dim))
        self._model = tnn.Sequential(*layers)

    def forward(self, x):
        return self._model(x)


def test_import_mlp_forward_parity():
    from cld_tpu.models.nets import MLP

    torch.manual_seed(0)
    ref = _RefMLP(4, 64, (64, 64)).eval()
    params = import_mlp(_sd(ref))

    ours = MLP(64, layer_dims=(64, 64), normalization=True)
    x = np.random.default_rng(0).normal(size=(5, 4)).astype(np.float32)
    init = ours.init(jax.random.key(0), jnp.asarray(x))
    assert _leaf_shapes(params) == _leaf_shapes(init["params"])

    with torch.no_grad():
        want = ref(torch.as_tensor(x)).numpy()
    got = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ LSTM-VAE


def test_import_lstm_vae_forward_parity(reference_env):
    mod = reference_env("models/vae/lstm_vae.py", "ti_lstm_vae")
    torch.manual_seed(1)
    H, L, COND = 16, 4, 256
    ref = mod.LSTMVAE(6, H, L, 2, device=torch.device("cpu")).eval()

    from cld_tpu.models.lstm import LSTMVAE

    params = import_lstm_vae(_sd(ref, "lstmvae"), root="lstmvae")
    ours = LSTMVAE(input_size=6, hidden_size=H, latent_size=L, output_size=2)

    x = np.random.default_rng(0).normal(size=(3, 10, 6)).astype(np.float32)
    cond = np.random.default_rng(1).normal(size=(3, COND)).astype(np.float32)
    z = np.random.default_rng(2).normal(size=(3, 10, L)).astype(np.float32)

    init = ours.init({"params": jax.random.key(0)}, jnp.asarray(x), jnp.asarray(cond))
    assert _leaf_shapes(params) == _leaf_shapes(init["params"])

    with torch.no_grad():
        h = ref.lstm_enc(torch.as_tensor(x), torch.as_tensor(cond))
        mean_ref = ref.mu(h).numpy()
        act_ref = ref.lstm_dec(torch.as_tensor(z), torch.as_tensor(cond)).numpy()

    _, mean, _ = ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(cond), method="traj2z"
    )
    act = ours.apply(
        {"params": params}, jnp.asarray(z), jnp.asarray(cond), method="decode"
    )
    np.testing.assert_allclose(np.asarray(mean), mean_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(act), act_ref, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ UNet


def test_import_temporal_unet_forward_parity(reference_env):
    ref = _ref_dm_model(reference_env, horizon=8, latent=4, cond=16, dim=8)
    ref_unet = ref.model.eval()

    from cld_tpu.models.temporal_unet import TemporalMapUnet

    # dm_trainer checkpoints carry the UNet under ``dm.model.`` — exercise
    # the full prefix chain import_dm_checkpoint -> import_temporal_unet.
    variables = import_dm_checkpoint(_sd(ref_unet, "dm.model"))
    params = variables["params"]
    bare = import_temporal_unet(_sd(ref_unet, "model"))  # same tree
    assert all(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a, b: bool(jnp.array_equal(a, b)), params, bare)
        )
    )

    ours = TemporalMapUnet(transition_dim=4, output_dim=4, dim=8, dim_mults=(2, 4, 8))
    B, T = 3, 8
    x = np.random.default_rng(0).normal(size=(B, T, 4)).astype(np.float32)
    cond = np.random.default_rng(1).normal(size=(B, 16)).astype(np.float32)
    t = np.array([0, 37, 99], np.int64)

    init = ours.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t))
    assert _leaf_shapes(params) == _leaf_shapes(init["params"])

    with torch.no_grad():
        want = ref_unet(
            torch.as_tensor(x), {"cond_feat": torch.as_tensor(cond)}, torch.as_tensor(t)
        ).numpy()
    got = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


# ------------------------------------------------------------------ ResNet


class _TvBasicBlock(tnn.Module):
    """torchvision BasicBlock parameter naming (conv1/bn1/conv2/bn2 +
    downsample Sequential[conv, bn])."""

    def __init__(self, inp, out, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, out, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out)
        self.conv2 = tnn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, out, 1, stride, bias=False), tnn.BatchNorm2d(out)
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + identity)


class _TvResNet18(tnn.Module):
    """Minimal torchvision-named ResNet-18 with the reference's widened
    conv1 + Dense head (`base_models.py:581-610`)."""

    def __init__(self, in_ch=7, feature_dim=32):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [64, 128, 256, 512]
        inp = 64
        for s, ch in enumerate(chans):
            stride = 1 if s == 0 else 2
            layer = tnn.Sequential(
                _TvBasicBlock(inp, ch, stride), _TvBasicBlock(ch, ch, 1)
            )
            setattr(self, f"layer{s + 1}", layer)
            inp = ch
        self.fc = tnn.Linear(512, feature_dim)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def _randomize_bn_stats(module, rng):
    """Init-state running stats (mean 0 / var 1) would hide transpose bugs —
    give every BatchNorm distinct stats and affine."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = m.running_mean.numel()
            m.running_mean.copy_(torch.as_tensor(rng.normal(size=n) * 0.3, dtype=torch.float32))
            m.running_var.copy_(torch.as_tensor(np.abs(rng.normal(size=n)) + 0.5, dtype=torch.float32))
            m.weight.data.copy_(torch.as_tensor(rng.normal(size=n) * 0.2 + 1.0, dtype=torch.float32))
            m.bias.data.copy_(torch.as_tensor(rng.normal(size=n) * 0.1, dtype=torch.float32))


def test_import_resnet_forward_parity():
    from cld_tpu.models.resnet import ResNetEncoder

    torch.manual_seed(2)
    ref = _TvResNet18(in_ch=7, feature_dim=32).eval()
    _randomize_bn_stats(ref, np.random.default_rng(3))

    params, stats = import_resnet(_sd(ref))
    ours = ResNetEncoder(arch="resnet18", feature_dim=32)

    x = np.random.default_rng(4).normal(size=(2, 32, 32, 7)).astype(np.float32)
    init = ours.init(jax.random.key(0), jnp.asarray(x))
    assert _leaf_shapes(params) == _leaf_shapes(init["params"])
    assert _leaf_shapes(stats) == _leaf_shapes(init["batch_stats"])

    with torch.no_grad():
        want = ref(torch.as_tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = ours.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


# ------------------------------------------------------------------ full ckpt


class _RefContextEncoder(tnn.Module):
    """ContextEncoder key layout (`models/context_utils.py:8-38`): the
    map trunk sits under ``map_encoder.encoder_heads.map_model`` because the
    reference wraps RasterizedMapEncoder in create_feature_extractor
    (`diffuser_helpers.py:309-323`)."""

    def __init__(self, in_ch, curr_dim=8, map_dim=16, cond_dim=16):
        super().__init__()
        self.agent_state_encoder = _RefMLP(4, curr_dim, (curr_dim, curr_dim))
        heads = tnn.Module()
        heads.map_model = _TvResNet18(in_ch=in_ch, feature_dim=map_dim)
        self.map_encoder = tnn.Module()
        self.map_encoder.encoder_heads = heads
        combo = curr_dim + map_dim
        self.process_cond_mlp = _RefMLP(combo, cond_dim, (combo, combo, cond_dim, cond_dim))

    def forward(self, curr_states, image_nchw):
        a = self.agent_state_encoder(curr_states)
        m = self.map_encoder.encoder_heads.map_model(image_nchw)
        return self.process_cond_mlp(torch.cat([a, m], dim=-1))


def test_import_vae_checkpoint_matches_model_init_and_forward(reference_env):
    """Full Lightning-style VAE checkpoint (``vae.`` prefix) -> our VaeModel
    variables: tree congruence with VaeModel.init AND numeric parity of the
    context-encoder path against the torch modules."""
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.models.vae import VaeModel

    H, L = 16, 4
    CURR, MAP, COND = 64, 256, 256
    T = 8
    batch = synthetic_batch(
        seed=0, batch_size=2, raster_size=32, hist_frames=4, horizon=T,
        num_neighbors=2,
    )
    in_ch = batch.image.shape[-1]

    torch.manual_seed(5)
    mod = reference_env("models/vae/lstm_vae.py", "ti_lstm_vae_full")
    ref_lstm = mod.LSTMVAE(6, H, L, 2, device=torch.device("cpu")).eval()
    ref_ctx = _RefContextEncoder(in_ch, CURR, MAP, COND).eval()
    _randomize_bn_stats(ref_ctx, np.random.default_rng(6))

    ckpt = {"state_dict": {**_sd(ref_lstm, "vae.lstmvae"), **_sd(ref_ctx, "vae.context_encoder")}}
    # buffers like num_batches_tracked ride along in real checkpoints
    assert any(k.endswith("num_batches_tracked") for k in ckpt["state_dict"])

    variables = import_vae_checkpoint(ckpt["state_dict"])

    ours = VaeModel(vae_hidden_size=H, vae_latent_size=L, horizon=T)
    init = ours.init(
        {"params": jax.random.key(1), "sample": jax.random.key(2)}, batch, beta=1.0
    )
    assert _leaf_shapes(variables["params"]) == _leaf_shapes(init["params"])
    assert _leaf_shapes(variables["batch_stats"]) == _leaf_shapes(init["batch_stats"])

    # context-encoder numeric parity through the imported tree
    from cld_tpu.data.batch import get_current_states
    from cld_tpu.models.context import ContextEncoder

    curr = np.asarray(get_current_states(batch))
    with torch.no_grad():
        want = ref_ctx(
            torch.as_tensor(curr),
            torch.as_tensor(np.asarray(batch.image).transpose(0, 3, 1, 2)),
        ).numpy()
    ctx = ContextEncoder(curr_state_feat_dim=CURR, map_feature_dim=MAP, cond_feat_dim=COND)
    got = ctx.apply(
        {
            "params": variables["params"]["context_encoder"],
            "batch_stats": variables["batch_stats"]["context_encoder"],
        },
        batch,
        train=False,
    )["cond_feat"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_import_context_encoder_finds_bare_map_model():
    """RasterizedMapEncoder checkpoints without the feature-extractor wrapper
    (``map_encoder.map_model``) resolve too."""
    torch.manual_seed(7)
    trunk = _TvResNet18(in_ch=3, feature_dim=8).eval()
    sd = {**_sd(trunk, "map_encoder.map_model")}
    mlp = _RefMLP(4, 8, (8,))
    sd.update(_sd(mlp, "agent_state_encoder"))
    sd.update(_sd(_RefMLP(16, 8, (8,)), "process_cond_mlp"))
    params, stats = import_context_encoder(sd, root="")
    assert "conv1" in params["map_encoder"]
    assert "bn1" in stats["map_encoder"]

"""Import reference torch checkpoints into cld_tpu flax variable trees.

Migration path for users of the reference repo: the Lightning checkpoints
written by its trainers (`src/trainers/vae_trainer.py:17` saves under the
``vae.`` prefix, `dm_trainer.py:23,40` under ``dm.``/``vae.``, mirrored by
the prefix-strip loader in `utils/trainer_utils.py:30-43`) are converted to
the exact pytrees our `VaeModel` / `TemporalMapUnet` initialise, so a
reference-trained model can be rolled out / fine-tuned on TPU unchanged.

Everything here operates on a ``{qualified_name: np.ndarray}`` state dict —
torch is only needed to *read* a ``.ckpt`` file (`load_state_dict_file`),
never to convert. Layout conventions translated:

* Linear ``[out, in]`` -> Dense kernel ``[in, out]``;
* Conv1d ``[out, in, k]`` -> flax ``[k, in, out]``; Conv2d ``[out, in, kh,
  kw]`` -> ``[kh, kw, in, out]``; ConvTranspose1d ``[in, out, k]`` -> flax
  ConvTranspose kernel flipped along k (see tests/test_network_parity.py);
* torch fused-gate LSTM ``weight_ih_l{n}`` ``[4H, I]`` (gate order i,f,g,o)
  -> per-gate flax `OptimizedLSTMCell` Dense kernels, the two torch biases
  summed onto the hidden-side gates;
* torchvision ResNet BatchNorm running stats -> the ``batch_stats``
  collection.

CLI: ``python -m cld_tpu.utils.torch_import --ckpt iter..ckpt --kind vae
--out runs/imported_vae`` writes an orbax dir loadable by `--ckpt` flags of
rollout.py / eval composers (training/checkpoints.py:save_pytree).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

Array = Any
StateDict = Dict[str, np.ndarray]


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def load_state_dict_file(path: str) -> StateDict:
    """Read a torch ``.ckpt``/``.pt`` file -> numpy state dict.

    Lightning checkpoints keep weights under ``"state_dict"``; raw
    ``torch.save(model.state_dict())`` files are the dict itself.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _np(v) for k, v in obj.items()}


def submap(sd: StateDict, prefix: str) -> StateDict:
    """Keys under ``prefix`` with the prefix stripped (trainer_utils.py:30-39)."""
    if prefix and not prefix.endswith("."):
        prefix += "."
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _dense(sd: StateDict, key: str) -> Dict[str, Array]:
    w = _np(sd[f"{key}.weight"])
    out = {"kernel": jnp.asarray(w.T)}
    if f"{key}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{key}.bias"]))
    return out


def _conv1d(sd: StateDict, key: str, bias: bool = True) -> Dict[str, Array]:
    w = _np(sd[f"{key}.weight"])  # [out, in, k]
    out = {"kernel": jnp.asarray(w.transpose(2, 1, 0))}
    if bias and f"{key}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{key}.bias"]))
    return out


def _conv2d(sd: StateDict, key: str) -> Dict[str, Array]:
    w = _np(sd[f"{key}.weight"])  # [out, in, kh, kw]
    out = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{key}.bias"]))
    return out


def _convtranspose1d(sd: StateDict, key: str) -> Dict[str, Array]:
    w = _np(sd[f"{key}.weight"])  # [in, out, k]
    return {
        "kernel": jnp.asarray(w.transpose(2, 0, 1)[::-1].copy()),
        "bias": jnp.asarray(_np(sd[f"{key}.bias"])),
    }


def _norm_affine(sd: StateDict, key: str) -> Dict[str, Array]:
    """GroupNorm/LayerNorm/BatchNorm affine -> flax {scale, bias}."""
    return {
        "scale": jnp.asarray(_np(sd[f"{key}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{key}.bias"])),
    }


# ---------------------------------------------------------------- MLP

def import_mlp(sd: StateDict, root: str = "") -> Dict[str, Any]:
    """Reference ``base_models.MLP`` (`base_models.py:21-71`) -> our
    `models.nets.MLP` params.

    The torch module registers its layers as ``_model.{i}`` in a Sequential
    whose indices skip activations; Linear (2-D weight) and LayerNorm (1-D
    weight) entries are told apart by ndim. The last Linear is our
    ``dense_out``.
    """
    base = f"{root}._model" if root else "_model"
    idxs = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(re.escape(base) + r"\.(\d+)\.weight", k))
    )
    linears = [i for i in idxs if _np(sd[f"{base}.{i}.weight"]).ndim == 2]
    norms = [i for i in idxs if _np(sd[f"{base}.{i}.weight"]).ndim == 1]
    params: Dict[str, Any] = {}
    for n, i in enumerate(linears[:-1]):
        params[f"dense_{n}"] = _dense(sd, f"{base}.{i}")
    for n, i in enumerate(norms):
        params[f"ln_{n}"] = _norm_affine(sd, f"{base}.{i}")
    params["dense_out"] = _dense(sd, f"{base}.{linears[-1]}")
    return params


# ---------------------------------------------------------------- LSTM-VAE

def _lstm_cell(sd: StateDict, lstm_key: str, layer: int) -> Dict[str, Any]:
    H = _np(sd[f"{lstm_key}.weight_hh_l{layer}"]).shape[1]
    w_ih = _np(sd[f"{lstm_key}.weight_ih_l{layer}"])  # [4H, I]
    w_hh = _np(sd[f"{lstm_key}.weight_hh_l{layer}"])  # [4H, H]
    b = _np(sd[f"{lstm_key}.bias_ih_l{layer}"]) + _np(sd[f"{lstm_key}.bias_hh_l{layer}"])
    out: Dict[str, Any] = {}
    for g, name in enumerate("ifgo"):
        sl = slice(g * H, (g + 1) * H)
        out[f"i{name}"] = {"kernel": jnp.asarray(w_ih[sl].T)}
        out[f"h{name}"] = {
            "kernel": jnp.asarray(w_hh[sl].T),
            "bias": jnp.asarray(b[sl]),
        }
    return out


def _lstm_stack(sd: StateDict, root: str) -> Dict[str, Any]:
    """Reference Encoder/Decoder (`models/vae/lstm_vae.py`) -> our
    `_CondLSTMStack` subtree (cond2hidden Dense + per-layer cells)."""
    p: Dict[str, Any] = {"cond2hidden": _dense(sd, f"{root}.cond2hidden")}
    layers = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(re.escape(root) + r"\.lstm\.weight_ih_l(\d+)", k))
    )
    for layer in layers:
        p[f"lstm_{layer}"] = _lstm_cell(sd, f"{root}.lstm", layer)
    return p


def import_lstm_vae(sd: StateDict, root: str = "lstmvae") -> Dict[str, Any]:
    """Reference ``LSTMVAE`` (`models/vae/lstm_vae.py:6-99`) -> our
    `models.lstm.LSTMVAE` params."""
    if root:
        sd = submap(sd, root)
    return {
        "lstm_enc": {"stack": _lstm_stack(sd, "lstm_enc")},
        "lstm_dec": {
            "stack": _lstm_stack(sd, "lstm_dec"),
            "hid2act": _dense(sd, "lstm_dec.hid2act"),
        },
        "mu": _dense(sd, "mu"),
        "logvar": _dense(sd, "logvar"),
    }


# ---------------------------------------------------------------- ResNet

def _bn(sd: StateDict, key: str) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    params = _norm_affine(sd, key)
    stats = {
        "mean": jnp.asarray(_np(sd[f"{key}.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{key}.running_var"])),
    }
    return params, stats


def import_resnet(sd: StateDict, root: str = "") -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision-style ResNet state dict -> (params, batch_stats) for
    `models.resnet.ResNetEncoder`.

    Handles BasicBlock (resnet18/34) and Bottleneck (resnet50) blocks, the
    widened ``conv1`` (`base_models.py:604-606`) and the replaced ``fc``
    head; torch ``layer{s}.{b}`` becomes our ``layer{s}_block{b}``.
    """
    if root:
        sd = submap(sd, root)
    params: Dict[str, Any] = {"conv1": _conv2d(sd, "conv1")}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    block_re = re.compile(r"layer(\d+)\.(\d+)\.conv1\.weight")
    blocks = sorted(
        (int(m.group(1)), int(m.group(2)))
        for k in sd
        if (m := block_re.fullmatch(k))
    )
    for stage, b in blocks:
        name = f"layer{stage}_block{b}"
        troot = f"layer{stage}.{b}"
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        n_convs = 3 if f"{troot}.conv3.weight" in sd else 2
        for c in range(1, n_convs + 1):
            bp[f"conv{c}"] = _conv2d(sd, f"{troot}.conv{c}")
            bp[f"bn{c}"], bs[f"bn{c}"] = _bn(sd, f"{troot}.bn{c}")
        if f"{troot}.downsample.0.weight" in sd:
            bp["downsample_conv"] = _conv2d(sd, f"{troot}.downsample.0")
            bp["downsample_bn"], bs["downsample_bn"] = _bn(sd, f"{troot}.downsample.1")
        params[name] = bp
        stats[name] = bs
    if "fc.weight" in sd:
        params["fc"] = _dense(sd, "fc")
    return params, stats


# ---------------------------------------------------------------- context

def find_resnet_root(sd: StateDict, under: str = "map_encoder") -> str:
    """Locate the torchvision trunk inside a ContextEncoder subtree: the
    reference wraps it as ``map_encoder.encoder_heads.map_model`` (a
    create_feature_extractor graph module keeps qualified names,
    `diffuser_helpers.py:309-323`), but raw RasterizedMapEncoder keys
    (``map_encoder.map_model``) are accepted too."""
    for k in sd:
        if not k.startswith(under):
            continue
        m = re.fullmatch(r"(.*)\.conv1\.weight", k)
        if m and "layer" not in m.group(1) and _np(sd[k]).ndim == 4:
            return m.group(1)
    raise KeyError(f"no ResNet trunk found under '{under}'")


def import_context_encoder(sd: StateDict, root: str = "context_encoder") -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference ``ContextEncoder`` (`models/context_utils.py:8-61`) ->
    (params, batch_stats) for `models.context.ContextEncoder`."""
    if root:
        sd = submap(sd, root)
    map_params, map_stats = import_resnet(sd, find_resnet_root(sd))
    params = {
        "agent_state_encoder": import_mlp(sd, "agent_state_encoder"),
        "map_encoder": map_params,
        "process_cond_mlp": import_mlp(sd, "process_cond_mlp"),
    }
    return params, {"map_encoder": map_stats}


# ---------------------------------------------------------------- UNet

def _conv1dblock(sd: StateDict, root: str) -> Dict[str, Any]:
    """`diffuser_helpers.Conv1dBlock`: Sequential(conv, rearrange, GroupNorm,
    rearrange, Mish) -> our {conv, norm}."""
    return {
        "conv": _conv1d(sd, f"{root}.block.0"),
        "norm": _norm_affine(sd, f"{root}.block.2"),
    }


def _resblock(sd: StateDict, root: str) -> Dict[str, Any]:
    """`temporal.ResidualTemporalMapBlockConcat` (`temporal.py:16-45`)."""
    p = {
        "block0": _conv1dblock(sd, f"{root}.blocks.0"),
        "block1": _conv1dblock(sd, f"{root}.blocks.1"),
        "time_dense": _dense(sd, f"{root}.time_mlp.1"),
    }
    if f"{root}.residual_conv.weight" in sd:
        p["residual_conv"] = _conv1d(sd, f"{root}.residual_conv")
    return p


def import_temporal_unet(sd: StateDict, root: str = "model") -> Dict[str, Any]:
    """Reference ``TemporalMapUnet`` (`temporal.py:49-180`) -> our
    `models.temporal_unet.TemporalMapUnet` params (mapping proven by
    tests/test_network_parity.py::test_temporal_unet_parity)."""
    if root:
        sd = submap(sd, root)
    params: Dict[str, Any] = {
        "time_dense0": _dense(sd, "time_mlp.1"),
        "time_dense1": _dense(sd, "time_mlp.3"),
    }
    n_down = 1 + max(
        (int(m.group(1)) for k in sd if (m := re.match(r"downs\.(\d+)\.", k))),
        default=-1,
    )
    for i in range(n_down):
        params[f"down{i}_res0"] = _resblock(sd, f"downs.{i}.0")
        params[f"down{i}_res1"] = _resblock(sd, f"downs.{i}.1")
        if f"downs.{i}.2.conv.weight" in sd:  # Identity on the last level
            params[f"down{i}_downsample"] = {"Conv_0": _conv1d(sd, f"downs.{i}.2.conv")}
    params["mid_res0"] = _resblock(sd, "mid_block1")
    params["mid_res1"] = _resblock(sd, "mid_block2")
    n_up = 1 + max(
        (int(m.group(1)) for k in sd if (m := re.match(r"ups\.(\d+)\.", k))),
        default=-1,
    )
    for i in range(n_up):
        params[f"up{i}_res0"] = _resblock(sd, f"ups.{i}.0")
        params[f"up{i}_res1"] = _resblock(sd, f"ups.{i}.1")
        if f"ups.{i}.2.conv.weight" in sd:
            params[f"up{i}_upsample"] = {
                "ConvTranspose_0": _convtranspose1d(sd, f"ups.{i}.2.conv")
            }
    params["final_block"] = _conv1dblock(sd, "final_conv.0")
    params["final_conv"] = _conv1d(sd, "final_conv.1")
    return params


# ---------------------------------------------------------------- top level

def import_vae_checkpoint(sd: StateDict, prefix: str = "vae") -> Dict[str, Any]:
    """Full reference ``VaeModel`` state (Lightning ``vae.`` prefix,
    `vae_trainer.py:17`) -> our `VaeModel` variables dict
    ``{"params", "batch_stats"}`` — directly loadable where eval composers
    take a ``--ckpt`` (restore_pytree on the module's init tree)."""
    if prefix:
        sd = submap(sd, prefix)
    ctx_params, ctx_stats = import_context_encoder(sd)
    params = {
        "context_encoder": ctx_params,
        "lstmvae": import_lstm_vae(sd),
    }
    return {"params": params, "batch_stats": {"context_encoder": ctx_stats}}


def import_dm_checkpoint(sd: StateDict, prefix: str = "dm") -> Dict[str, Any]:
    """Reference ``DmModel`` state (Lightning ``dm.`` prefix,
    `dm_trainer.py:23`) -> our `TemporalMapUnet` variables dict. The DM
    stage's frozen VAE (saved under ``vae.`` in the same ckpt) is imported
    separately with `import_vae_checkpoint`."""
    if prefix:
        sd = submap(sd, prefix)
    return {"params": import_temporal_unet(sd, root="model")}


def import_checkpoint_file(path: str, kind: str) -> Dict[str, Any]:
    sd = load_state_dict_file(path)
    if kind == "vae":
        return import_vae_checkpoint(sd)
    if kind == "dm":
        return import_dm_checkpoint(sd)
    if kind == "unet":  # bare TemporalMapUnet state_dict
        return {"params": import_temporal_unet(sd, root="")}
    raise ValueError(f"unknown kind '{kind}' (expected vae|dm|unet)")


def main(argv: Optional[list] = None):
    import argparse

    # Conversion is pure host-side layout shuffling; never touch an
    # accelerator (the axon plugin overrides JAX_PLATFORMS, so without this
    # the CLI would hang at TPU backend init when the tunnel is down).
    # The orbax output is platform-agnostic.
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", required=True, help="reference .ckpt/.pt file")
    ap.add_argument("--kind", required=True, choices=["vae", "dm", "unet"])
    ap.add_argument("--out", required=True, help="orbax output directory")
    args = ap.parse_args(argv)

    variables = import_checkpoint_file(args.ckpt, args.kind)
    from cld_tpu.training.checkpoints import save_pytree

    save_pytree(args.out, variables)
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables))
    print(f"imported {args.kind} checkpoint -> {args.out} ({n} scalars)")


if __name__ == "__main__":
    main()

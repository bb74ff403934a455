"""Export cld_tpu flax variable trees to reference torch state dicts.

The reverse of `torch_import.py`: a VAE / DM trained (or fine-tuned) on TPU
becomes a ``vae.`` / ``dm.``-prefixed Lightning-style state dict that the
reference trainers' prefix-strip loader (`utils/trainer_utils.py:30-43`)
restores with ``strict=True`` — so models can round-trip between the two
stacks in both directions.

Pure layout shuffling on numpy arrays; torch is only needed to *write* a
``.ckpt`` file (`save_state_dict_file`). Every mapping here is the inverse
of the corresponding importer function and is validated by round-trip
(export -> import == identity) and live-torch strict-load + forward parity
in tests/test_torch_export.py. Conventions inverted:

* Dense kernel ``[in, out]`` -> Linear ``[out, in]``;
* flax Conv ``[k.., in, out]`` -> Conv1d/2d ``[out, in, k..]``;
  flax ConvTranspose (k-flipped) -> ConvTranspose1d ``[in, out, k]``;
* per-gate flax `OptimizedLSTMCell` kernels -> torch fused-gate
  ``weight_ih_l{n}`` ``[4H, I]`` (order i,f,g,o); the single flax bias goes
  to ``bias_ih_l{n}`` with ``bias_hh_l{n}`` zeroed (torch sums them);
* ``batch_stats`` -> BatchNorm running stats (+ zero
  ``num_batches_tracked``, which strict loading requires).

CLI: ``python -m cld_tpu.utils.torch_export --ckpt runs/vae_dir --kind vae
--out vae_export.ckpt`` reads an orbax dir written by our trainers /
torch_import and writes a torch-loadable checkpoint file.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np

StateDict = Dict[str, np.ndarray]


def _np(v) -> np.ndarray:
    return np.asarray(v)


def _dense(p: Dict[str, Any], key: str, out: StateDict):
    out[f"{key}.weight"] = _np(p["kernel"]).T.copy()
    if "bias" in p:
        out[f"{key}.bias"] = _np(p["bias"]).copy()


def _conv1d(p: Dict[str, Any], key: str, out: StateDict):
    out[f"{key}.weight"] = _np(p["kernel"]).transpose(2, 1, 0).copy()  # [out, in, k]
    if "bias" in p:
        out[f"{key}.bias"] = _np(p["bias"]).copy()


def _conv2d(p: Dict[str, Any], key: str, out: StateDict):
    out[f"{key}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1).copy()  # [out, in, kh, kw]
    if "bias" in p:
        out[f"{key}.bias"] = _np(p["bias"]).copy()


def _convtranspose1d(p: Dict[str, Any], key: str, out: StateDict):
    # importer stored w.transpose(2, 0, 1)[::-1]; invert both steps
    k = _np(p["kernel"])[::-1].transpose(1, 2, 0)  # [in, out, k]
    out[f"{key}.weight"] = k.copy()
    out[f"{key}.bias"] = _np(p["bias"]).copy()


def _norm_affine(p: Dict[str, Any], key: str, out: StateDict):
    out[f"{key}.weight"] = _np(p["scale"]).copy()
    out[f"{key}.bias"] = _np(p["bias"]).copy()


def _bn(p: Dict[str, Any], stats: Dict[str, Any], key: str, out: StateDict):
    _norm_affine(p, key, out)
    out[f"{key}.running_mean"] = _np(stats["mean"]).copy()
    out[f"{key}.running_var"] = _np(stats["var"]).copy()
    # strict load_state_dict requires the counter buffer; 0 is what a
    # freshly tracked module starts from and eval-mode BN never reads it
    out[f"{key}.num_batches_tracked"] = np.zeros((), np.int64)


# ---------------------------------------------------------------- MLP

def export_mlp(params: Dict[str, Any], root: str = "") -> StateDict:
    """Inverse of `torch_import.import_mlp`: our `models.nets.MLP` params ->
    the reference ``base_models.MLP`` Sequential key layout. Indices follow
    the constructor (`base_models.py:52-71`): [Linear, LayerNorm?, ReLU] per
    hidden layer, then the output Linear."""
    base = f"{root}._model" if root else "_model"
    hidden = sorted(
        int(m.group(1)) for k in params if (m := re.fullmatch(r"dense_(\d+)", k))
    )
    normalization = any(k.startswith("ln_") for k in params)
    stride = 3 if normalization else 2
    out: StateDict = {}
    for n in hidden:
        _dense(params[f"dense_{n}"], f"{base}.{n * stride}", out)
        if normalization:
            _norm_affine(params[f"ln_{n}"], f"{base}.{n * stride + 1}", out)
    _dense(params["dense_out"], f"{base}.{len(hidden) * stride}", out)
    return out


# ---------------------------------------------------------------- LSTM-VAE

def _lstm_cell(cell: Dict[str, Any], lstm_key: str, layer: int, out: StateDict):
    w_ih = np.concatenate(
        [_np(cell[f"i{g}"]["kernel"]).T for g in "ifgo"], axis=0
    )  # [4H, I]
    w_hh = np.concatenate([_np(cell[f"h{g}"]["kernel"]).T for g in "ifgo"], axis=0)
    b = np.concatenate([_np(cell[f"h{g}"]["bias"]) for g in "ifgo"], axis=0)
    out[f"{lstm_key}.weight_ih_l{layer}"] = w_ih.copy()
    out[f"{lstm_key}.weight_hh_l{layer}"] = w_hh.copy()
    out[f"{lstm_key}.bias_ih_l{layer}"] = b.copy()
    out[f"{lstm_key}.bias_hh_l{layer}"] = np.zeros_like(b)


def _lstm_stack(stack: Dict[str, Any], root: str, out: StateDict):
    _dense(stack["cond2hidden"], f"{root}.cond2hidden", out)
    layers = sorted(
        int(m.group(1)) for k in stack if (m := re.fullmatch(r"lstm_(\d+)", k))
    )
    for layer in layers:
        _lstm_cell(stack[f"lstm_{layer}"], f"{root}.lstm", layer, out)


def export_lstm_vae(params: Dict[str, Any], root: str = "lstmvae") -> StateDict:
    """Inverse of `import_lstm_vae`: our `models.lstm.LSTMVAE` params ->
    reference ``LSTMVAE`` keys (`models/vae/lstm_vae.py:6-99`)."""
    out: StateDict = {}
    _lstm_stack(params["lstm_enc"]["stack"], "lstm_enc", out)
    _lstm_stack(params["lstm_dec"]["stack"], "lstm_dec", out)
    _dense(params["lstm_dec"]["hid2act"], "lstm_dec.hid2act", out)
    _dense(params["mu"], "mu", out)
    _dense(params["logvar"], "logvar", out)
    if root:
        out = {f"{root}.{k}": v for k, v in out.items()}
    return out


# ---------------------------------------------------------------- ResNet

def export_resnet(params: Dict[str, Any], stats: Dict[str, Any],
                  root: str = "") -> StateDict:
    """Inverse of `import_resnet`: `models.resnet.ResNetEncoder` variables ->
    torchvision-style keys (``layer{s}.{b}`` from our ``layer{s}_block{b}``)."""
    out: StateDict = {}
    _conv2d(params["conv1"], "conv1", out)
    _bn(params["bn1"], stats["bn1"], "bn1", out)
    block_re = re.compile(r"layer(\d+)_block(\d+)")
    for name in sorted(k for k in params if block_re.fullmatch(k)):
        stage, b = block_re.fullmatch(name).groups()
        troot = f"layer{stage}.{b}"
        bp, bs = params[name], stats[name]
        for c in (1, 2, 3):
            if f"conv{c}" not in bp:
                break
            _conv2d(bp[f"conv{c}"], f"{troot}.conv{c}", out)
            _bn(bp[f"bn{c}"], bs[f"bn{c}"], f"{troot}.bn{c}", out)
        if "downsample_conv" in bp:
            _conv2d(bp["downsample_conv"], f"{troot}.downsample.0", out)
            _bn(bp["downsample_bn"], bs["downsample_bn"], f"{troot}.downsample.1", out)
    if "fc" in params:
        _dense(params["fc"], "fc", out)
    if root:
        out = {f"{root}.{k}": v for k, v in out.items()}
    return out


# ---------------------------------------------------------------- context

def export_context_encoder(params: Dict[str, Any], stats: Dict[str, Any],
                           root: str = "context_encoder") -> StateDict:
    """Inverse of `import_context_encoder`: the map trunk lands under the
    reference's feature-extractor wrapper path
    ``map_encoder.encoder_heads.map_model`` (`diffuser_helpers.py:309-323`)."""
    out: StateDict = {}
    out.update(export_mlp(params["agent_state_encoder"], "agent_state_encoder"))
    out.update(
        export_resnet(params["map_encoder"], stats["map_encoder"],
                      "map_encoder.encoder_heads.map_model")
    )
    out.update(export_mlp(params["process_cond_mlp"], "process_cond_mlp"))
    if root:
        out = {f"{root}.{k}": v for k, v in out.items()}
    return out


# ---------------------------------------------------------------- UNet

def _conv1dblock(p: Dict[str, Any], root: str, out: StateDict):
    _conv1d(p["conv"], f"{root}.block.0", out)
    _norm_affine(p["norm"], f"{root}.block.2", out)


def _resblock(p: Dict[str, Any], root: str, out: StateDict):
    _conv1dblock(p["block0"], f"{root}.blocks.0", out)
    _conv1dblock(p["block1"], f"{root}.blocks.1", out)
    _dense(p["time_dense"], f"{root}.time_mlp.1", out)
    if "residual_conv" in p:
        _conv1d(p["residual_conv"], f"{root}.residual_conv", out)


def export_temporal_unet(params: Dict[str, Any], root: str = "model") -> StateDict:
    """Inverse of `import_temporal_unet`: our
    `models.temporal_unet.TemporalMapUnet` params -> reference
    ``TemporalMapUnet`` keys (`models/temporal.py:49-180`)."""
    out: StateDict = {}
    _dense(params["time_dense0"], "time_mlp.1", out)
    _dense(params["time_dense1"], "time_mlp.3", out)
    n_down = 1 + max(
        (int(m.group(1)) for k in params if (m := re.match(r"down(\d+)_res0", k))),
        default=-1,
    )
    for i in range(n_down):
        _resblock(params[f"down{i}_res0"], f"downs.{i}.0", out)
        _resblock(params[f"down{i}_res1"], f"downs.{i}.1", out)
        if f"down{i}_downsample" in params:
            _conv1d(params[f"down{i}_downsample"]["Conv_0"], f"downs.{i}.2.conv", out)
    _resblock(params["mid_res0"], "mid_block1", out)
    _resblock(params["mid_res1"], "mid_block2", out)
    n_up = 1 + max(
        (int(m.group(1)) for k in params if (m := re.match(r"up(\d+)_res0", k))),
        default=-1,
    )
    for i in range(n_up):
        _resblock(params[f"up{i}_res0"], f"ups.{i}.0", out)
        _resblock(params[f"up{i}_res1"], f"ups.{i}.1", out)
        if f"up{i}_upsample" in params:
            _convtranspose1d(params[f"up{i}_upsample"]["ConvTranspose_0"],
                             f"ups.{i}.2.conv", out)
    _conv1dblock(params["final_block"], "final_conv.0", out)
    _conv1d(params["final_conv"], "final_conv.1", out)
    if root:
        out = {f"{root}.{k}": v for k, v in out.items()}
    return out


# ---------------------------------------------------------------- top level

def export_vae_checkpoint(variables: Dict[str, Any], prefix: str = "vae") -> StateDict:
    """Our `VaeModel` variables ``{"params", "batch_stats"}`` -> a
    Lightning-style ``vae.``-prefixed state dict the reference's VAE trainer
    restore path accepts (`vae_trainer.py:17`, `trainer_utils.py:30-43`)."""
    if "batch_stats" not in variables:
        raise ValueError(
            "vae export requires batch_stats (the context encoder's "
            "BatchNorm running stats); got a params-only tree — was this "
            "orbax dir written for a different --kind?"
        )
    params, stats = variables["params"], variables["batch_stats"]
    out: StateDict = {}
    out.update(
        export_context_encoder(params["context_encoder"],
                               stats["context_encoder"])
    )
    out.update(export_lstm_vae(params["lstmvae"]))
    if prefix:
        out = {f"{prefix}.{k}": v for k, v in out.items()}
    return out


def export_dm_checkpoint(variables: Dict[str, Any], prefix: str = "dm") -> StateDict:
    """Our `TemporalMapUnet` variables -> ``dm.model.``-prefixed state dict
    (`dm_trainer.py:23`)."""
    out = export_temporal_unet(variables["params"], root="model")
    if prefix:
        out = {f"{prefix}.{k}": v for k, v in out.items()}
    return out


def export_checkpoint(variables: Dict[str, Any], kind: str) -> StateDict:
    if kind == "vae":
        return export_vae_checkpoint(variables)
    if kind == "dm":
        return export_dm_checkpoint(variables)
    if kind == "unet":
        return export_temporal_unet(variables["params"], root="")
    raise ValueError(f"unknown kind '{kind}' (expected vae|dm|unet)")


def save_state_dict_file(path: str, sd: StateDict, meta: Optional[dict] = None):
    """Write a Lightning-shaped checkpoint file (weights under
    ``state_dict``) that `torch.load` + the reference loaders accept."""
    import torch

    obj = dict(meta or {})
    obj["state_dict"] = {k: torch.as_tensor(np.ascontiguousarray(v)) for k, v in sd.items()}
    torch.save(obj, path)


def main(argv: Optional[list] = None):
    import argparse

    # pure host-side conversion; never touch an accelerator (the axon
    # plugin overrides JAX_PLATFORMS — see torch_import.main)
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir (trainer or torch_import output)")
    ap.add_argument("--kind", required=True, choices=["vae", "dm", "unet"])
    ap.add_argument("--out", required=True, help="torch .ckpt output file")
    args = ap.parse_args(argv)

    from cld_tpu.training.checkpoints import restore_pytree

    variables = restore_pytree(args.ckpt)
    sd = export_checkpoint(variables, args.kind)
    save_state_dict_file(args.out, sd)
    n = sum(int(np.prod(np.shape(v))) for v in sd.values())
    print(f"exported {args.kind} checkpoint -> {args.out} ({n} scalars, "
          f"{len(sd)} tensors)")


if __name__ == "__main__":
    main()

"""Algo factory + generic zoo trainer.

Capability parity with the reference's Lightning algo factory
(`/root/reference/src/tbsim/algos/factory.py:31-90`) and the legacy baseline
algos it instantiates (`algos/algos.py` BehaviorCloning / VAETrafficModel /
DiscreteVAETrafficModel / TransformerTrafficModel / GANTrafficModel /
EBMMetric): one `algo_factory(config, name)` resolves an algo name to a
model + loss convention, and `ZooTrainer` is the single jitted train loop
they all share (the Lightning boilerplate the reference duplicates per algo
collapses into one functional step)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.training.state import (
    TrainStateWithStats,
    make_optimizer,
    resolve_compute_dtype,
)

# name -> spec dict: model, loss_call(variables, batch, rng, train) ->
# (loss, metrics, mutated_batch_stats_or_None), init_rngs
ALGO_FACTORY: Dict[str, Callable] = {}


def _apply_with_stats(model, variables, *args, method=None, rngs=None, train=False):
    """model.apply that threads BatchNorm running stats when present."""
    if "batch_stats" in variables:
        out, mut = model.apply(
            variables, *args, train=train, method=method, rngs=rngs,
            mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]
    return model.apply(variables, *args, train=train, method=method, rngs=rngs), None


def register_algo(name: str):
    def deco(fn):
        ALGO_FACTORY[name] = fn
        return fn

    return deco


def algo_factory(config, name: str):
    """`factory.py:31-90` — resolve an algo name. Returns the spec dict
    consumed by ZooTrainer."""
    if name not in ALGO_FACTORY:
        raise KeyError(f"unknown algo {name!r}; registered: {sorted(ALGO_FACTORY)}")
    return ALGO_FACTORY[name](config)


def _model_dims(cfg):
    return dict(
        horizon=cfg.algo.horizon,
        dt=cfg.algo.step_time,
        cond_feat_dim=cfg.algo.cond_feat_dim,
        map_arch=cfg.algo.map_encoder_model_arch,
        # bf16 network compute on TPU ('16-mixed' parity, as the stage
        # trainers); params/losses stay f32
        dtype=resolve_compute_dtype(cfg.train.training.get("precision", "auto")),
    )


@register_algo("bc")
def _bc(cfg):
    """BehaviorCloning (`algos.py:40-130`)."""
    from cld_tpu.models.bc import BCPlanner

    model = BCPlanner(**_model_dims(cfg))

    def loss_call(variables, batch, rng, train):
        out, mut = _apply_with_stats(model, variables, batch, method="loss", train=train)
        return out["loss"], {"loss": out["loss"]}, mut

    return {"model": model, "loss_call": loss_call, "init_rngs": ("params",)}


@register_algo("bc_gc")
def _bc_gc(cfg):
    """BehaviorCloningGC (`algos.py` goal-conditioned BC): BCPlanner with a
    goal feature (last available future frame, teacher-forced)."""
    from cld_tpu.models.bc import BCPlanner

    model = BCPlanner(goal_conditional=True, **_model_dims(cfg))

    def loss_call(variables, batch, rng, train):
        out, mut = _apply_with_stats(model, variables, batch, method="loss", train=train)
        return out["loss"], {"loss": out["loss"]}, mut

    return {"model": model, "loss_call": loss_call, "init_rngs": ("params",)}


@register_algo("vae")
def _vae(cfg):
    """VAETrafficModel (`algos.py` VAE traffic model — the CVAE baseline,
    distinct from the CLD project's LSTM-VAE stage)."""
    from cld_tpu.models.cvae import TrajectoryCVAE

    model = TrajectoryCVAE(**_model_dims(cfg))

    def loss_call(variables, batch, rng, train):
        out, mut = _apply_with_stats(
            model, variables, batch, cfg.algo.get("vae_beta", 0.1),
            train=train, rngs={"sample": rng},
        )
        return out["loss"], {"loss": out["loss"], "recon": out["recon"], "kld": out["kld"]}, mut

    return {"model": model, "loss_call": loss_call, "init_rngs": ("params", "sample")}


@register_algo("discrete_vae")
def _discrete_vae(cfg):
    """DiscreteVAETrafficModel (`algos.py` Gumbel-softmax discrete CVAE)."""
    from cld_tpu.models.discrete_cvae import DiscreteTrajectoryCVAE

    model = DiscreteTrajectoryCVAE(**_model_dims(cfg))

    def loss_call(variables, batch, rng, train):
        out, mut = _apply_with_stats(
            model, variables, batch, train=train, rngs={"sample": rng}
        )
        return out["loss"], {"loss": out["loss"], "recon": out["recon"], "kld": out["kld"]}, mut

    return {"model": model, "loss_call": loss_call, "init_rngs": ("params", "sample")}


@register_algo("TransformerPred")
def _transformer(cfg):
    """TransformerTrafficModel (`factory.py:66-67`)."""
    from cld_tpu.models.transformer_baseline import TransformerTrajectoryPredictor

    model = TransformerTrajectoryPredictor(
        horizon=cfg.algo.horizon, dt=cfg.algo.step_time,
        width=cfg.algo.get("transformer_width", 64),
        dtype=resolve_compute_dtype(cfg.train.training.get("precision", "auto")),
    )

    def loss_call(variables, batch, rng, train):
        out, mut = _apply_with_stats(model, variables, batch, method="loss", train=train)
        return out["loss"], {"loss": out["loss"]}, mut

    return {"model": model, "loss_call": loss_call, "init_rngs": ("params",)}


@register_algo("tree_vae")
def _tree_vae(cfg):
    """TreeVAETrafficModel (`algos.py:1309-1470`): staged trajectory-tree
    CVAE for contingency prediction."""
    from cld_tpu.models.tree_vae import TreeTrajectoryVAE

    model = TreeTrajectoryVAE(
        stages=cfg.algo.get("tree_stages", 2),
        frames_per_stage=cfg.algo.get("tree_frames_per_stage", 10),
        cond_feat_dim=cfg.algo.cond_feat_dim,
        map_arch=cfg.algo.map_encoder_model_arch.split("_spatial")[0],
        dt=cfg.algo.step_time,
        dtype=resolve_compute_dtype(cfg.train.training.get("precision", "auto")),
    )

    def loss_call(variables, batch, rng, train):
        out, mut = _apply_with_stats(
            model, variables, batch, train=train, rngs={"sample": rng}
        )
        return out["loss"], {"loss": out["loss"], "recon": out["recon"],
                             "kld": out["kld"]}, mut

    return {"model": model, "loss_call": loss_call, "init_rngs": ("params", "sample")}


@register_algo("agent_predictor")
def _agent_predictor(cfg):
    """MATrafficModel (`multiagent_algos.py:23-200`): ego + neighbor future
    prediction from one shared raster via ROI-aligned per-agent features."""
    from cld_tpu.models.agent_predictor import MAAgentPredictor
    from cld_tpu.ops.dynamics import UnicycleParams

    model = MAAgentPredictor(
        horizon=cfg.algo.horizon, dt=cfg.algo.step_time,
        cond_feat_dim=cfg.algo.cond_feat_dim,
        map_arch=cfg.algo.map_encoder_model_arch.split("_spatial")[0],
        dyn=UnicycleParams.from_config(cfg.algo.dynamics),
        pixel_size=cfg.env.rasterizer.pixel_size,
        dtype=resolve_compute_dtype(cfg.train.training.get("precision", "auto")),
    )

    def loss_call(variables, batch, rng, train):
        out, mut = _apply_with_stats(model, variables, batch, method="loss", train=train)
        metrics = {k: v for k, v in out.items() if hasattr(v, "ndim") and v.ndim == 0}
        return out["loss"], metrics, mut

    return {"model": model, "loss_call": loss_call, "init_rngs": ("params",)}


@register_algo("bc_ec")
def _bc_ec(cfg):
    """BehaviorCloningEC (`algos.py:791-860`): the agent predictor with
    ego-conditioned neighbor heads (RasterizedECModel capability)."""
    from cld_tpu.models.agent_predictor import MAAgentPredictor
    from cld_tpu.ops.dynamics import UnicycleParams

    model = MAAgentPredictor(
        horizon=cfg.algo.horizon, dt=cfg.algo.step_time,
        cond_feat_dim=cfg.algo.cond_feat_dim,
        map_arch=cfg.algo.map_encoder_model_arch.split("_spatial")[0],
        dyn=UnicycleParams.from_config(cfg.algo.dynamics),
        ec_conditioning=True,
        pixel_size=cfg.env.rasterizer.pixel_size,
        dtype=resolve_compute_dtype(cfg.train.training.get("precision", "auto")),
    )

    def loss_call(variables, batch, rng, train):
        out, mut = _apply_with_stats(model, variables, batch, method="loss", train=train)
        metrics = {k: v for k, v in out.items() if hasattr(v, "ndim") and v.ndim == 0}
        return out["loss"], metrics, mut

    return {"model": model, "loss_call": loss_call, "init_rngs": ("params",)}


@register_algo("spatial_planner")
def _spatial_planner(cfg):
    """SpatialPlanner (`algos.py:258-470`): dense goal-location prediction
    over the raster via a skip-connected map UNet."""
    from cld_tpu.models.spatial_planner import SpatialPlannerNet

    model = SpatialPlannerNet(
        arch=cfg.algo.map_encoder_model_arch.split("_spatial")[0],
        dtype=resolve_compute_dtype(cfg.train.training.get("precision", "auto")),
    )

    def loss_call(variables, batch, rng, train):
        out, mut = _apply_with_stats(model, variables, batch, train=train)
        metrics = {k: v for k, v in out.items() if v.ndim == 0}
        return out["loss"], metrics, mut

    return {"model": model, "loss_call": loss_call, "init_rngs": ("params",)}


@register_algo("occupancy")
def _occupancy(cfg):
    """OccupancyMetric (`metric_algos.py:120-300`): per-future-frame
    occupancy likelihood maps from the same UNet family."""
    from cld_tpu.models.occupancy import OccupancyPredictor

    model = OccupancyPredictor(
        arch=cfg.algo.map_encoder_model_arch.split("_spatial")[0],
        future_num_frames=cfg.algo.future_num_frames,
        every_n_frame=cfg.algo.get("occupancy_every_n_frame", 4),
        dtype=resolve_compute_dtype(cfg.train.training.get("precision", "auto")),
    )

    def loss_call(variables, batch, rng, train):
        out, mut = _apply_with_stats(model, variables, batch, train=train)
        metrics = {k: v for k, v in out.items() if v.ndim == 0}
        return out["loss"], metrics, mut

    return {"model": model, "loss_call": loss_call, "init_rngs": ("params",)}


@register_algo("diff")
def _diff(cfg):
    """DiffuserTrafficModel (CTG raw-action diffusion, `algos.py:1591+`,
    the `nusc_diff` registry family) — ContextEncoder + TemporalMapUnet
    trained with the RawActionDiffuser denoising loss."""
    import flax.linen as nn

    from cld_tpu.algos.diffuser import RawActionDiffuser
    from cld_tpu.data.batch import get_current_states
    from cld_tpu.models.context import ContextEncoder
    from cld_tpu.models.temporal_unet import TemporalMapUnet
    from cld_tpu.models.vae import get_state_and_action_from_batch
    from cld_tpu.ops.diffusion import make_schedule
    from cld_tpu.ops.dynamics import UnicycleParams
    from cld_tpu.ops.normalization import TrajNormalizer

    class RawDiffuserModule(nn.Module):
        @nn.compact
        def __call__(self, batch: TrafficBatch, train: bool = False):
            enc = ContextEncoder(
                curr_state_feat_dim=cfg.algo.curr_state_feat_dim,
                map_feature_dim=cfg.algo.map_feature_dim,
                cond_feat_dim=cfg.algo.cond_feat_dim,
                map_arch=cfg.algo.map_encoder_model_arch,
            )
            net = TemporalMapUnet(
                transition_dim=6, output_dim=2, dim=cfg.algo.base_dim,
                dim_mults=(2, 4, 8),
            )
            aux = enc(batch, train=train)
            algo = RawActionDiffuser(
                net, make_schedule(cfg.algo.n_diffusion_steps),
                UnicycleParams.from_config(cfg.algo.dynamics),
                dt=cfg.algo.step_time,
            )
            gt = get_state_and_action_from_batch(batch, cfg.algo.horizon, cfg.algo.step_time)
            gt_scaled = TrajNormalizer().scale(gt)
            rng = (
                self.make_rng("sample") if self.has_rng("sample")
                else jax.random.key(0)
            )
            loss = algo.loss(rng, gt_scaled, get_current_states(batch), aux["cond_feat"])
            return {"loss": loss}

    model = RawDiffuserModule()

    def loss_call(variables, batch, rng, train):
        out, mut = _apply_with_stats(
            model, variables, batch, train=train, rngs={"sample": rng}
        )
        return out["loss"], {"loss": out["loss"]}, mut

    return {"model": model, "loss_call": loss_call, "init_rngs": ("params", "sample")}


class ZooTrainer:
    """One functional trainer for every factory algo — the shared Lightning
    loop (`algos.py` training_step/configure_optimizers) as a jitted step."""

    def __init__(self, config, algo_name: str):
        spec = algo_factory(config, algo_name)
        self.model = spec["model"]
        self.loss_call = spec["loss_call"]
        self.init_rngs = spec["init_rngs"]
        opt = config.algo.optim_params.vae
        self.optimizer = make_optimizer(
            opt.learning_rate.initial, weight_decay=opt.regularization.L2
        )
        self.train_step = jax.jit(self._train_step)
        self.eval_step = jax.jit(self._eval_step)

    def init_state(self, rng: jax.Array, sample_batch: TrafficBatch) -> TrainStateWithStats:
        def _init(rng, batch):
            rngs = {n: jax.random.fold_in(rng, i) for i, n in enumerate(self.init_rngs)}
            variables = self.model.init(rngs, batch)
            return TrainStateWithStats.create(
                apply_fn=self.model.apply,
                params=variables["params"],
                batch_stats=variables.get("batch_stats"),
                tx=self.optimizer,
            )

        return jax.jit(_init)(rng, sample_batch)

    def _variables(self, state):
        v = {"params": state.params}
        if state.batch_stats is not None:
            v["batch_stats"] = state.batch_stats
        return v

    def _train_step(self, state, batch: TrafficBatch, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            v = {"params": params}
            if state.batch_stats is not None:
                v["batch_stats"] = state.batch_stats
            loss, metrics, mut = self.loss_call(v, batch, step_rng, True)
            return loss, (metrics, mut)

        (loss, (metrics, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads=grads, batch_stats=mut if mut is not None else state.batch_stats
        )
        ok = jnp.isfinite(loss)
        new_state = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_state, state)
        return new_state, metrics

    def _eval_step(self, state, batch: TrafficBatch):
        loss, metrics, _ = self.loss_call(
            self._variables(state), batch, jax.random.key(0), False
        )
        return metrics

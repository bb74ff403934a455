"""Full training resume: kill/resume mid-train reproduces the uninterrupted
loss curve (optimizer moments + step counter restored, data stream realigned)
— the Lightning `ckpt_path` full-state resume (`trainer_utils.py:95-105`)."""

import json
import os
import types

import numpy as np
import pytest

from cld_tpu.utils.registry import get_registered_experiment_config


def _args(output, steps, resume=None):
    return types.SimpleNamespace(
        output=output, steps=steps, vae_ckpt=None, dm_ckpt=None, resume=resume,
        config=None, registered_name="cld_smoke", mode=None,
    )


def _losses(out_dir, stage):
    path = os.path.join(out_dir, stage, "metrics.jsonl")
    with open(path) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    return {r["step"]: r["train/loss"] for r in recs if "train/loss" in r}


@pytest.fixture(scope="module")
def smoke_cfg():
    cfg = get_registered_experiment_config("cld_smoke").unlock()
    cfg.train.save.enabled = True
    cfg.train.save.every_n_steps = 3
    cfg.train.parallel.dp = 1  # batch 4 can't shard over the 8-dev test mesh
    return cfg.lock()


def test_vae_resume_reproduces_loss_curve(smoke_cfg, tmp_path):
    from train import train_vae

    # uninterrupted 6-step run
    ref_dir = str(tmp_path / "ref")
    train_vae(smoke_cfg, _args(ref_dir, 6))
    ref = _losses(ref_dir, "vae")

    # interrupted: 3 steps (checkpoint at 3), then resume to 6
    cut_dir = str(tmp_path / "cut")
    train_vae(smoke_cfg, _args(cut_dir, 3))
    ckpt = os.path.join(cut_dir, "vae", "ckpt_3_full")
    assert os.path.isdir(ckpt)
    train_vae(smoke_cfg, _args(cut_dir, 6, resume=ckpt))
    cut = _losses(cut_dir, "vae")

    assert set(ref) == set(cut) == {0, 1, 2, 3, 4, 5}
    for s in range(6):
        np.testing.assert_allclose(ref[s], cut[s], rtol=1e-5, err_msg=f"step {s}")


def test_dm_resume_restores_opt_state(smoke_cfg, tmp_path):
    from train import train_dm

    ref_dir = str(tmp_path / "dmref")
    train_dm(smoke_cfg, _args(ref_dir, 6))
    ref = _losses(ref_dir, "dm")

    cut_dir = str(tmp_path / "dmcut")
    train_dm(smoke_cfg, _args(cut_dir, 3))
    train_dm(
        smoke_cfg, _args(cut_dir, 6, resume=os.path.join(cut_dir, "dm", "ckpt_3_full"))
    )
    cut = _losses(cut_dir, "dm")
    for s in range(6):
        np.testing.assert_allclose(ref[s], cut[s], rtol=1e-5, err_msg=f"step {s}")


def test_eval_reports_three_wasserstein_distances(smoke_cfg, tmp_path):
    """`--mode test` reports wd_long, wd_lat, wd_jerk + realism_deviation
    (guide_dm_trainer.py:277-290), with jerk computed per-agent on device."""
    from train import evaluate

    result = evaluate(smoke_cfg, _args(str(tmp_path / "eval"), 2))
    for k in ("wd_long", "wd_lat", "wd_jerk", "realism_deviation"):
        assert k in result and np.isfinite(result[k]), (k, result)
    np.testing.assert_allclose(
        result["realism_deviation"],
        (result["wd_long"] + result["wd_lat"] + result["wd_jerk"]) / 3.0,
        rtol=1e-6,
    )

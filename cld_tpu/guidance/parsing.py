"""Guidance-config parsing: every registered rule reachable from the CLI.

Capability parity with the reference's config editing source
(`/root/reference/src/tbsim/configs/scene_edit_config.py:130-170` example
guidance configs + `rollout.py` `--editing_source config`): guidance is a
list of {"name", "weight", "params", "agents"} dicts. The CLI accepts

* inline JSON:      --guidance '[{"name": "speed_limit", "params": {...}}]'
* a JSON/YAML file: --guidance @my_edits.json
* shorthand:        --guidance 'speed_limit:15,agent_collision'

Per-agent parameters (target_speed, target_pos, ...) given as scalars are
broadcast to the scene's agent count; `agents` becomes the GuidanceSpec's
static agent mask.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

from cld_tpu.guidance.losses import GUIDANCE_LOSS_MAP
from cld_tpu.guidance.perturbation import GuidanceSpec

# shorthand "name:value" -> which param the value binds to
_SHORTHAND_PARAM = {
    "speed_limit": ("speed_limit", float),
    "acc_limit": ("acc_limit", float),
    "target_speed": ("target_speed", float),
    "lane_following": ("pos_weight", float),
    "agent_collision": None,
    "map_collision": None,
}

# params that are per-agent arrays: name -> (trailing shape, dtype)
_PER_AGENT_PARAMS = {
    "target_speed": {"target_speed": ((), np.float32)},
    "target_pos_at_time": {
        "target_pos": ((2,), np.float32),
        "target_time": ((), np.int64),
    },
    "target_pos": {"target_pos": ((2,), np.float32)},
    "global_target_pos_at_time": {
        "target_pos_world": ((2,), np.float32),
        "target_time": ((), np.int64),
        "urgency": ((), np.float32),
    },
    "global_target_pos": {
        "target_pos_world": ((2,), np.float32),
        "urgency": ((), np.float32),
    },
    "stop_sign": {
        "stop_sign_pos": ((2,), np.float32),
        "stop_box_dim": ((2,), np.float32),
    },
    "global_stop_sign": {
        "stop_sign_pos": ((2,), np.float32),
        "stop_box_dim": ((2,), np.float32),
    },
}

# reference param aliases -> our dataclass field names
_PARAM_ALIASES = {
    # legacy cld_tpu spelling (the reference spells it stop_sign_pos for
    # the local rule too, `scene_edit_utils.py:500-506`)
    "stop_sign": {"stop_box_center": "stop_sign_pos"},
    "global_target_pos_at_time": {"target_pos": "target_pos_world"},
    "global_target_pos": {"target_pos": "target_pos_world"},
    "gptcollision": {"target_ind": "attacker_ind", "ref_ind": "victim_ind"},
    "collision_attack": {"target_ind": "attacker_ind", "ref_ind": "victim_ind"},
    # reference keep_distance spells min_distance/max_distance
    # (`guidance_loss.py:1635`); without the alias the unknown-param filter
    # would silently drop them and run with the 5/15 defaults
    "keep_distance": {"min_distance": "min_dist", "max_distance": "max_dist"},
    "gptkeepdistance": {"min_distance": "min_dist", "max_distance": "max_dist"},
}


def parse_guidance_arg(spec: str) -> List[Dict]:
    """CLI string -> list of reference-style guidance config dicts."""
    spec = (spec or "").strip()
    if not spec:
        return []
    if spec.startswith("@"):
        path = spec[1:]
        with open(path) as f:
            if path.endswith((".yaml", ".yml")):
                import yaml

                loaded = yaml.safe_load(f)
            else:
                loaded = json.load(f)
        return loaded if isinstance(loaded, list) else [loaded]
    if spec[0] in "[{":
        loaded = json.loads(spec)
        return loaded if isinstance(loaded, list) else [loaded]
    # shorthand
    configs = []
    for item in spec.split(","):
        name, _, val = item.partition(":")
        name = name.strip()
        if name not in GUIDANCE_LOSS_MAP:
            raise ValueError(
                f"unknown guidance rule {name!r}; known: {sorted(GUIDANCE_LOSS_MAP)}"
            )
        params: Dict = {}
        binder = _SHORTHAND_PARAM.get(name)
        if val and binder:
            pname, cast = binder
            params[pname] = cast(val)
        elif val:
            # NO silent discard: a value on a binder-less rule (e.g.
            # "agent_collision:0.5") would otherwise run with defaults
            # while the user believes their tuning applied
            raise ValueError(
                f"rule {name!r} has no shorthand value; use JSON params"
            )
        configs.append({"name": name, "params": params, "weight": 1.0})
    return configs


def _broadcast_per_agent(name: str, params: Dict, num_agents: int) -> Dict:
    """Scalars / single rows -> per-agent arrays where the loss expects [B]."""
    spec = _PER_AGENT_PARAMS.get(name)
    if not spec:
        return params
    out = dict(params)
    for pname, (trailing, dtype) in spec.items():
        if pname not in out:
            continue
        arr = np.asarray(out[pname], dtype=dtype)
        want_ndim = 1 + len(trailing)
        if arr.ndim < want_ndim or (arr.ndim == want_ndim and arr.shape[0] == 1):
            arr = np.broadcast_to(arr, (num_agents, *trailing)).copy()
        out[pname] = arr
    return out


def specs_from_configs(
    configs: Sequence[Dict], num_agents: int
) -> List[GuidanceSpec]:
    """Reference-style config dicts -> GuidanceSpec list. `agents` (a list of
    indices, `GuidanceConfig.agents`) becomes a static bool mask."""
    specs: List[GuidanceSpec] = []
    for cfg in configs:
        name = cfg["name"]
        cls = GUIDANCE_LOSS_MAP[name]
        params = dict(cfg.get("params", {}))
        for old, new in _PARAM_ALIASES.get(name, {}).items():
            if old in params and new not in params:
                params[new] = params.pop(old)
        # drop reference-only params our dataclasses don't carry
        import dataclasses as _dc

        known = {f.name for f in _dc.fields(cls)}
        params = {k: v for k, v in params.items() if k in known}
        params = _broadcast_per_agent(name, params, num_agents)
        agents: Optional[Sequence[int]] = cfg.get("agents")
        mask = None
        if agents is not None:
            m = np.zeros(num_agents, bool)
            m[np.asarray(agents, int)] = True
            mask = tuple(bool(b) for b in m)
        try:
            loss = cls(**params)
        except TypeError as e:
            raise ValueError(
                f"guidance rule {name!r} is missing required params ({e}); "
                f"bind them via shorthand ('{name}:VALUE'), JSON params, or "
                f"use --editing-source heuristic for state-derived targets"
            ) from e
        specs.append(GuidanceSpec(loss, float(cfg.get("weight", 1.0)), mask))
    return specs

"""Experiment management: parameter sweeps + checkpoint lookup.

Capability parity with `/root/reference/src/tbsim/utils/experiment_utils.py:18-568`:
`ParamSearchPlan`-style config sweeps (generate one config per combination)
and checkpoint lookup by key (`get_checkpoint:497`). The NGC cluster launch
helpers have no equivalent here by design — runs are plain CLI invocations.
"""

from __future__ import annotations

import itertools
import os
from typing import Dict, Iterator, List, Sequence, Tuple

from cld_tpu.utils.config import Config


class ParamRange:
    """One swept parameter: dotted config path + values + name alias."""

    def __init__(self, path: str, values: Sequence, alias: str | None = None):
        self.path = path
        self.values = list(values)
        self.alias = alias or path.split(".")[-1]


class ParamSearchPlan:
    """Cartesian-product sweep over ParamRanges
    (`experiment_utils.py:18-150` ParamSearchPlan/compose_cartesian)."""

    def __init__(self, base_config: Config, ranges: Sequence[ParamRange]):
        self.base = base_config
        self.ranges = list(ranges)

    def _set_path(self, cfg: Config, path: str, value):
        node = cfg
        parts = path.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value

    def generate(self) -> Iterator[Tuple[str, Config]]:
        """Yields (run_name, config) per combination."""
        for combo in itertools.product(*(r.values for r in self.ranges)):
            cfg = Config(self.base.to_dict())
            name_parts = []
            for r, v in zip(self.ranges, combo):
                self._set_path(cfg, r.path, v)
                name_parts.append(f"{r.alias}={v}")
            yield "_".join(name_parts), cfg.lock()


def find_checkpoint(root_dir: str, key: str = "final") -> str:
    """Locate an orbax checkpoint directory whose name contains `key`
    (`experiment_utils.py:497-568` get_checkpoint)."""
    matches: List[str] = []
    for dirpath, dirnames, _ in os.walk(root_dir):
        for d in dirnames:
            if d.startswith("ckpt") and key in d:
                matches.append(os.path.join(dirpath, d))
    if not matches:
        raise FileNotFoundError(f"no checkpoint matching {key!r} under {root_dir}")
    return sorted(matches)[-1]

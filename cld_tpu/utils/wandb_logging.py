"""Optional wandb sink for MetricLogger records.

Capability parity with the reference's WandbLogger wiring
(`/root/reference/utils/trainer_utils.py:77-93`): metrics stream to wandb
when the package + credentials are available, otherwise to the JSONL/stdout
logger only. Gated import — this environment has no egress.
"""

from __future__ import annotations

from typing import Dict, Optional


class WandbSink:
    def __init__(self, project: str, run_name: Optional[str] = None, config: Optional[dict] = None):
        try:
            import wandb

            self._run = wandb.init(project=project, name=run_name, config=config)
            self._wandb = wandb
        except Exception as e:  # package missing, no credentials, no network
            self._run = None
            self._wandb = None
            self._reason = str(e)

    @property
    def active(self) -> bool:
        return self._run is not None

    def log(self, step: int, metrics: Dict[str, float]):
        if self._run is not None:
            self._wandb.log(metrics, step=step)

    def finish(self):
        if self._run is not None:
            self._run.finish()

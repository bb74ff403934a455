"""Training orchestration: optax states, per-stage train steps, checkpoints."""

from cld_tpu.training.state import TrainStateWithStats, make_optimizer, warmup_cosine_by_epoch
from cld_tpu.training.vae import VAETrainer
from cld_tpu.training.dm import DMTrainer

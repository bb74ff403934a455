"""Data layer: canonical on-device batch, synthetic scenes, packed shards."""

from cld_tpu.data.batch import TrafficBatch, get_current_states
from cld_tpu.data.synthetic import synthetic_batch

"""Evaluation: open-loop metrics (ADE/FDE, Wasserstein realism, failure rates)."""

from cld_tpu.eval.metrics import ade, fde, wasserstein_1d, realism_deviation

"""Differentiable signal temporal logic for traffic rules."""

from cld_tpu.rules.stl import (
    always,
    eventually,
    stl_and,
    stl_or,
    StopSignRule,
    SpeedLimitRule,
)

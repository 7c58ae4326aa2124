"""Diffusion runtime: beta schedules, pure-function Gaussian diffusion, scan sampler."""

from .schedule import Schedule, make_beta_schedule
from .gaussian import (
    q_sample,
    predict_start_from_noise,
    q_posterior,
    p_sample_step,
    sample_chain,
    draw_time_and_gamma,
)

__all__ = [
    "Schedule",
    "make_beta_schedule",
    "q_sample",
    "predict_start_from_noise",
    "q_posterior",
    "p_sample_step",
    "sample_chain",
    "draw_time_and_gamma",
]

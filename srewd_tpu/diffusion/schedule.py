"""Beta schedules and precomputed diffusion constants.

Reference: models/diffusion_models/sheduler.py (all 7 schedules) and the
buffer registration in models/diffusion_models/diffusion.py:49-96. Constants
are computed in float64 numpy, then stored as a single float32 pytree
(`Schedule`) so the whole set rides into jitted code and the sampling scan
indexes them with a traced timestep — the reference keeps
`sqrt_alphas_cumprod_prev` as a host numpy array and builds a fresh device
tensor per step (diffusion.py:159-160), forcing a host sync every step.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct


def _warmup_beta(linear_start: float, linear_end: float, n_timestep: int, warmup_frac: float):
    betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    warmup_time = int(n_timestep * warmup_frac)
    betas[:warmup_time] = np.linspace(linear_start, linear_end, warmup_time, dtype=np.float64)
    return betas


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """All schedules of sheduler.py:25-68, float64 numpy."""
    if schedule == "quad":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
        )
    elif schedule == "linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "warmup10":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.1)
    elif schedule == "warmup50":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.5)
    elif schedule == "const":
        betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    elif schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(n_timestep, 1, n_timestep, dtype=np.float64)
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * math.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, None, 0.999)
    else:
        raise NotImplementedError(schedule)
    return betas


@struct.dataclass
class Schedule:
    """Device-resident diffusion constants (diffusion.py:49-96 buffers)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod_prev: jnp.ndarray  # length T+1 (diffusion.py:68-69)
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    num_timesteps: int = struct.field(pytree_node=False)

    @classmethod
    def create(
        cls,
        schedule: str = "linear",
        n_timestep: int = 1000,
        linear_start: float = 1e-6,
        linear_end: float = 1e-2,
        cosine_s: float = 8e-3,
    ) -> "Schedule":
        betas = make_beta_schedule(schedule, n_timestep, linear_start, linear_end, cosine_s)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod_prev=f32(np.sqrt(np.append(1.0, alphas_cumprod))),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=f32(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
            num_timesteps=int(n_timestep),
        )

    @classmethod
    def from_config(cls, cfg: dict) -> "Schedule":
        return cls.create(
            schedule=cfg.get("schedule", "linear"),
            n_timestep=int(cfg.get("n_timestep", 1000)),
            linear_start=float(cfg.get("linear_start", 1e-6)),
            linear_end=float(cfg.get("linear_end", 1e-2)),
            cosine_s=float(cfg.get("cosine_s", 8e-3)),
        )

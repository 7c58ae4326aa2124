"""Gaussian diffusion as pure functions + the scan-based reverse sampler.

Reference semantics pinned here (models/diffusion_models/diffusion.py):
  * training draws ONE integer t ~ U[1, T] per batch, then a per-sample
    continuous gamma ~ U(sqrt_ac_prev[t-1], sqrt_ac_prev[t])
    (e.g. resdiff_diffusion.py:128-138) — `draw_time_and_gamma`.
  * q_sample: x_t = gamma * x0 + sqrt(1 - gamma^2) * eps (diffusion.py:209-228).
  * reverse step: eps-prediction -> x0 estimate (clipped to [-1,1]) ->
    posterior mean + exp(0.5 * clipped log var) * noise, noise gated off at
    t == 0 (diffusion.py:144-192).
  * the denoiser is conditioned on the continuous noise level
    sqrt_ac_prev[t+1] broadcast over the batch (diffusion.py:159-160).

TPU-first: `sample_chain` runs the full T-step reverse process as ONE
jax.lax.scan with the image carry donated and all schedule constants
indexed on-device — the reference drives T=1000 sequential UNet calls from
Python, building host tensors each step (SURVEY.md §3.2: "the dominant cost
of the whole system").
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedule import Schedule

# denoise_fn(x_t, noise_level[B]) -> predicted epsilon; conditioning is closed over.
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def q_sample(x_start: jnp.ndarray, gamma: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Forward-noise x0 at continuous level gamma (per-sample, [B])."""
    g = gamma.reshape(-1, 1, 1, 1)
    return g * x_start + jnp.sqrt(1.0 - g * g) * noise


def draw_time_and_gamma(key: jax.Array, schedule: Schedule, batch: int):
    """(t, gamma): one t ~ U[1,T] per batch; gamma ~ U(s[t-1], s[t]) per sample."""
    kt, kg = jax.random.split(key)
    t = jax.random.randint(kt, (), 1, schedule.num_timesteps + 1)
    lo = schedule.sqrt_alphas_cumprod_prev[t - 1]
    hi = schedule.sqrt_alphas_cumprod_prev[t]
    gamma = jax.random.uniform(kg, (batch,), minval=lo, maxval=hi)
    return t, gamma


def predict_start_from_noise(
    schedule: Schedule, x_t: jnp.ndarray, t: jnp.ndarray, eps: jnp.ndarray
) -> jnp.ndarray:
    return (
        schedule.sqrt_recip_alphas_cumprod[t] * x_t
        - schedule.sqrt_recipm1_alphas_cumprod[t] * eps
    )


def q_posterior(schedule: Schedule, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray):
    mean = schedule.posterior_mean_coef1[t] * x_start + schedule.posterior_mean_coef2[t] * x_t
    log_var = schedule.posterior_log_variance_clipped[t]
    return mean, log_var


def p_sample_step(
    schedule: Schedule,
    denoise_fn: DenoiseFn,
    img: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """One reverse step x_t -> x_{t-1} (diffusion.py:175-192)."""
    b = img.shape[0]
    noise_level = jnp.broadcast_to(schedule.sqrt_alphas_cumprod_prev[t + 1], (b,))
    eps = denoise_fn(img, noise_level)
    x_recon = predict_start_from_noise(schedule, img, t, eps)
    if clip_denoised:
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
    mean, log_var = q_posterior(schedule, x_recon, img, t)
    noise = jax.random.normal(key, img.shape, img.dtype)
    noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
    return mean + noise * jnp.exp(0.5 * log_var)


def sample_chain(
    schedule: Schedule,
    denoise_fn: DenoiseFn,
    shape: tuple,
    key: jax.Array,
    init: Optional[jnp.ndarray] = None,
    clip_denoised: bool = True,
    keep_every: Optional[int] = None,
) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
    """Full reverse diffusion from pure noise, as a single lax.scan over T.

    Per-step PRNG keys are fold_in'd from `key`; the image carry is donated
    by XLA (scan carries reuse buffers), so the chain runs entirely
    on-device with zero host round-trips.

    keep_every: when set, additionally returns every keep_every-th
    intermediate image (the reference's `continous=True` mode,
    sr3_diffusion.py sample_inter) as [T // keep_every, *shape] — collected
    by an outer scan over segments so memory stays bounded.
    """
    k_init, k_chain = jax.random.split(key)
    img = jax.random.normal(k_init, shape) if init is None else init

    def step(carry, t):
        img = carry
        img = p_sample_step(
            schedule, denoise_fn, img, t, jax.random.fold_in(k_chain, t), clip_denoised
        )
        return img, None

    t_total = schedule.num_timesteps
    ts = jnp.arange(t_total - 1, -1, -1)

    if keep_every is None:
        img, _ = jax.lax.scan(step, img, ts)
        return img

    k = int(keep_every)
    n_seg = t_total // k
    ts_main, ts_tail = ts[: n_seg * k].reshape(n_seg, k), ts[n_seg * k :]

    def segment(carry, seg_ts):
        out, _ = jax.lax.scan(step, carry, seg_ts)
        return out, out

    img, frames = jax.lax.scan(segment, img, ts_main)
    for t in ts_tail:  # at most k-1 trailing steps, unrolled
        img, _ = step(img, t)
    return img, frames


def select_taus(schedule: Schedule, steps: int, spacing: str = "linspace"):
    """Timestep sub-sequence for the fast samplers (ascending, unique numpy int64).

    The reference's only speed/quality knob is shortening the VAL beta
    schedule itself (T ablations 100/500/2000,
    configs/experiment_configs/phydiff/resdiff+physics_*_eval_*.json); the
    fast samplers here instead keep the T=1000-trained model and walk a
    sub-sequence of its timesteps. HOW that sub-sequence is spaced dominates
    few-step quality — especially for the residual archs, whose x0 target
    (HR - bicubic, sigma-scaled) has amplitude ~0.05 so the informative part
    of the chain is compressed into the last few dozen timesteps of a linear
    beta schedule.

    spacing:
      * "linspace": round(linspace(0, T-1, steps)) — uniform in t (legacy
        default; places almost no steps in the low-t region that matters for
        small-amplitude targets).
      * "trailing": round(arange(T, 0, -T/steps)) - 1 — uniform in t anchored
        at T-1, skipping t=0 (diffusers' "trailing"; included for sweeps).
      * "quad": round(linspace(0, sqrt(T-1), steps)**2) — quadratic, denser
        near t=0 (the original DDIM paper's CIFAR choice).
      * "logsnr": uniform in lambda = 0.5*log(acp/(1-acp)) between
        lambda(T-1) and lambda(0) — equal work per log-SNR band
        (DPM-Solver's recommended spacing, arXiv:2206.00927 §3.3).
    """
    import numpy as np

    t_total = schedule.num_timesteps
    steps = min(int(steps), t_total)
    if spacing == "linspace":
        taus = np.linspace(0, t_total - 1, steps).round()
    elif spacing == "trailing":
        taus = np.arange(t_total, 0, -t_total / steps).round() - 1
    elif spacing == "quad":
        taus = (np.linspace(0, np.sqrt(t_total - 1), steps) ** 2).round()
    elif spacing == "logsnr":
        acp = np.asarray(schedule.alphas_cumprod, np.float64)
        lam = 0.5 * np.log(acp / np.maximum(1.0 - acp, 1e-20))  # decreasing in t
        targets = np.linspace(lam[-1], lam[0], steps)
        # lam reversed is increasing -> searchsorted, then map back to t
        rev = lam[::-1]
        idx = np.clip(np.searchsorted(rev, targets), 1, t_total - 1)
        pick = np.where(
            np.abs(rev[idx] - targets) < np.abs(rev[idx - 1] - targets), idx, idx - 1
        )
        taus = (t_total - 1) - pick
        taus = np.concatenate([taus, [0, t_total - 1]])  # pin both endpoints
    else:
        raise ValueError(f"unknown tau spacing {spacing!r}")
    return np.unique(taus.astype(np.int64))


def dpm_solver_chain(
    schedule: Schedule,
    denoise_fn: DenoiseFn,
    shape: tuple,
    key: jax.Array,
    steps: int = 25,
    clip_denoised: bool = True,
    keep_every: Optional[int] = None,
    tau_spacing: str = "linspace",
) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
    """DPM-Solver++(2M) (Lu et al., arXiv:2211.01095) — deterministic
    second-order multistep ODE sampler in the data (x0) parameterization.

    Beyond-reference fast sampler one tier above DDIM: the linear multistep
    extrapolation of the x0 prediction in log-SNR (lambda) space halves the
    discretization error order, so ~20-25 steps match what DDIM needs ~50-100
    for. Reuses the DDIM timestep sub-sequence, conditioning levels
    (sqrt(acp[tau]), exactly what the model trained on), and scan structure —
    per-step cost is one denoiser call, identical to ddim_sample_chain.

    Derivation notes: with a_s/a_t the source/dest alphas_cumprod of one
    step, e^{-h} = (alpha_s * sigma_t) / (sigma_s * alpha_t) — computed in
    that closed form so the final step to acp=1 (sigma_t=0 => e^{-h}=0) needs
    no infinite-lambda handling. The first executed step and the final step
    use the first-order update (D = x0), which IS the DDIM(eta=0) update
    ("lower_order_final"); intermediate steps extrapolate
    D = (1 + c) x0_i - c x0_{i-1} with c = h_i / (2 h_{i-1}).

    keep_every: as in ddim_sample_chain — additionally return every
    keep_every-th intermediate as [S // keep_every, *shape].
    """
    import numpy as np

    taus = select_taus(schedule, steps, tau_spacing)

    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    # execution order: descending tau; dest of step j is src of step j+1,
    # final dest is acp=1 (pure x0 output, mirroring ddim's a_prev)
    a_src = acp[taus[::-1]]
    a_dst = np.concatenate([a_src[1:], [1.0]])
    al_s, sg_s = np.sqrt(a_src), np.sqrt(1.0 - a_src)
    al_t, sg_t = np.sqrt(a_dst), np.sqrt(1.0 - a_dst)
    em1 = al_s * sg_t / (sg_s * al_t) - 1.0          # e^{-h} - 1
    lam_s = 0.5 * np.log(a_src / (1.0 - a_src))
    with np.errstate(divide="ignore"):               # final lambda_t = +inf
        lam_t = 0.5 * np.log(a_dst / np.maximum(1.0 - a_dst, 0.0))
    h = lam_t - lam_s
    c = np.zeros_like(h)                              # h_i / (2 h_{i-1})
    if len(h) > 2:
        c[1:-1] = h[1:-1] / (2.0 * h[:-2])
    # c[0] = 0: no previous x0 yet; c[-1] = 0: lower-order final (h=inf)

    lvl = np.asarray(schedule.sqrt_alphas_cumprod_prev)[taus[::-1] + 1]
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    xs = tuple(map(f32, (sg_t / sg_s, al_t, em1, c, np.sqrt(a_src), sg_s, lvl)))

    # split exactly like ddim_sample_chain so the same key draws the same
    # initial noise across samplers (the chain part is unused: deterministic)
    k_init, _ = jax.random.split(key)
    img = jax.random.normal(k_init, shape)
    prev_x0 = jnp.zeros(shape, img.dtype)

    def step(carry, inp):
        img, prev_x0 = carry
        sig_ratio, alpha_t, em1_, c_, sqrt_as, sig_s, lvl_ = inp
        b = img.shape[0]
        eps = denoise_fn(img, jnp.broadcast_to(lvl_, (b,)))
        x0 = (img - sig_s * eps) / sqrt_as
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        d = (1.0 + c_) * x0 - c_ * prev_x0
        img = sig_ratio * img - alpha_t * em1_ * d
        return (img, x0), None

    if keep_every is None:
        (img, _), _ = jax.lax.scan(step, (img, prev_x0), xs)
        return img

    k = int(keep_every)
    s_total = len(taus)
    n_seg = s_total // k
    main = tuple(x[: n_seg * k].reshape(n_seg, k, *x.shape[1:]) for x in xs)
    tail = tuple(x[n_seg * k :] for x in xs)

    def segment(carry, seg_xs):
        out, _ = jax.lax.scan(step, carry, seg_xs)
        return out, out[0]

    (img, prev_x0), frames = jax.lax.scan(segment, (img, prev_x0), main)
    for j in range(s_total - n_seg * k):
        (img, prev_x0), _ = step((img, prev_x0), tuple(x[j] for x in tail))
    return img, frames


def ddim_sample_chain(
    schedule: Schedule,
    denoise_fn: DenoiseFn,
    shape: tuple,
    key: jax.Array,
    steps: int = 50,
    eta: float = 0.0,
    clip_denoised: bool = True,
    keep_every: Optional[int] = None,
    tau_spacing: str = "linspace",
) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
    """DDIM sampling (Song et al., arXiv:2010.02502) over a timestep subset.

    Beyond-reference fast sampler: the reference only trades quality for
    speed via shorter VAL beta schedules (T ablations 100/500/2000); DDIM
    keeps the T=1000-trained model and walks a `steps`-long sub-sequence,
    deterministic at eta=0. Same scan/conditioning structure as
    sample_chain, so per-step cost is identical — throughput scales as
    T/steps. The denoiser sees the same continuous noise level
    sqrt(alpha_cumprod[t]) it was trained with.

    keep_every: as in sample_chain (reference `continous=True`,
    sr3_diffusion.py:59-83) — additionally return every keep_every-th
    intermediate image as [S // keep_every, *shape], where S is the number
    of DDIM steps actually walked.
    """
    taus = select_taus(schedule, steps, tau_spacing)

    a_t = schedule.alphas_cumprod[taus]  # [S]
    a_prev = jnp.concatenate(
        [jnp.ones((1,), a_t.dtype), schedule.alphas_cumprod[taus[:-1]]]
    )
    lvl_t = schedule.sqrt_alphas_cumprod_prev[taus + 1]  # sqrt(acp[tau])

    k_init, k_chain = jax.random.split(key)
    img = jax.random.normal(k_init, shape)

    def step(carry, inp):
        img = carry
        i, at, ap, lvl = inp
        b = img.shape[0]
        eps = denoise_fn(img, jnp.broadcast_to(lvl, (b,)))
        x0 = (img - jnp.sqrt(1.0 - at) * eps) / jnp.sqrt(at)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
            # implied eps after clipping keeps the update self-consistent
            eps = (img - jnp.sqrt(at) * x0) / jnp.sqrt(1.0 - at)
        sigma = (
            eta
            * jnp.sqrt((1.0 - ap) / (1.0 - at))
            * jnp.sqrt(jnp.maximum(1.0 - at / ap, 0.0))
        )
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - ap - sigma**2, 0.0)) * eps
        noise = jax.random.normal(jax.random.fold_in(k_chain, i), img.shape, img.dtype)
        noise = jnp.where(i > 0, noise, jnp.zeros_like(noise))
        img = jnp.sqrt(ap) * x0 + dir_xt + sigma * noise
        return img, None

    idx = jnp.arange(len(taus) - 1, -1, -1)
    xs = (idx, a_t[idx], a_prev[idx], lvl_t[idx])

    if keep_every is None:
        img, _ = jax.lax.scan(step, img, xs)
        return img

    # segmented scan mirroring sample_chain: frames collected per segment,
    # at most keep_every-1 trailing steps unrolled
    k = int(keep_every)
    s_total = len(taus)
    n_seg = s_total // k
    main = tuple(x[: n_seg * k].reshape(n_seg, k, *x.shape[1:]) for x in xs)
    tail = tuple(x[n_seg * k :] for x in xs)

    def segment(carry, seg_xs):
        out, _ = jax.lax.scan(step, carry, seg_xs)
        return out, out

    img, frames = jax.lax.scan(segment, img, main)
    for j in range(s_total - n_seg * k):
        img, _ = step(img, tuple(x[j] for x in tail))
    return img, frames

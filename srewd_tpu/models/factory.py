"""DiffusionModel — arch wiring for the five diffusion families.

This replaces the reference's DDPM facade + define_diffusion factory + the
five per-arch GaussianDiffusion subclasses (SURVEY.md §2.4-2.5):
  models/diffusion_models/model.py, networks.py,
  {sr3,resdiff,phydiff,srdiff,physrdiff}/*_diffusion.py

Per-arch contract (batch is NHWC {"HR","LR","SR"}; "SR" is the bicubic x4
upsample of LR computed on device):

  arch        x0 target      eps-net input           addback   conditioning
  sr3         HR             concat(SR, x_t)         —         —
  resdiff     HR - SR        concat(SR, x_t)         + SR      DWT(SR) queries
  phydiff     HR - SR        concat(SR, x_t)+stencil + SR      DWT(SR) 3-comp
  srdiff      HR - SR        x_t                     + SR      RRDB(LR) feats
  physrdiff   HR - SR        concat(SR, x_t)         + SR      RRDB + DWT(SR)

Reference bugs resolved here (SURVEY.md §7 "reference bugs to decide on"):
  * resdiff trains on the batch "SR" slot as the condition (bicubic — not
    the loaded SimpleCNN's output, resdiff_diffusion.py:123) even when a CNN
    checkpoint is given. We make this a config switch: when an encoder is
    attached and `use_encoder_prediction` is True, the condition is the
    encoder output (the ResDiff paper's design); default False reproduces
    reference behaviour.
  * srdiff/physrdiff without an encoder index a tensor with [2::3]
    (srdiff_diffusion.py:182 + srdiff/unet.py:118 slices the batch dim) —
    unrunnable in the reference; here it raises a clear error.
  * orthogonal re-init clobbering freshly loaded encoder weights
    (networks.py:164-165): cannot happen — encoder params live in a separate
    collection and are loaded after init.

Losses: per reference, eps L1 (sum) normalized by B*C*H*W == mean
(model.py:61-69); l2 selectable. SRDiff adds l1(rrdb_sr, HR) when the
encoder is trainable (srdiff_diffusion.py:212-214).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..diffusion.gaussian import (
    ddim_sample_chain,
    dpm_solver_chain,
    draw_time_and_gamma,
    q_sample,
    sample_chain,
)
from ..diffusion.schedule import Schedule
from ..ops.resize import bicubic_up4
from .rrdb import RRDBNet
from .simple_cnn import SimpleCNN
from .unet import WeatherUNet

ARCHS = ("sr3", "resdiff", "phydiff", "srdiff", "physrdiff")


@dataclasses.dataclass
class DiffusionModel:
    """Binds a WeatherUNet (+ optional encoder) with arch-specific diffusion."""

    arch: str
    unet: WeatherUNet
    encoder: Optional[Any] = None  # SimpleCNN (resdiff) or RRDBNet (srdiff/physrdiff)
    loss_type: str = "l1"
    conditional: bool = True
    lock_encoder: bool = True
    use_encoder_prediction: bool = False  # see module docstring

    def __post_init__(self):
        if self.arch not in ARCHS:
            raise ValueError(f"unknown arch {self.arch}")
        if self.arch in ("srdiff", "physrdiff") and self.encoder is None:
            raise ValueError(
                f"{self.arch} requires an RRDB encoder (the reference's "
                "no-encoder path is unrunnable: srdiff_diffusion.py:182)"
            )

    # ------------------------------------------------------------------ init
    def init(self, rng: jax.Array, batch: dict) -> dict:
        """Initialize {'unet': ..., 'encoder': ...} param trees."""
        r_u, r_e, r_s = jax.random.split(rng, 3)
        params = {}
        hr, lr = batch["HR"], batch["LR"]
        sr = batch.get("SR")
        if sr is None:
            sr = bicubic_up4(lr)
        if self.encoder is not None:
            if self.arch in ("srdiff", "physrdiff"):
                enc_vars = self.encoder.init(r_e, lr, True)
            else:
                enc_vars = self.encoder.init(r_e, lr)
            params["encoder"] = enc_vars["params"]
        x_in, kwargs = self._unet_inputs(params, batch, sr, jnp.zeros_like(hr))
        noise_level = jnp.ones((hr.shape[0],), jnp.float32)
        uvars = self.unet.init({"params": r_u, "dropout": r_s}, x_in, noise_level, **kwargs)
        params["unet"] = uvars["params"]
        return params

    # ------------------------------------------------------- condition plumbing
    def _encode_rrdb(self, params: dict, lr: jnp.ndarray):
        sr_pred, feats = self.encoder.apply({"params": params["encoder"]}, lr, True)
        if self.lock_encoder:
            sr_pred = jax.lax.stop_gradient(sr_pred)
            feats = [jax.lax.stop_gradient(f) for f in feats]
        return sr_pred, self.unet.project_rrdb_features(feats)

    def condition(self, params: dict, batch: dict) -> jnp.ndarray:
        """The image-space condition ('SR' slot semantics)."""
        sr = batch.get("SR")
        if sr is None:
            sr = bicubic_up4(batch["LR"])
        if (
            self.arch in ("resdiff", "phydiff")
            and self.encoder is not None
            and self.use_encoder_prediction
        ):
            pred = self.encoder.apply({"params": params["encoder"]}, batch["LR"])
            if self.lock_encoder:
                pred = jax.lax.stop_gradient(pred)
            return pred
        return sr

    def _unet_inputs(self, params: dict, batch: dict, cond: jnp.ndarray, x_t: jnp.ndarray):
        """(x_in, kwargs) for the UNet given the condition image and noisy map."""
        kwargs: dict = {}
        if self.arch == "srdiff":
            _, feats = self._encode_rrdb(params, batch["LR"])
            kwargs["rrdb_feats"] = feats
            x_in = x_t
        elif self.arch == "physrdiff":
            _, feats = self._encode_rrdb(params, batch["LR"])
            kwargs["rrdb_feats"] = feats
            kwargs["dwt_pyramid"] = self.unet.make_dwt_pyramid(cond)
            x_in = jnp.concatenate([cond, x_t], axis=-1)
        elif self.arch in ("resdiff", "phydiff"):
            kwargs["dwt_pyramid"] = self.unet.make_dwt_pyramid(cond)
            x_in = jnp.concatenate([cond, x_t], axis=-1)
        else:  # sr3
            # unconditional mode: the denoiser sees only the noisy map
            # (diffusion.py p_losses/p_mean_variance condition_x=None path)
            x_in = jnp.concatenate([cond, x_t], axis=-1) if self.conditional else x_t
        return x_in, kwargs

    # ------------------------------------------------------------------- loss
    def loss(
        self,
        params: dict,
        batch: dict,
        rng: jax.Array,
        schedule: Schedule,
        train: bool = True,
    ) -> jnp.ndarray:
        """Single-draw diffusion training loss (p_losses + DDPM normalization)."""
        hr = batch["HR"]
        cond = self.condition(params, batch)
        x_start = hr if self.arch == "sr3" else hr - cond

        k_t, k_noise, k_drop = jax.random.split(rng, 3)
        _, gamma = draw_time_and_gamma(k_t, schedule, hr.shape[0])
        noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        x_noisy = q_sample(x_start, gamma, noise)

        x_in, kwargs = self._unet_inputs(params, batch, cond, x_noisy)
        eps_pred = self.unet.apply(
            {"params": params["unet"]},
            x_in,
            gamma,
            train=train,
            rngs={"dropout": k_drop} if train else {},
            **kwargs,
        )
        if self.loss_type == "l1":
            loss = jnp.mean(jnp.abs(noise - eps_pred))
        elif self.loss_type == "l2":
            loss = jnp.mean(jnp.square(noise - eps_pred))
        else:
            raise NotImplementedError(self.loss_type)

        if (
            self.arch in ("srdiff", "physrdiff")
            and self.encoder is not None
            and not self.lock_encoder
        ):
            rrdb_sr, _ = self._encode_rrdb(params, batch["LR"])
            loss = loss + jnp.mean(jnp.abs(rrdb_sr - hr))
        return loss

    # ----------------------------------------------------------------- sample
    def generate_sr(
        self,
        params: dict,
        batch: dict,
        rng: jax.Array,
        schedule: Schedule,
        clip_denoised: bool = True,
        keep_every: Optional[int] = None,
        sampler: str = "ddpm",
        ddim_steps: int = 50,
        ddim_eta: float = 0.0,
        tau_spacing: str = "linspace",
    ) -> jnp.ndarray:
        """Super-resolve a batch: full reverse chain as one lax.scan.

        Conditioning (RRDB features, DWT pyramids) is computed ONCE and
        closed over by the scan body — exact for all archs since the
        condition is constant across the chain.

        keep_every: reference `continous=True` mode — additionally return
        every keep_every-th intermediate field as [K, B, H, W, C].
        sampler: "ddpm" (reference semantics), "ddim" (arXiv:2010.02502
        sub-sequence sampler; `ddim_steps`, `ddim_eta`), or "dpm"
        (DPM-Solver++(2M), arXiv:2211.01095 — second-order deterministic;
        reuses `ddim_steps` as its step count, `ddim_eta` ignored).
        tau_spacing: fast-sampler timestep spacing (gaussian.select_taus) —
        "logsnr" is the measured best for the residual archs; "linspace"
        kept as the back-compat default.
        """
        cond = self.condition(params, batch)
        x_in0, kwargs = self._unet_inputs(params, batch, cond, jnp.zeros_like(cond))

        # Pre-cast weights to the compute dtype ONCE, outside the scan:
        # flax casts per-op, which inside a T-step scan re-reads the f32
        # tree from HBM and converts every step (2x weight bandwidth).
        unet_params = params["unet"]
        if self.unet.dtype is not None:
            cdt = self.unet.dtype
            unet_params = jax.tree.map(
                lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, unet_params
            )

        # Hoist the remaining scan-invariant conditioning out of the chain
        # (the DWT pyramid / RRDB features already are, via _unet_inputs):
        # the FD spliter's frequency features (FFT -> SE high-pass -> |IFFT|)
        # and phydiff's stencil maps depend only on `cond` — the reference
        # recomputes both on every one of the T UNet calls
        # (resdiff/fd_info_spliter.py:49-96, phydiff/unet.py:311-314).
        if self.arch in ("resdiff", "physrdiff"):
            kwargs["cond_feats"] = self.unet.apply(
                {"params": unet_params}, cond, cond_features_only=True
            )
        elif self.arch == "phydiff":
            from ..ops.finite_diff import fd_stencils

            kwargs["fd_maps"] = fd_stencils(cond)

        def denoise_fn(x_t, noise_level):
            # mirror _unet_inputs: srdiff and unconditional sr3 see only x_t
            if self.arch == "srdiff" or not self.conditional:
                x_in = x_t
            else:
                x_in = jnp.concatenate([cond, x_t], axis=-1)
            return self.unet.apply(
                {"params": unet_params}, x_in, noise_level, train=False, **kwargs
            )

        from .blocks import inference_attention

        with inference_attention():  # no backward here -> flash kernel eligible
            if sampler == "ddim":
                out = ddim_sample_chain(
                    schedule, denoise_fn, cond.shape, rng,
                    steps=ddim_steps, eta=ddim_eta, clip_denoised=clip_denoised,
                    keep_every=keep_every, tau_spacing=tau_spacing,
                )
            elif sampler == "dpm":
                out = dpm_solver_chain(
                    schedule, denoise_fn, cond.shape, rng,
                    steps=ddim_steps, clip_denoised=clip_denoised,
                    keep_every=keep_every, tau_spacing=tau_spacing,
                )
            else:
                out = sample_chain(
                    schedule, denoise_fn, cond.shape, rng,
                    clip_denoised=clip_denoised, keep_every=keep_every,
                )
            img, frames = out if keep_every is not None else (out, None)
        if self.arch != "sr3":
            img = img + cond
            if frames is not None:
                frames = frames + cond[None]
        return img if frames is None else (img, frames)

    def sample(
        self,
        params: dict,
        batch_size: int,
        rng: jax.Array,
        schedule: Schedule,
        clip_denoised: bool = True,
    ) -> jnp.ndarray:
        """Unconditional generation (DDPM.sample, model.py:87-100).

        Requires a UNet built with in_channel == image_channels
        (diffusion.conditional == False). Fixes the reference's square-only
        shape bug (diffusion.py:207 passes image_height for both dims).
        """
        if self.conditional:
            raise ValueError("unconditional sample() requires conditional=False")
        u = self.unet
        shape = (batch_size, u.image_height, u.image_width, u.image_channels)

        def denoise_fn(x_t, noise_level):
            return self.unet.apply(
                {"params": params["unet"]}, x_t, noise_level, train=False
            )

        from .blocks import inference_attention

        with inference_attention():  # same flash routing as generate_sr
            return sample_chain(
                schedule, denoise_fn, shape, rng, clip_denoised=clip_denoised
            )


def build_model(model_cfg: dict, dtype=None) -> DiffusionModel:
    """Construct a DiffusionModel from the reference config schema.

    model_cfg mirrors opt["model"] (SURVEY.md §2.2): keys model_name,
    architecture, unet{...}, diffusion{...}, pretrained_model{...}.
    """
    arch = model_cfg.get("architecture", "sr3")
    unet_cfg = model_cfg.get("unet", {})
    diff_cfg = model_cfg.get("diffusion", {})
    pre_cfg = model_cfg.get("pretrained_model", {}) or {}

    channels = int(diff_cfg.get("channels", 1))
    unet = WeatherUNet(
        variant=arch,
        in_channel=int(unet_cfg.get("in_channel", 2 * channels)),
        out_channel=int(unet_cfg.get("out_channel", channels)),
        inner_channel=int(unet_cfg.get("inner_channel", 64)),
        norm_groups=int(unet_cfg.get("norm_groups", 32)),
        channel_mults=tuple(unet_cfg.get("channel_multiplier", (1, 2, 4, 8, 8))),
        attn_res=tuple(unet_cfg.get("attn_res", (16,))),
        res_blocks=int(unet_cfg.get("res_blocks", 2)),
        dropout=float(unet_cfg.get("dropout", 0.0)),
        image_height=int(diff_cfg.get("image_height", 128)),
        image_width=int(diff_cfg.get("image_width", 256)),
        image_channels=int(diff_cfg.get("image_channels", channels)),
        rrdb_num_feats=int(pre_cfg.get("hidden_size", 64)),
        rrdb_num_blocks=int(pre_cfg.get("num_block", 17)),
        dtype=dtype,
    )

    encoder = None
    wants_encoder = pre_cfg.get("model_path") is not None or bool(
        pre_cfg.get("enabled", False)
    )
    if arch in ("srdiff", "physrdiff"):
        # hidden=64, blocks=17 hardcoded in the reference (srdiff_diffusion.py:60-69)
        encoder = RRDBNet(
            in_nc=channels,
            out_nc=channels,
            nf=int(pre_cfg.get("hidden_size", 64)),
            nb=int(pre_cfg.get("num_block", 17)),
            gc=int(pre_cfg.get("hidden_size", 64)) // 2,
            dtype=dtype,
            # conditioning consumes the pre-clamp feature taps either way;
            # the SR head feeds the trainable-encoder aux loss against
            # sigma-scaled HR, which the reference's [0,1] clamp saturates
            # (see RRDBNet.clamp_output)
            clamp_output=False,
        )
    elif arch in ("resdiff", "phydiff") and wants_encoder:
        encoder = SimpleCNN(scale_factor=4, channels=channels, dtype=dtype)

    return DiffusionModel(
        arch=arch,
        unet=unet,
        encoder=encoder,
        loss_type=model_cfg.get("loss_type", "l1"),
        conditional=bool(diff_cfg.get("conditional", True)),
        lock_encoder=bool(pre_cfg.get("lock_weights", True)),
        use_encoder_prediction=bool(pre_cfg.get("use_encoder_prediction", False)),
    )

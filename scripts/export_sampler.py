#!/usr/bin/env python
"""Export a trained SR sampler as ONE self-contained AOT artifact.

Loads config + checkpoint the way sample.py/serve.py do, then serializes
the entire compiled sampling program — weights, T-step chain, Kelvin
scalers — via jax.export (srewd_tpu/serving/export.py):

    python scripts/export_sampler.py -c <cfg>.json -m <checkpoint> \
        -o model.srexport [--use-ema] [--sampler dpm --ddim-steps 25]

Serving then needs only jax + the artifact:

    from srewd_tpu.serving.export import load_sampler   # or vendor the
    fn = load_sampler("model.srexport")                 # 30-line loader
    sr_kelvin = fn(lr_kelvin, months, seed=0)

Export on the platform you will serve on (the kernel routing — paired
level, flash attention — is decided at trace time).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-m", "--model_path", default=None)
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--sampler", choices=["ddpm", "ddim", "dpm"], default=None)
    ap.add_argument("--ddim-steps", type=int, default=None,
                    help="fast-sampler step count (config default: 50); "
                         "applies even without --sampler")
    ap.add_argument("--ddim-eta", type=float, default=None,
                    help="DDIM stochasticity (config default: 0.0); "
                         "applies even without --sampler")
    ap.add_argument("--spacing", default=None,
                    choices=["linspace", "trailing", "quad", "logsnr"],
                    help="fast-sampler timestep spacing (gaussian.select_taus)")
    ap.add_argument("--no-clip-denoised", action="store_true")
    ap.add_argument("--static-batch", type=int, default=None,
                    help="export for ONE fixed batch size instead of the "
                         "default symbolic batch dimension")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from srewd_tpu.cli import build_data_handler, build_trainer
    from srewd_tpu.configs.config import Config
    from srewd_tpu.serving.export import export_sampler, save_sampler

    cfg = Config(args.config, phase="val", experiment=False)
    opt = cfg.get_opt()
    if args.model_path:
        opt["path"]["resume_state"] = args.model_path
    overrides = {}
    if args.sampler:
        overrides["sampler"] = args.sampler
    if args.ddim_steps is not None:
        overrides["ddim_steps"] = args.ddim_steps
    if args.ddim_eta is not None:
        overrides["ddim_eta"] = args.ddim_eta
    if args.spacing:
        overrides["tau_spacing"] = args.spacing
    if args.no_clip_denoised:
        overrides["clip_denoised"] = False
    if overrides:
        opt["model"].setdefault("diffusion", {}).update(overrides)

    dh = build_data_handler(opt)
    example = next(iter(dh.val_batches()))
    trainer = build_trainer(opt, example)
    params = (
        trainer.ema_params
        if (args.use_ema and trainer.ema_params is not None)
        else trainer.params
    )
    lr = example["LR"]
    sc = dh.batch_scalers
    exported = export_sampler(
        trainer.model, params, trainer.schedule_val, lr.shape[1:],
        sampler_kwargs=trainer.sampler_kwargs,
        lr_scaler=sc["lr"], hr_scaler=sc["hr"],
        symbolic_batch=args.static_batch is None,
        batch_size=args.static_batch or 8,
    )
    save_sampler(exported, args.out)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"EXPORT OK -> {args.out} ({size_mb:.1f} MB, "
          f"platforms={exported.platforms}, "
          f"batch={'symbolic' if args.static_batch is None else args.static_batch})",
          flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Diffusion train/val CLI — TPU-native equivalent of the reference train.py.

Usage:
    python train.py -p train -c configs/experiment_configs/<cfg>.json
    python train.py -p val   -c <cfg>.json   (validation/inference only)
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="JSON file for configuration (// comments allowed)")
    parser.add_argument("-p", "--phase", type=str, choices=["train", "val"], default="train")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu) for debugging")
    args = parser.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from srewd_tpu.cli import build_data_handler, build_trainer, standard_setup
    from srewd_tpu.training.trainer import run_training, run_validation
    from srewd_tpu.training.visualization import ImageContainer
    from srewd_tpu.utils.wandb_logger import WandbLogger

    opt, logger = standard_setup(args)
    wandb_logger = WandbLogger(opt)

    logger.info("Creating datasets.")
    dh = build_data_handler(opt)
    example = next(iter(dh.val_batches() if args.phase == "val" else dh.train_batches(0)))

    logger.info("Building model and trainer.")
    trainer = build_trainer(opt, example)

    results_dir = opt["path"].get("results", "results")

    def visualize_fn(inversed, epoch, step):
        out_dir = os.path.join(results_dir, str(epoch))
        os.makedirs(out_dir, exist_ok=True)
        container = ImageContainer(inversed, dh.metadata, n_images=1)
        if args.phase == "val":
            container.set_min_max(220, 315)  # fixed Kelvin range (train.py:178)
        fig = container.make_wandb_plot()
        wandb_logger.log_sr_hr_it_image(fig, commit=False, step=step)
        container.save_all_images(os.path.join(out_dir, f"{epoch}_{step}_1"))

    if args.phase == "train":
        run_training(opt, dh, trainer, logger, wandb_logger, visualize_fn=visualize_fn)
    else:
        import logging

        run_validation(opt, dh, trainer, logging.getLogger("val"), wandb_logger,
                       visualize_fn=visualize_fn)


if __name__ == "__main__":
    main()

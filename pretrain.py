#!/usr/bin/env python
"""Encoder pretraining CLI — TPU-native equivalent of the reference pretrain.py.

Trains SimpleCNN (FFT+DWT loss) or RRDBNet (L1) on LR->HR regression and
writes per-epoch `pretrain_<name>_E{e}` checkpoints consumed by diffusion
configs' pretrained_model.model_path.

Usage:
    python pretrain.py -p train -c configs/experiment_configs/<cfg>.json
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-p", "--phase", type=str, choices=["train", "val"], default="train")
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from srewd_tpu.cli import build_data_handler, standard_setup
    from srewd_tpu.training.optimizers import get_optimizer
    from srewd_tpu.training.pretrainer import (
        EncoderTrainer,
        get_encoder_and_criterion,
        run_pretraining,
    )
    from srewd_tpu.utils.wandb_logger import WandbLogger

    opt, logger = standard_setup(args)
    logger.info("Creating datasets.")
    dh = build_data_handler(opt)

    module, criterion = get_encoder_and_criterion(opt["model"])
    ocfg = opt["train"]["optimizer"]
    name = ocfg.get("type", "adam")
    if bool(ocfg.get("amsgrad", False)) and name == "adam":
        name = "amsgrad"  # pretrain.py:224-226 uses Adam(amsgrad=...)
    tx = get_optimizer(name, float(ocfg.get("lr", 1e-4)))

    trainer = EncoderTrainer(
        module,
        criterion,
        tx,
        checkpoint_dir=opt["path"].get("checkpoint"),
        name=opt.get("diffusion", {}).get("name", opt.get("name", "encoder")),
    )
    example = next(iter(dh.train_batches(0)))
    trainer.init_params(example)
    if opt["path"].get("resume_state"):
        trainer.resume(opt["path"]["resume_state"])

    if args.phase == "train":
        wandb_logger = WandbLogger(opt)
        logger.info("Start training")
        run_pretraining(opt, dh, trainer, logger, wandb_logger)
    else:
        logger.info("Start testing")
        val = trainer.evaluate(dh)
        logger.info(
            "Val PSNR: {PSNR:.4f}, SSIM: {SSIM:.4f}, RMSE: {RMSE:.4f}, "
            "MSE: {MSE:.4f}, MAE: {MAE:.4f}, MR: {MR:.4f}".format(**val)
        )


if __name__ == "__main__":
    main()

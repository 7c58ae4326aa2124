#!/usr/bin/env python
"""Migrate a reference PyTorch checkpoint into an orbax checkpoint.

Converts the reference's `I{iter}_E{epoch}_gen.pth` (the <Arch>Diffusion
state dict written by DDPM.save_network, model.py:183-186) — or a
pretrain-era encoder checkpoint `pretrain_<name>_E{e}_gen.pth`
(pretrain.py:255-256) — into this framework's checkpoint format, so a
reference user can resume/sample from trained weights directly:

    python scripts/convert_torch_checkpoint.py \
        -c configs/experiment_configs/sr3/<cfg>.json \
        --gen /path/to/I200000_E31_gen.pth [--out DIR]

    python train.py -p val -c <cfg>.json   # with path.resume_state -> DIR/I...

The experiment config names the architecture and shapes; the converted UNet
(+ encoder, if the checkpoint embeds one) weights are merged over a fresh
init (physrdiff's spliter has no torch weights to convert — the reference
never defines the member, physrdiff/unet.py:150), the result is
shape-validated by abstract evaluation of the training loss, and saved with
a fresh optimizer state (torch Adam moments are not migrated; they re-warm
in a few hundred steps) plus the iter/epoch counters parsed from the
filename.

Encoder checkpoints (`--encoder`): converted to the EncoderTrainer save
layout consumed by `pretrained_model.model_path`.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True,
                    help="experiment config JSON naming the target architecture")
    ap.add_argument("--gen", required=True, help="reference *_gen.pth path")
    ap.add_argument("--out", default=None,
                    help="output checkpoint dir (default: <gen dir>/converted)")
    ap.add_argument("--encoder", action="store_true",
                    help="the .pth is a SimpleCNN/RRDB pretrain checkpoint, "
                         "not a diffusion one")
    args = ap.parse_args()

    # conversion is host work — always run on the CPU platform
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from srewd_tpu.cli import build_trainer
    from srewd_tpu.configs import Config
    from srewd_tpu.training.checkpoint import CheckpointManager
    from srewd_tpu.utils.torch_convert import (
        convert_diffusion_checkpoint,
        convert_rrdb_state,
        convert_simple_cnn_state,
        drop_unused_cross_attention,
        merge_with_init,
    )

    cfg = Config(args.config, phase="val", experiment=False)
    opt = cfg.params
    sd = torch.load(args.gen, map_location="cpu", weights_only=True)
    out_dir = args.out or os.path.join(os.path.dirname(os.path.abspath(args.gen)),
                                       "converted")

    if args.encoder:
        import orbax.checkpoint as ocp

        tree = (convert_rrdb_state(sd) if any(k.startswith("RRDB_trunk.") for k in sd)
                else convert_simple_cnn_state(sd))
        tree = jax.tree.map(np.asarray, tree)
        path = os.path.join(os.path.abspath(out_dir),
                            os.path.basename(args.gen).replace(".pth", ""))
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, {"params": tree}, force=True)
        ckpt.wait_until_finished()
        print(f"encoder checkpoint written: {path}\n"
              f"use it as model.pretrained_model.model_path")
        return

    arch = opt["model"]["architecture"]
    converted = convert_diffusion_checkpoint(sd, arch)
    if "unet" in converted:
        # the reference registers J=4 hf_ca_list modules but uses only
        # len(channel_multiplier)-1; drop converted-but-unused CA weights
        mults = opt["model"].get("unet", {}).get("channel_multiplier",
                                                 (1, 2, 4, 8, 8))
        converted["unet"] = drop_unused_cross_attention(
            converted["unet"], len(mults) - 1
        )

    # fresh trainer at the config's shapes (no resume during conversion)
    opt["path"]["resume_state"] = None
    opt["path"]["checkpoint"] = os.path.abspath(out_dir)
    d = opt["model"]["diffusion"]
    h, w, c = int(d["image_height"]), int(d["image_width"]), int(d["image_channels"])
    nb = jax.device_count()  # batch must tile the data-parallel mesh axis
    example = {
        "HR": np.zeros((nb, h, w, c), np.float32),
        "LR": np.zeros((nb, h // 4, w // 4, c), np.float32),
        "months": np.zeros((nb,), np.int32),
    }
    trainer = build_trainer(opt, example)
    merged = merge_with_init(
        jax.tree.map(np.asarray, converted),
        jax.tree.map(np.asarray, trainer.params),
    )
    # shape/structure validation without compute
    ref_shapes = jax.tree.map(lambda x: np.asarray(x).shape, trainer.params)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, merged)
    if ref_shapes != got_shapes:
        raise SystemExit(f"converted tree shapes do not match the model:\n"
                         f"model: {ref_shapes}\nconverted: {got_shapes}")

    from srewd_tpu.parallel.mesh import replicated_sharding

    trainer.params = jax.device_put(merged, replicated_sharding(trainer.mesh))
    trainer.opt_state = trainer.tx.init(trainer.params)
    if trainer.ema_params is not None:
        trainer.ema_params = jax.tree.map(jax.numpy.copy, trainer.params)
    step, epoch = CheckpointManager.parse_counters(args.gen)
    trainer.step, trainer.epoch = step, epoch
    path = trainer.save()
    print(f"checkpoint written: {path}\n"
          f"resume with path.resume_state = \"{path}\" "
          f"(iter {step}, epoch {epoch}, fresh optimizer state)")


if __name__ == "__main__":
    main()

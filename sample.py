#!/usr/bin/env python
"""Date-targeted sampling CLI — TPU-native equivalent of the reference sample.py.

Loads a trained diffusion model and renders the SR field for a specific date
(or the first validation batch).

Usage:
    python sample.py -c <cfg>.json -m <checkpoint_path> -d 2017-01-01-00 \
        [-i SR HR ABS_ERROR] [-cm heat_vibrant]
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-m", "--model_path", type=str, default=None,
                        help="checkpoint to load (overrides path.resume_state)")
    parser.add_argument("-d", "--date", type=str, default=None,
                        help="date %%Y-%%m-%%d-%%H to super-resolve")
    parser.add_argument("-i", "--image_types", nargs="*", default=None)
    parser.add_argument("-cm", "--cmap", type=str, default="heat_vibrant")
    parser.add_argument("-o", "--output", type=str, default="samples_out")
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--sampler", type=str, choices=["ddpm", "ddim"], default=None,
                        help="override model.diffusion.sampler (ddim = fast)")
    parser.add_argument("--ddim-steps", type=int, default=50)
    parser.add_argument("--ddim-eta", type=float, default=0.0)
    args = parser.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from srewd_tpu.cli import build_data_handler, build_trainer, standard_setup
    from srewd_tpu.data.timeindex import months_of, parse_date
    from srewd_tpu.ops.resize import bicubic_up4
    from srewd_tpu.training.visualization import ImageContainer

    import jax.numpy as jnp
    import numpy as np

    args.phase = "val"
    opt, logger = standard_setup(args, experiment=False)
    if args.model_path:
        opt["path"]["resume_state"] = args.model_path

    overrides = {}
    if args.date:
        # reference: restrict months_subset and the val window to the date
        # (sample.py:49-52); transforms are fitted on the same window
        month = int(months_of(np.array([parse_date(args.date)]))[0])
        nxt = parse_date(args.date) + np.timedelta64(1, "h")
        from srewd_tpu.data.timeindex import format_date

        overrides = dict(
            months_subset=[month],
            groups=[[month]],
            val_min_date=args.date,
            val_max_date=format_date(nxt),
            val_batch_size=1,
        )
        tm = opt["data"]
        overrides["train_min_date"] = tm.get("train_min_date") or args.date
        overrides["train_max_date"] = tm.get("train_max_date") or format_date(nxt)

    logger.info("Creating datasets.")
    dh = build_data_handler(opt, **overrides)

    if args.sampler:
        opt["model"].setdefault("diffusion", {}).update(
            sampler=args.sampler, ddim_steps=args.ddim_steps, ddim_eta=args.ddim_eta
        )

    batch = dh.get_data_by_date(args.date) if args.date else next(iter(dh.val_batches()))
    trainer = build_trainer(opt, batch)

    logger.info("Sampling.")
    sr = trainer.sample_batch(batch)
    images = {
        "SR": np.asarray(sr),
        "HR": batch["HR"],
        "LR": batch["LR"],
        "INF": np.asarray(bicubic_up4(jnp.asarray(batch["LR"]))),
    }
    inv = dh.inverse_transform(images, batch["months"])

    os.makedirs(args.output, exist_ok=True)
    container = ImageContainer(inv, dh.metadata, n_images=1)
    container.set_min_max(220, 315)  # fixed Kelvin range (sample.py:88)
    tag = args.date or "val0"
    saved = container.save_all_images(
        os.path.join(args.output, tag), image_types=args.image_types, cmap=args.cmap
    )
    logger.info(f"Saved {len(saved)} images to {args.output}")


if __name__ == "__main__":
    main()

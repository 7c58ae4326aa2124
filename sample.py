#!/usr/bin/env python
"""Date-targeted sampling CLI — TPU-native equivalent of the reference sample.py.

Loads a trained diffusion model and renders the SR field for a specific date
(or the first validation batch).

Usage:
    python sample.py -c <cfg>.json -m <checkpoint_path> -d 2017-01-01-00 \
        [-i SR HR ABS_ERROR] [-cm heat_vibrant]

Bulk production mode (beyond the reference, which renders a single date or
the first val batch): super-resolve EVERY hour of a window and write the
fields in physical units (Kelvin) as per-hour .npy files plus a throughput
summary —
    python sample.py -c <cfg>.json -m <ckpt> \
        --date-range 2017-01-01-00 2017-02-01-00 --batch-size 8 --save-npy
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
    parser.add_argument("--date-range", nargs=2, metavar=("START", "END"),
                        default=None,
                        help="bulk mode: super-resolve every hour in "
                             "[START, END) and write per-hour SR .npy files")
    parser.add_argument("--batch-size", type=int, default=8,
                        help="bulk-mode sampling batch size")
    parser.add_argument("--save-npy", action="store_true",
                        help="bulk mode: write SR fields (Kelvin) as "
                             "<out>/sr/<timestamp>.npy")
    parser.add_argument("--ensemble", type=int, default=1,
                        help="draw N independent SR realizations per field "
                             "(probabilistic downscaling); outputs the "
                             "ensemble mean, plus per-hour std maps in bulk "
                             "mode")
    parser.add_argument("--use-ema", action="store_true",
                        help="sample with the EMA weights from the checkpoint "
                             "(requires train.ema_scheduler.enabled at train "
                             "time)")
    parser.add_argument("-i", "--image_types", nargs="*", default=None)
    parser.add_argument("-cm", "--cmap", type=str, default="heat_vibrant")
    parser.add_argument("-o", "--output", type=str, default="samples_out")
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--sampler", type=str, choices=["ddpm", "ddim", "dpm"], default=None,
                        help="override model.diffusion.sampler (ddim/dpm = fast; "
                             "dpm = DPM-Solver++(2M), --ddim-steps is its step count)")
    parser.add_argument("--ddim-steps", type=int, default=None,
                        help="fast-sampler step count (config default: 50); "
                             "applies even without --sampler")
    parser.add_argument("--ddim-eta", type=float, default=None,
                        help="DDIM stochasticity (config default: 0.0); "
                             "applies even without --sampler")
    parser.add_argument("--spacing", type=str, default=None,
                        choices=["linspace", "trailing", "quad", "logsnr"],
                        help="fast-sampler timestep spacing "
                             "(gaussian.select_taus; QUALITY_r04 sweeps "
                             "pin the best choice per arch)")
    parser.add_argument("--no-clip-denoised", action="store_true",
                        help="disable the reference's x0 clamp to [-1,1] "
                             "(model.diffusion.clip_denoised=false): the clamp "
                             "saturates standard-scaled weather fields beyond "
                             "+-1 sigma (quality_e2e measures the cost)")
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
    if args.date_range:
        start, end = args.date_range
        ts_all = np.arange(parse_date(start), parse_date(end),
                           np.timedelta64(1, "h"))
        if len(ts_all) == 0:
            raise SystemExit(f"empty date range [{start}, {end})")
        months = sorted(int(m) for m in set(months_of(ts_all)))
        overrides = dict(val_min_date=start, val_max_date=end,
                         months_subset=months,
                         val_batch_size=int(args.batch_size))
    elif args.date:
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
        opt["model"].setdefault("diffusion", {})["sampler"] = args.sampler
    if args.ddim_steps is not None:
        opt["model"].setdefault("diffusion", {})["ddim_steps"] = args.ddim_steps
    if args.ddim_eta is not None:
        opt["model"].setdefault("diffusion", {})["ddim_eta"] = args.ddim_eta
    if args.spacing:
        opt["model"].setdefault("diffusion", {})["tau_spacing"] = args.spacing
    if args.no_clip_denoised:
        opt["model"].setdefault("diffusion", {})["clip_denoised"] = False

    if args.date_range:
        return _bulk_sample(args, opt, dh, logger)

    batch = dh.get_data_by_date(args.date) if args.date else next(iter(dh.val_batches()))
    trainer = build_trainer(opt, batch)
    if args.use_ema and trainer.ema_params is None:
        logger.warning(
            "--use-ema requested but the checkpoint carries no EMA state "
            "(train with train.ema_scheduler.enabled); sampling with the "
            "raw weights instead"
        )

    logger.info("Sampling.")
    if args.ensemble > 1:
        members = np.stack([
            np.asarray(trainer.sample_batch(batch, fold=e + 1, use_ema=args.use_ema))
            for e in range(args.ensemble)
        ])
        sr = members.mean(axis=0)
        logger.info(f"ensemble of {args.ensemble}: "
                    f"mean member spread {members.std(axis=0).mean():.4f} "
                    "(normalized units)")
    else:
        sr = trainer.sample_batch(batch, use_ema=args.use_ema)
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


def _bulk_sample(args, opt, dh, logger):
    """Super-resolve every hour of the window in fixed-size device batches.

    The last partial batch is padded (repeating its final timestamp) so the
    jitted sampler sees ONE static shape — no recompilation — and the pad
    rows are dropped before writing. Fields are written de-normalized
    (Kelvin) as <output>/sr/<YYYY-MM-DD-HH>.npy.
    """
    import json
    import time

    import numpy as np

    from srewd_tpu.cli import build_trainer
    from srewd_tpu.data.timeindex import format_date

    ts_all = dh.val_timestamps
    if len(ts_all) == 0:
        raise SystemExit(
            "no data available in the requested window — the range does not "
            "intersect the dataset's timestamps (or its months are outside "
            "months_subset)"
        )
    bs = int(args.batch_size)
    first = dh.assemble(ts_all[:bs] if len(ts_all) >= bs else
                        np.concatenate([ts_all, np.repeat(ts_all[-1:],
                                                          bs - len(ts_all))]))
    trainer = build_trainer(opt, first)
    use_ema = bool(getattr(args, "use_ema", False))
    if use_ema and trainer.ema_params is None:
        logger.warning("--use-ema requested but no EMA state in checkpoint; "
                       "using raw weights")

    n_ens = max(1, int(args.ensemble))
    sr_dir = os.path.join(args.output, "sr")
    std_dir = os.path.join(args.output, "sr_std")
    if args.save_npy:
        os.makedirs(sr_dir, exist_ok=True)
        if n_ens > 1:
            os.makedirs(std_dir, exist_ok=True)

    n_done = 0
    t_start = time.perf_counter()
    t_after_first = None
    for lo in range(0, len(ts_all), bs):
        chunk = ts_all[lo:lo + bs]
        pad = bs - len(chunk)
        if lo == 0 and pad == 0:
            batch = first  # already assembled for trainer construction
        else:
            ts_batch = (np.concatenate([chunk, np.repeat(chunk[-1:], pad)])
                        if pad else chunk)
            batch = dh.assemble(ts_batch)
        # fold the batch offset (and ensemble member) into the RNG key:
        # every draw must get its own noise realization (the train step
        # counter is fixed here)
        members = np.stack([
            np.asarray(trainer.sample_batch(batch, fold=(lo + 1) * n_ens + e,
                                            use_ema=use_ema))
            for e in range(n_ens)
        ])  # [E, B, H, W, C]
        inv_m = np.stack([
            dh.inverse_transform({"SR": m}, batch["months"])["SR"]
            for m in members
        ])
        inv = inv_m.mean(axis=0)
        if args.save_npy:
            for i, ts in enumerate(chunk):  # pad rows dropped
                np.save(os.path.join(sr_dir, f"{format_date(ts)}.npy"), inv[i])
                if n_ens > 1:
                    np.save(os.path.join(std_dir, f"{format_date(ts)}.npy"),
                            inv_m[:, i].std(axis=0))
        n_done += len(chunk)
        if t_after_first is None:
            t_after_first = time.perf_counter()
        logger.info(f"sampled {n_done}/{len(ts_all)} fields")
    total_s = time.perf_counter() - t_start
    steady = (n_done - bs) / (time.perf_counter() - t_after_first) if n_done > bs else None
    summary = {
        "fields": int(n_done),
        "ensemble": n_ens,
        "total_sec": round(total_s, 2),
        "fields_per_sec_total": round(n_done / total_s, 4),
        "fields_per_sec_steady": round(steady, 4) if steady is not None else None,
        "output": sr_dir if args.save_npy else None,
    }
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    logger.info(f"bulk sampling done: {json.dumps(summary)}")


if __name__ == "__main__":
    main()

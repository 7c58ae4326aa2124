"""Shared CLI plumbing for train.py / pretrain.py / sample.py."""

from __future__ import annotations

import logging

from .configs import Config, dict2str
from .data import DataHandler
from .diffusion.schedule import Schedule
from .models.factory import build_model
from .training.optimizers import get_optimizer
from .training.trainer import DiffusionTrainer
from .utils.logging import setup_logger
from .utils.seeding import set_seeds


def build_data_handler(opt: dict, storage_root: str | None = None, **overrides) -> DataHandler:
    d = opt["data"]
    kw = dict(
        dataroot=d["dataroot"],
        variables=d["variables"],
        months_subset=d.get("months_subset"),
        groups=d.get("transform_groups"),
        transformation=d.get("transformation", "GlobalStandardScaling"),
        train_min_date=d.get("train_min_date"),
        train_max_date=d.get("train_max_date"),
        val_min_date=d.get("val_min_date"),
        val_max_date=d.get("val_max_date"),
        # config extension: extra [min, max] pairs unioned into the index
        # (reference add_data_by_date, datasets.py:210-255)
        train_date_ranges=d.get("train_date_ranges"),
        val_date_ranges=d.get("val_date_ranges"),
        train_batch_size=int(d.get("batch_size", 4)),
        val_batch_size=int(d.get("val_batch_size", 8)),
        shuffle=bool(d.get("use_shuffle", True)),
        lead_time=int(d.get("lead_time", 0) or 0),
        delays=d.get("delays"),
        storage_root=storage_root or d["dataroot"],
        read_threads=int(d.get("num_workers", 16)),
    )
    import jax as _jax

    if _jax.process_count() > 1:  # per-host disjoint stride of the index
        kw.setdefault("process_index", _jax.process_index())
        kw.setdefault("process_count", _jax.process_count())
    kw.update(overrides)
    return DataHandler(**kw).process_data()


def build_trainer(opt: dict, example_batch: dict, dtype=None) -> DiffusionTrainer:
    model = build_model(opt["model"], dtype=dtype)
    bs = opt["model"]["beta_schedule"]
    sched_train = Schedule.from_config(bs["train"])
    sched_val = Schedule.from_config(bs.get("val", bs["train"]))
    ocfg = opt["train"]["optimizer"]
    tx = get_optimizer(ocfg.get("type", "adam"), float(ocfg.get("lr", 1e-4)))
    if ocfg.get("grad_clip"):
        # config extension: global-norm gradient clipping ahead of the
        # optimizer. sr3 (full-field x0 target) measurably needs it on the
        # spectral benchmark: unclipped Adam 1e-4 blew up at ~5.5k steps and
        # settled into the zero-output attractor (loss pinned at
        # E|N(0,1)|=0.798 — VAL_CURVE_SR3_r05.json); the residual archs
        # never tripped it.
        import optax

        tx = optax.chain(
            optax.clip_by_global_norm(float(ocfg["grad_clip"])), tx
        )
    finetune_norm = bool(opt["model"].get("finetune_norm"))
    if finetune_norm:
        from .training.optimizers import finetune_norm_optimizer

        tx = finetune_norm_optimizer(tx)
    ema_cfg = opt["train"].get("ema_scheduler") or {}
    ema_enabled = bool(ema_cfg.get("enabled", False))
    dcfg = opt["model"].get("diffusion") or {}
    sampler_kwargs = {}
    # config extension: "ddpm" (default), "ddim", or "dpm" (DPM-Solver++(2M);
    # ddim_steps doubles as its step count)
    if dcfg.get("sampler"):
        sampler_kwargs = {
            "sampler": dcfg["sampler"],
            "ddim_steps": int(dcfg.get("ddim_steps", 50)),
            # default eta=1 (ancestral-like): the measured winner on a
            # trained checkpoint — QUALITY_r05.json's sweep has every eta=1
            # row at DDPM-chain quality (ddim-50-trailing-eta1 0.843x
            # bicubic vs the 1000-step chain's 0.852x) while every eta=0 /
            # dpm row sits ~1.18x. Set ddim_eta explicitly to override.
            "ddim_eta": float(dcfg.get("ddim_eta", 1.0)),
        }
        if dcfg.get("tau_spacing"):
            # fast-sampler timestep spacing (gaussian.select_taus):
            # linspace | trailing | quad | logsnr
            sampler_kwargs["tau_spacing"] = str(dcfg["tau_spacing"])
    if "clip_denoised" in dcfg:
        # config extension: the reference always clamps the x0 estimate to
        # [-1,1] (diffusion.py:168-169) — correct for [-1,1]-ranged images,
        # but on standard-scaled (sigma-unit) weather fields it saturates
        # everything beyond +-1 sigma; quality_e2e.py measures the cost.
        sampler_kwargs["clip_denoised"] = bool(dcfg["clip_denoised"])
    trainer = DiffusionTrainer(
        model,
        sched_train,
        sched_val,
        tx,
        ema_decay=float(ema_cfg.get("ema_decay", 0.9999)) if ema_enabled else None,
        ema_start=int(ema_cfg.get("step_start_ema", 0)),
        seed=int(opt.get("seed", 0)),
        checkpoint_dir=opt["path"].get("checkpoint"),
        sampler_kwargs=sampler_kwargs,
        # config extension: train.checkpoint_keep rotates old checkpoints
        # (None = reference parity, keep everything)
        checkpoint_keep=(
            int(opt["train"]["checkpoint_keep"])
            if opt.get("train", {}).get("checkpoint_keep") else None
        ),
    )
    import logging as _logging

    _logging.getLogger("base").info(
        "Initializing parameters on device (first compile — slow on a cold "
        "or congested axon link)."
    )
    trainer.init_params(example_batch)
    _logging.getLogger("base").info("Parameters initialized.")

    pre = opt["model"].get("pretrained_model") or {}
    if pre.get("model_path") and trainer.model.encoder is not None:
        import jax

        from .parallel.mesh import replicated_sharding
        from .training.pretrainer import load_encoder_params

        trainer.params["encoder"] = jax.device_put(
            load_encoder_params(pre["model_path"]),
            replicated_sharding(trainer.mesh),
        )

    resume = opt["path"].get("resume_state")
    if resume:
        if finetune_norm:
            # reference loads non-strict under finetune_norm (model.py:208-209):
            # params-only, tolerant of structure drift; optimizer state and
            # counters start fresh for the finetune run.
            trainer.load_params_tolerant(resume)
        else:
            trainer.resume(resume)
    return trainer


def standard_setup(args, experiment: bool = True):
    """Config + seeding + loggers; returns (opt, logger).

    Multi-host: set SREWD_MULTIHOST=1 (with the usual JAX coordinator env)
    to call jax.distributed.initialize(); each host then reads a disjoint
    stride of the sample index (build_data_handler wires process_index/
    process_count) and the SPMD mesh spans all hosts over DCN.
    """
    import os as _os

    if _os.environ.get("SREWD_MULTIHOST") == "1":
        import jax as _jax

        _jax.distributed.initialize()
    set_seeds(0)
    cfg = Config(args.config, phase=getattr(args, "phase", None), experiment=experiment)
    opt = cfg.get_opt()
    if experiment:
        setup_logger(None, opt["path"]["log"], "train", screen=True)
        setup_logger("val", opt["path"]["log"], "val")
    else:
        logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("base")
    logger.info(dict2str(opt))
    return opt, logger

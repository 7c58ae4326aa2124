"""DiffusionTrainer — jitted SPMD train/sample steps, EMA, checkpoint/resume.

Replaces the reference's DDPM train-facing machinery (model.py:
feed_data/optimize_parameters/generate_sr/save_network/load_network) and the
train.py driver loop, TPU-first:
  * one jitted, buffer-donating train step containing the on-device bicubic
    upsample, loss, grads and optimizer update; the global batch is sharded
    over the mesh 'data' axis and params are replicated, so XLA GSPMD emits
    the psum gradient reduction (the DataParallel equivalent, SURVEY.md §2.8);
  * one jitted sampling step running the entire T-step reverse chain as a
    lax.scan (vs. the reference's Python loop of 1000 CUDA-synced calls);
  * EMA of parameters implemented (the reference parses train.ema_scheduler
    but never uses it — README.md:130; here it is functional and opt-in via
    ema_scheduler.enabled);
  * checkpoints via orbax (I{iter}_E{epoch} dirs) with exact resume of
    params/opt_state/EMA/step/epoch.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.schedule import Schedule
from ..models.factory import DiffusionModel
from ..ops.resize import bicubic_up4
from ..parallel.mesh import batch_sharding, make_mesh, param_placement
from ..utils.profiling import StepTimer, trace
from .checkpoint import CheckpointManager
from .metrics import TrainMetrics, ValidationMetrics, create_metric_dict


class DiffusionTrainer:
    def __init__(
        self,
        model: DiffusionModel,
        schedule_train: Schedule,
        schedule_val: Schedule,
        optimizer: optax.GradientTransformation,
        mesh=None,
        ema_decay: Optional[float] = None,
        ema_start: int = 0,
        seed: int = 0,
        checkpoint_dir: Optional[str] = None,
        sampler_kwargs: Optional[dict] = None,
        model_shard_min_dim: Optional[int] = None,
        checkpoint_keep: Optional[int] = None,
    ):
        # model_shard_min_dim: opt-in lazy tensor parallelism — params whose
        # last (output-channel) dim is >= this and divisible by the mesh
        # 'model' axis are sharded over it (parallel.mesh.param_placement);
        # None (default) keeps the replicated-params DP placement.
        self.model_shard_min_dim = model_shard_min_dim
        # e.g. {"sampler": "ddim", "ddim_steps": 50, "ddim_eta": 0.0}
        self.sampler_kwargs = dict(sampler_kwargs or {})
        self.model = model
        self.schedule_train = schedule_train
        self.schedule_val = schedule_val
        self.tx = optimizer
        self.mesh = mesh if mesh is not None else make_mesh()
        self.ema_decay = ema_decay
        self.ema_start = ema_start
        self.base_key = jax.random.key(seed)
        self.step = 0
        self.epoch = 0
        self.params = None
        self.opt_state = None
        self.ema_params = None
        self.ckpt = (
            CheckpointManager(checkpoint_dir, keep=checkpoint_keep)
            if checkpoint_dir else None
        )
        self._build_steps()

    # ----------------------------------------------------------------- build
    def _build_steps(self):
        from ..models.blocks import spmd_mesh

        model, tx, mesh = self.model, self.tx, self.mesh
        sched_t = self.schedule_train
        base_key = self.base_key

        # `with spmd_mesh(mesh)` runs at TRACE time (the Python body of a
        # jitted fn executes once, during tracing) — it tells the attention
        # routing (models/blocks._flash_route) which mesh to shard_map the
        # Pallas flash kernels over when device_count > 1.
        #
        # The per-step RNG fold happens INSIDE the step (base_key is a traced
        # closure constant, `step` a traced int32): host-side
        # jax.random.fold_in costs a separate dispatch per step (~4 ms over
        # the axon tunnel) and would serialize the async pipeline.
        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, hr, lr, months, step):
            with spmd_mesh(mesh):
                key = jax.random.fold_in(base_key, step)
                batch = {"HR": hr, "LR": lr, "SR": bicubic_up4(lr), "months": months}
                loss, grads = jax.value_and_grad(model.loss)(params, batch, key, sched_t, True)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss

        # donate the previous EMA tree — the update rewrites every leaf, and
        # without donation each call allocates a full second copy of the
        # 92M-param tree
        @partial(jax.jit, donate_argnums=(0,))
        def ema_step(ema, params, decay):
            return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema, params)

        sampler_kwargs = self.sampler_kwargs

        def make_sample_fn(schedule):
            @jax.jit
            def sample_step(params, hr, lr, months, key):
                with spmd_mesh(mesh):
                    batch = {"HR": hr, "LR": lr, "SR": bicubic_up4(lr), "months": months}
                    return model.generate_sr(params, batch, key, schedule, **sampler_kwargs)

            return sample_step

        self._train_step = train_step
        self._ema_step = ema_step
        self._sample_val = make_sample_fn(self.schedule_val)

    # ------------------------------------------------------------------ state
    def _place(self, tree):
        """device_put with the param placement (replicated, or TP-sharded
        leaves when model_shard_min_dim is set — see param_placement)."""
        return jax.device_put(
            tree, param_placement(tree, self.mesh, self.model_shard_min_dim)
        )

    def init_params(self, example_batch: dict) -> None:
        if jax.process_count() > 1:
            # multi-host: flax init + optax init run EAGERLY, which cannot
            # execute on arrays sharded over non-addressable devices — trace
            # them host-locally (only shapes matter; the same seed gives
            # identical params on every host), then device_put the replicated
            # global trees
            local = {
                k: jnp.asarray(np.asarray(example_batch[k]))
                for k in ("HR", "LR", "months")
            }
            params = jax.tree.map(np.asarray, self.model.init(self.base_key, local))
            opt_state = jax.tree.map(np.asarray, self.tx.init(params))
            self.params = self._place(params)
            self.opt_state = self._place(opt_state)
            if self.ema_decay is not None:
                self.ema_params = self._place(params)  # independent copy
            return
        batch = self._device_batch(example_batch)
        params = self.model.init(self.base_key, batch)
        self.params = self._place(params)
        self.opt_state = self._place(self.tx.init(self.params))
        if self.ema_decay is not None:
            # deep-copy: train_step donates the params buffers, so the EMA
            # tree must not alias them
            self.ema_params = jax.tree.map(jnp.copy, self.params)

    def resume(self, path: str) -> None:
        target = {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": 0,
            "epoch": 0,
        }
        if self.ema_params is not None:
            target["ema_params"] = self.ema_params
        mgr = self.ckpt or CheckpointManager(path.rsplit("/", 1)[0])
        state = mgr.restore(path, target)
        self.params = self._place(state["params"])
        self.opt_state = self._place(state["opt_state"])
        if "ema_params" in state and state["ema_params"] is not None:
            self.ema_params = self._place(state["ema_params"])
        self.step = int(state["step"])
        self.epoch = int(state["epoch"])

    def load_params_tolerant(self, path: str) -> None:
        """Params-only, non-strict checkpoint load (reference finetune_norm
        semantics, model.py:208-209 strict=False): leaves present in both
        trees are taken from the checkpoint, missing ones keep their init
        values, extra checkpoint leaves are ignored. opt_state and step/epoch
        counters are left untouched (fresh finetune run)."""
        mgr = self.ckpt or CheckpointManager(path.rsplit("/", 1)[0])
        raw = mgr.restore(path, None)  # raw pytree, no structure target
        loaded = raw.get("params", raw)

        def merge(init, got, path=""):
            if not isinstance(init, dict):
                if got is None:
                    return init
                got = jnp.asarray(got)
                if got.shape != init.shape:  # torch strict=False also raises here
                    raise ValueError(
                        f"checkpoint shape mismatch at {path}: {got.shape} vs {init.shape}"
                    )
                return got
            return {
                k: merge(v, got.get(k) if isinstance(got, dict) else None, f"{path}/{k}")
                for k, v in init.items()
            }

        self.params = self._place(merge(self.params, loaded))
        if self.ema_params is not None:
            # re-seed the EMA from the loaded weights — otherwise it keeps
            # tracking the random init for ~1/(1-decay) steps
            self.ema_params = jax.tree.map(jnp.copy, self.params)

    def save(self) -> Optional[str]:
        if self.ckpt is None:
            return None
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step,
            "epoch": self.epoch,
        }
        if self.ema_params is not None:
            state["ema_params"] = self.ema_params
        return self.ckpt.save(state, self.step, self.epoch)

    def _device_batch(self, batch: dict) -> dict:
        sh = batch_sharding(self.mesh)
        multihost = jax.process_count() > 1

        def put(v):
            # prefetched batches are already sharded — skip the re-put
            if isinstance(v, jax.Array) and v.sharding == sh:
                return v
            if multihost:
                # each host contributes its own disjoint stride of the index
                # (DataHandler process_index/process_count, cli.py): the
                # host-LOCAL rows compose the global batch, global size =
                # local * process_count
                return jax.make_array_from_process_local_data(sh, np.asarray(v))
            return jax.device_put(jnp.asarray(v), sh)

        return {k: put(batch[k]) for k in ("HR", "LR", "months")}

    # ------------------------------------------------------------------ steps
    def train_on_batch_async(self, batch: dict) -> jax.Array:
        """Dispatch one train step; return the loss as a DEVICE scalar without
        waiting for it.

        Per-step `float(loss)` serializes the pipeline: on the remote (axon)
        TPU backend the measured sr3 step was 156.7 ms wall against 85 ms of
        device compute — the remaining ~72 ms was the blocking loss fetch +
        dispatch that async dispatch overlaps (profile_train / DESIGN.md §7).
        Callers that log losses should batch-fetch them every print interval
        (one `np.asarray(jnp.stack(pending))` round trip), as run_training
        does. The donation chain orders steps: fetching step N's loss implies
        steps 1..N all executed.
        """
        b = self._device_batch(batch)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, b["HR"], b["LR"], b["months"],
            np.int32(self.step),
        )
        self.step += 1
        if self.ema_decay is not None and self.step >= self.ema_start:
            self.ema_params = self._ema_step(self.ema_params, self.params, self.ema_decay)
        return loss

    def train_on_batch(self, batch: dict) -> float:
        """One train step, blocking on (and returning) the loss value."""
        return float(self.train_on_batch_async(batch))

    def sample_batch(self, batch: dict, use_ema: bool = False,
                     fold: int = 0) -> jnp.ndarray:
        """fold: extra key diversifier for multi-batch inference at a fixed
        train step (e.g. bulk date-range sampling) — without it every batch
        would draw the identical noise realization."""
        b = self._device_batch(batch)
        params = self.ema_params if (use_ema and self.ema_params is not None) else self.params
        key = jax.random.fold_in(self.base_key, 2_000_000_000 + self.step)
        if fold:
            key = jax.random.fold_in(key, fold)
        return self._sample_val(params, b["HR"], b["LR"], b["months"], key)


def run_training(
    opt: dict,
    data_handler,
    trainer: DiffusionTrainer,
    logger: Optional[logging.Logger] = None,
    wandb_logger=None,
    visualize_fn=None,
) -> None:
    """The train.py driver loop with reference cadence (train.py:30-129).

    n_iter total iterations; every print_freq log train loss stats; every
    val_freq validate (1 batch unless full_val_freq divides — then the full
    val set); every save_checkpoint_freq write a checkpoint.
    """
    logger = logger or logging.getLogger("base")
    tcfg = opt["train"]
    n_iter = int(tcfg["n_iter"])
    print_freq = int(tcfg.get("print_freq", 100))
    val_freq = int(tcfg.get("val_freq", 10000))
    full_val_freq = int(tcfg.get("full_val_freq", val_freq))
    save_freq = int(tcfg.get("save_checkpoint_freq", 10000))
    # ema_scheduler.use_for_val: validate with the EMA weights (beyond
    # reference — it parses ema_scheduler but never uses it, README.md:130)
    ema_val = bool((tcfg.get("ema_scheduler") or {}).get("use_for_val", False))

    # one-shot profiler capture: trace steps [profile_start, profile_start+profile_steps)
    profile_dir = tcfg.get("profile_trace_dir")
    profile_start = int(tcfg.get("profile_start", 10))
    profile_steps = int(tcfg.get("profile_steps", 5))
    profiling = False

    from ..data.prefetch import DevicePrefetcher

    train_metrics = TrainMetrics()
    timer = StepTimer()
    timer.start()
    # device-side losses pending fetch: steps are dispatched WITHOUT waiting
    # (train_on_batch_async) so host dispatch pipelines ahead of the TPU;
    # one stacked fetch per print interval amortizes the round trip that a
    # per-step float(loss) would pay every step
    pending: list = []

    def flush_losses() -> None:
        if not pending:
            return
        for v in np.asarray(jnp.stack(pending)):
            train_metrics.update({"l_pix": float(v)})
        pending.clear()

    # train.device_data_cache: upload the normalized train split to HBM once
    # and serve each step as an on-device gather (data/device_cache.py) —
    # per-step host->device traffic drops to the index vector, so throughput
    # is invariant to PCIe/tunnel bandwidth. Opt-in: the split must fit next
    # to the training state (~0.53 MB/field fp32 at 128x256).
    device_cache = None
    if tcfg.get("device_data_cache") and jax.process_count() == 1:
        from ..data.device_cache import DeviceDataset

        device_cache = DeviceDataset(data_handler, "train")
        logger.info(
            f"Device data cache: {device_cache.nbytes / 1e6:.0f} MB "
            f"({len(device_cache.months)} fields) resident in HBM."
        )

    while trainer.step < n_iter:
        trainer.epoch += 1
        if device_cache is not None:
            batches = device_cache.batches(epoch=trainer.epoch)
        else:
            # assemble + device_put the next batches in a background thread
            batches = DevicePrefetcher(
                data_handler.train_batches(epoch=trainer.epoch), trainer._device_batch
            )
        for batch in batches:
            if trainer.step >= n_iter:
                break
            if profile_dir and not profiling and trainer.step >= profile_start:
                jax_trace = trace(profile_dir)
                jax_trace.__enter__()
                profiling = True
                profile_end = trainer.step + profile_steps
            pending.append(trainer.train_on_batch_async(batch))
            timer.tick()  # async: times amortized throughput, not one step
            if profiling and trainer.step >= profile_end:
                # force execution of the traced steps before closing the
                # capture (axon block_until_ready is a no-op; a value fetch
                # is the only real sync)
                flush_losses()
                jax_trace.__exit__(None, None, None)
                profiling = False
                profile_dir = None
                logger.info(f"Profiler trace written ({profile_steps} steps).")

            if trainer.step % print_freq == 0:
                flush_losses()
                logger.info(
                    f"Epoch: {trainer.epoch:5}  |  Iteration: {trainer.step:8} |"
                    f" {train_metrics.metrics2str()} | {timer.summary_str()}"
                )
                if wandb_logger:
                    wandb_logger.log_train_metrics(
                        train_metrics.metrics2dict(), commit=False, step=trainer.step
                    )
                    wandb_logger.log_train_mean_metrics(
                        train_metrics.mean_metrics2dict(), commit=False, step=trainer.step
                    )
                train_metrics.reset()

            if trainer.step % val_freq == 0:
                full = trainer.step % full_val_freq == 0
                run_validation(
                    opt, data_handler, trainer,
                    logging.getLogger("val"),  # metrics -> val.log (train.py:132-198)
                    wandb_logger,
                    max_batches=None if full else 1, visualize_fn=visualize_fn,
                    use_ema=ema_val,
                )

            if trainer.step % save_freq == 0:
                logger.info("Saving models and training states.")
                trainer.save()

            if wandb_logger:
                wandb_logger.commit(step=trainer.step)
    flush_losses()  # sync outstanding steps (and count them) before saving
    if profiling:  # n_iter reached inside the capture window
        jax_trace.__exit__(None, None, None)
        logger.info("Profiler trace written (training ended inside window).")
    logger.info("End of training.")
    trainer.save()


def run_validation(
    opt: dict,
    data_handler,
    trainer: DiffusionTrainer,
    logger: Optional[logging.Logger] = None,
    wandb_logger=None,
    max_batches: Optional[int] = None,
    visualize_fn=None,
    use_ema: bool = False,
) -> dict:
    """Validation: sample, inverse-transform to Kelvin, stream metrics."""
    logger = logger or logging.getLogger("val")
    val_metrics = ValidationMetrics(create_metric_dict())
    t0 = time.time()
    for i, batch in enumerate(data_handler.val_batches()):
        if max_batches is not None and i >= max_batches:
            break
        sr = trainer.sample_batch(batch, use_ema=use_ema)
        if jax.process_count() > 1:
            # every host samples its own stride of the val set; gather the
            # global result so metrics cover the full batch on each host
            from jax.experimental import multihost_utils

            sr = multihost_utils.process_allgather(sr, tiled=True)
            batch = {
                "HR": multihost_utils.process_allgather(
                    jnp.asarray(batch["HR"]), tiled=True),
                "LR": multihost_utils.process_allgather(
                    jnp.asarray(batch["LR"]), tiled=True),
                "months": multihost_utils.process_allgather(
                    jnp.asarray(batch["months"]), tiled=True),
            }
        images = {
            "SR": np.asarray(sr),
            "HR": np.asarray(batch["HR"]),
            "LR": np.asarray(batch["LR"]),
            "INF": np.asarray(bicubic_up4(jnp.asarray(batch["LR"]))),
        }
        inv = data_handler.inverse_transform(images, batch["months"])
        val_metrics.update(inv["HR"], inv["SR"])
        if i == 0 and visualize_fn is not None and opt["train"].get("save_visualizations"):
            visualize_fn(inv, trainer.epoch, trainer.step)
    val_time = time.time() - t0
    metrics = val_metrics.compute_metrics()
    logger.info(
        f"Epoch: {trainer.epoch:5}  |  Iteration: {trainer.step:8} |"
        f" {val_metrics.metrics2str()} | val_time: {val_time:.1f}s"
    )
    if wandb_logger:
        wandb_logger.log_val_metrics(metrics, commit=False, step=trainer.step)
        wandb_logger.log_val_time(val_time, commit=False, step=trainer.step)
        wandb_logger.commit(step=trainer.step)
    return metrics

"""EncoderTrainer — epoch-based LR->HR regression pretraining of encoders.

Reference: pretrain.py — SimpleCNN with the FFT+DWT image_compare_loss, or
RRDBNet with plain L1 (pretrain.py:141-164); per-epoch eval with the 6
metrics on inverse-transformed fields; per-epoch checkpoints
`pretrain_<name>_E{epoch}` consumed later as diffusion conditioning
encoders.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from ..ops.losses import image_compare_loss
from ..ops.resize import bicubic_up4
from ..parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from .metrics import ValidationMetrics, create_metric_dict


def get_encoder_and_criterion(model_cfg: dict, dtype=None):
    """pretrain.py:get_model equivalent: config -> (flax module, criterion)."""
    name = model_cfg.get("name", "SimpleSR")
    if name == "SimpleSR":
        from ..models.simple_cnn import SimpleCNN

        model = SimpleCNN(
            scale_factor=4, channels=int(model_cfg.get("in_channel", 1)), dtype=dtype
        )
        criterion = image_compare_loss
    elif name == "RRDBNet":
        from ..models.rrdb import RRDBNet

        model = RRDBNet(
            in_nc=int(model_cfg.get("in_channel", 1)),
            out_nc=int(model_cfg.get("out_channel", 1)),
            nf=int(model_cfg.get("hidden_size", 64)),
            nb=int(model_cfg.get("num_block", 17)),
            gc=int(model_cfg.get("hidden_size", 64)) // 2,
            dtype=dtype,
            # pretrain targets are sigma-scaled; the reference's [0,1]
            # output clamp saturates them and zeroes half the gradients
            # at init (see RRDBNet.clamp_output)
            clamp_output=False,
        )
        criterion = lambda x, y: jnp.mean(jnp.abs(x - y))  # noqa: E731
    else:
        raise ValueError(f"unknown pretrain model name: {name}")
    return model, criterion


def load_encoder_params(path: str):
    """Restore encoder params saved by EncoderTrainer.save()."""
    state = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    return state["params"] if isinstance(state, dict) and "params" in state else state


class EncoderTrainer:
    def __init__(
        self,
        module,
        criterion: Callable,
        optimizer: optax.GradientTransformation,
        mesh=None,
        seed: int = 0,
        checkpoint_dir: Optional[str] = None,
        name: str = "encoder",
    ):
        self.module = module
        self.criterion = criterion
        self.tx = optimizer
        self.mesh = mesh if mesh is not None else make_mesh()
        self.base_key = jax.random.key(seed)
        self.checkpoint_dir = checkpoint_dir
        self.name = name
        self.params = None
        self.opt_state = None
        self.iteration = 0
        self._ckpt = ocp.StandardCheckpointer()

        crit, module_ = self.criterion, self.module

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, lr_img, hr_img):
            def loss_fn(p):
                out = module_.apply({"params": p}, lr_img)
                return crit(out, hr_img)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def predict(params, lr_img):
            return module_.apply({"params": params}, lr_img)

        self._train_step = train_step
        self._predict = predict

    def init_params(self, example_batch: dict) -> None:
        lr = jnp.asarray(example_batch["LR"])
        params = self.module.init(self.base_key, lr)["params"]
        rep = replicated_sharding(self.mesh)
        self.params = jax.device_put(params, rep)
        self.opt_state = jax.device_put(self.tx.init(self.params), rep)

    def resume(self, path: str) -> None:
        state = self._ckpt.restore(os.path.abspath(path), {"params": self.params})
        self.params = jax.device_put(state["params"], replicated_sharding(self.mesh))

    def save(self, epoch: int) -> Optional[str]:
        if not self.checkpoint_dir:
            return None
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        path = os.path.abspath(
            os.path.join(self.checkpoint_dir, f"pretrain_{self.name}_E{epoch}")
        )
        self._ckpt.save(path, {"params": self.params}, force=True)
        self._ckpt.wait_until_finished()
        return path

    def _put(self, arr) -> jnp.ndarray:
        return jax.device_put(jnp.asarray(arr), batch_sharding(self.mesh))

    def train_epoch(self, data_handler, epoch: int) -> tuple[float, int]:
        total, steps = 0.0, 0
        for batch in data_handler.train_batches(epoch=epoch):
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, self._put(batch["LR"]), self._put(batch["HR"])
            )
            total += float(loss)
            steps += 1
            self.iteration += 1
        return total / max(steps, 1), steps

    def evaluate(self, data_handler) -> dict:
        metrics = ValidationMetrics(create_metric_dict())
        for batch in data_handler.val_batches():
            out = self._predict(self.params, self._put(batch["LR"]))
            images = {
                "SR": np.asarray(out),
                "HR": batch["HR"],
                "INTERPOLATED": np.asarray(bicubic_up4(jnp.asarray(batch["LR"]))),
            }
            inv = data_handler.inverse_transform(images, batch["months"])
            metrics.update(inv["SR"], inv["HR"])  # pretrain.py:evaluate order
        return metrics.compute_metrics()

    def save_results(self, data_handler, out_dir: str, max_batches: int = 15) -> int:
        """IT/SR/HR result plates for the first val batches (pretrain.py:106-138)."""
        from .visualization import ImageContainer

        os.makedirs(out_dir, exist_ok=True)
        saved = 0
        for i, batch in enumerate(data_handler.val_batches()):
            if i >= max_batches:
                break
            out = self._predict(self.params, self._put(batch["LR"]))
            images = {
                "SR": np.asarray(out),
                "HR": batch["HR"],
                "INF": np.asarray(bicubic_up4(jnp.asarray(batch["LR"]))),
            }
            inv = data_handler.inverse_transform(images, batch["months"])
            fig = ImageContainer(inv, data_handler.metadata, n_images=1).make_wandb_plot()
            fig.savefig(os.path.join(out_dir, f"result_{i}.png"), dpi=110,
                        bbox_inches="tight")
            import matplotlib.pyplot as plt

            plt.close(fig)
            saved += 1
        return saved


def run_pretraining(
    opt: dict,
    data_handler,
    trainer: EncoderTrainer,
    logger: Optional[logging.Logger] = None,
    wandb_logger=None,
) -> None:
    """The pretrain.py epoch loop (pretrain.py:234-256)."""
    logger = logger or logging.getLogger("base")
    epochs = int(opt["train"]["epoch"])
    for epoch in range(epochs):
        train_loss, _ = trainer.train_epoch(data_handler, epoch)
        val = trainer.evaluate(data_handler)
        logger.info(
            f"Epoch [{epoch + 1}/{epochs}], Iter {trainer.iteration}, "
            f"Train Loss: {train_loss:.4f}, Val PSNR: {val['PSNR']:.4f}, "
            f"SSIM: {val['SSIM']:.4f}, RMSE: {val['RMSE']:.4f}, MSE: {val['MSE']:.4f}"
        )
        if wandb_logger:
            wandb_logger.log_metrics({"epoch": epoch + 1}, commit=False, step=trainer.iteration)
            wandb_logger.log_train_metrics({"loss": train_loss}, commit=False, step=trainer.iteration)
            wandb_logger.log_val_metrics(val, commit=False, step=trainer.iteration)
            wandb_logger.commit(step=trainer.iteration)
        trainer.save(epoch)
    results_dir = opt.get("path", {}).get("results")
    if results_dir:
        n = trainer.save_results(data_handler, results_dir)
        logger.info(f"Saved {n} IT/SR/HR result plates to {results_dir}.")

"""ImageContainer + logging/wandb unit tests (reference training/visualization.py)."""

import logging
import os

import numpy as np

import matplotlib

matplotlib.use("Agg")

from srewd_tpu.training.visualization import CMAPS, ImageContainer
from srewd_tpu.utils.wandb_logger import WandbLogger


def _visuals(b=2, h=8, w=16):
    rng = np.random.default_rng(0)
    base = 270.0 + 10 * rng.standard_normal((b, h, w, 1))
    return {
        "SR": base + rng.standard_normal((b, h, w, 1)),
        "HR": base,
        "LR": base[:, ::2, ::2, :],
        "INF": base + 0.5,
    }


class TestImageContainer:
    def test_derived_maps(self):
        c = ImageContainer(_visuals())
        assert "RESIDUAL" in c.visuals and "ABS_ERROR" in c.visuals
        np.testing.assert_allclose(
            c.visuals["ABS_ERROR"], np.abs(c.visuals["SR"] - c.visuals["HR"])
        )

    def test_fixed_range(self):
        c = ImageContainer(_visuals())
        c.set_min_max(220.0, 315.0)  # sample.py fixed Kelvin range
        assert c._range_for("SR") == (220.0, 315.0)
        lo, hi = c._range_for("RESIDUAL")  # residual range stays symmetric
        assert lo == -hi

    def test_cmaps_present(self):
        for name in ("heat_vibrant", "heat_muted", "ae_color", "abs_color"):
            assert name in CMAPS

    def test_save_all_images(self, tmp_path):
        c = ImageContainer(_visuals(), n_images=1)
        files = c.save_all_images(str(tmp_path / "plate"), image_types=["SR", "ABS_ERROR"])
        assert len(files) == 2
        assert all(os.path.isfile(f) for f in files)

    def test_wandb_plot_figure(self):
        fig = ImageContainer(_visuals()).make_wandb_plot()
        assert len(fig.axes) >= 3  # IT/SR/HR panels (+colorbars)


class TestWandbLoggerOptional:
    def test_noop_without_wandb(self):
        wl = WandbLogger({"wandb": {"project": "x", "entity": None}})
        assert not wl.enabled
        # all log methods must be safe no-ops
        wl.log_train_metrics({"l_pix": 1.0}, commit=False, step=1)
        wl.log_val_metrics({"RMSE": 2.0}, commit=False, step=1)
        wl.log_val_time(1.2, commit=False, step=1)
        wl.commit(step=1)

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

    def test_caller_cmap_never_overrides_derived_maps(self, tmp_path, monkeypatch):
        """A caller-supplied cmap (sample.py -cm, default heat_vibrant)
        applies only to the main fields; DELTA/AE renders keep the fixed
        custom/custom_ae maps (reference visualization.py:136-165)."""
        c = ImageContainer(_visuals(), n_images=1)
        drawn = {}
        orig = ImageContainer._draw

        def spy(self, ax, field, key, cmap_name=None, vrange=None, cmap=None):
            drawn[key] = cmap if cmap is not None else self._cmap_for(key, cmap_name)
            return orig(self, ax, field, key, cmap_name, vrange, cmap)

        monkeypatch.setattr(ImageContainer, "_draw", spy)
        c.save_all_images(str(tmp_path / "p"),
                          image_types=["SR", "DELTA", "AE"], cmap="heat_vibrant")
        assert drawn["SR"] is CMAPS["heat_vibrant"]
        assert drawn["RESIDUALS"] is CMAPS["abs_color"]
        assert drawn["ABS_RESIDUALS"] is CMAPS["ae_color"]

    def test_wandb_plot_figure(self):
        fig = ImageContainer(_visuals()).make_wandb_plot()
        assert len(fig.axes) >= 3  # IT/SR/HR panels (+colorbars)

    def test_derived_interpolated_maps(self):
        """compute_residual_mask parity (visualization.py:43-50)."""
        c = ImageContainer(_visuals())
        for k in ("RESIDUALS", "RESIDUALS_INTERPOLATED", "ABS_RESIDUALS",
                  "ABS_INTERPOLATED"):
            assert k in c.visuals
        np.testing.assert_allclose(
            c.visuals["ABS_INTERPOLATED"],
            np.abs(c.visuals["INF"] - c.visuals["HR"]),
        )

    def test_reference_colormap_tables(self):
        """Exact color anchors of the reference's custom maps (:572-653)."""
        hv = CMAPS["heat_vibrant"]
        assert hv.N == 100
        np.testing.assert_allclose(hv(0.0)[:3], (0.5, 0.0, 0.5), atol=1e-6)  # purple
        np.testing.assert_allclose(hv(1.0)[:3], (1.0, 0.0, 0.0), atol=1e-6)  # red
        hm = CMAPS["heat_muted"]
        assert hm.N == 100
        np.testing.assert_allclose(hm(0.0)[:3], (0.75, 0.5, 0.75), atol=1e-6)
        ae = CMAPS["ae_color"]
        np.testing.assert_allclose(ae(0.5)[:3], matplotlib.colors.to_rgb("yellow"),
                                   atol=0.02)
        ab = CMAPS["abs_color"]
        np.testing.assert_allclose(ab(0.5)[:3], (1.0, 1.0, 1.0), atol=0.02)  # white @ 0
        # reference cmap-name aliases resolve to the same maps
        for alias, name in (("custom_heatmap_vibrant", "heat_vibrant"),
                            ("custom_ae", "ae_color"), ("custom", "abs_color")):
            assert CMAPS[alias] is CMAPS[name]
        # residual mask: white/gray/black with over/under extremes (:198)
        rm = CMAPS["residual_mask"]
        assert [matplotlib.colors.to_hex(c) for c in rm.colors] == \
               ["#ffffff", "#808080", "#000000"]

    def test_comparison_plot_products(self, tmp_path):
        """Every reference plot product writes a file (:311-555)."""
        c = ImageContainer(_visuals(), n_images=1)
        c.set_min_max(220.0, 315.0)
        outs = [
            c.save_it_sr_hr_plot(str(tmp_path / "it_sr_hr")),
            c.save_sr_hr_plot(str(tmp_path / "cmp")),
            c.save_sr_hr_abs_plot(str(tmp_path / "cmp")),
            c.save_tensor_it_sr_hr_plot(str(tmp_path / "tensors")),
            c.save_residual_mask(str(tmp_path / "mask")),
        ]
        for f in outs:
            assert os.path.isfile(f) and os.path.getsize(f) > 0, f

    def test_save_all_images_reference_type_names(self, tmp_path):
        """Reference image-type aliases (INTERPOLATED/DELTA/AE/AE_INTER)."""
        c = ImageContainer(_visuals(), n_images=1)
        files = c.save_all_images(
            str(tmp_path / "p"),
            image_types=["INTERPOLATED", "DELTA", "AE", "AE_INTER"],
        )
        assert len(files) == 4 and all(os.path.isfile(f) for f in files)


class TestWandbLoggerOptional:
    def test_noop_without_wandb(self):
        wl = WandbLogger({"wandb": {"project": "x", "entity": None}})
        assert not wl.enabled
        # all log methods must be safe no-ops
        wl.log_train_metrics({"l_pix": 1.0}, commit=False, step=1)
        wl.log_val_metrics({"RMSE": 2.0}, commit=False, step=1)
        wl.log_val_time(1.2, commit=False, step=1)
        wl.commit(step=1)

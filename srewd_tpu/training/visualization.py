"""ImageContainer — map renders of SR/HR/LR/error fields.

Reference: training/visualization.py (cartopy PlateCarree renders with
coastlines, custom colormaps, SR/HR/IT panels, residual/abs-error maps,
fixed [220, 315] K range option). cartopy is not in the baked environment,
so renders degrade gracefully: when cartopy is importable the maps are drawn
on a PlateCarree projection with coastlines; otherwise plain lat/lon imshow
panels with the same colormaps, ranges and products.

Colormap parity: the four custom maps replicate the reference's exact color
tables —
  heat_vibrant: 7 colors purple->red, N=100 (visualization.py:572-591)
  heat_muted:   7 desaturated colors, N=100 (:593-612)
  ae_color:     positioned darkblue->red absolute-error ramp (:614-629)
  abs_color:    positioned darkblue/lightblue/white/salmon/darkred diverging
                map anchored at -25/-5/0/5/25 of a [-25,25] range (:631-653)
  residual_mask: the white/gray/black ListedColormap with over/under
                extremes used for mask renders (cmap="binary" branch, :198)

Products (each a reference method): save_all_images (:106-165 semantics:
DELTA -> abs_color at the fixed [-25,25] norm; AE/AE_INTER -> ae_color at
[0,21] with the >21 red overlay), make_wandb_plot / save_it_sr_hr_plot
3-panel figure (:321-379), save_sr_hr_plot 2-panel at fixed 220-315 K with
9 levels (:381-443), save_sr_hr_abs_plot (:445-505), and
save_tensor_it_sr_hr_plot raw-tensor plates (:507-555). Derived error maps
mirror compute_residual_mask (:43-50): RESIDUALS, RESIDUALS_INTERPOLATED,
ABS_RESIDUALS, ABS_INTERPOLATED (aliases RESIDUAL / ABS_ERROR kept).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.colors import LinearSegmentedColormap, ListedColormap  # noqa: E402

try:  # optional dependency
    import cartopy.crs as ccrs

    _HAS_CARTOPY = True
except ImportError:  # pragma: no cover
    ccrs = None
    _HAS_CARTOPY = False


def _heat_vibrant():
    # reference visualization.py:579-591 — exact color list, N=100
    colors = [
        (0.5, 0, 0.5),  # purple
        (0, 0, 1),      # blue
        (0, 1, 1),      # cyan
        (0, 1, 0),      # green
        (1, 1, 0),      # yellow
        (1, 0.5, 0),    # orange
        (1, 0, 0),      # red
    ]
    return LinearSegmentedColormap.from_list("custom_heatmap_vibrant", colors, N=100)


def _heat_muted():
    # reference visualization.py:600-612
    colors = [
        (0.75, 0.5, 0.75),
        (0.5, 0.5, 1),
        (0.5, 1, 1),
        (0.5, 1, 0.5),
        (1, 1, 0.5),
        (1, 0.75, 0.5),
        (1, 0.5, 0.5),
    ]
    return LinearSegmentedColormap.from_list("heat_muted", colors, N=100)


def _ae_color():
    # reference visualization.py:620-629 (same table inlined at :485-494)
    colors = [
        (0.0, "darkblue"),
        (0.08, "blue"),
        (0.16, "cyan"),
        (0.3, "green"),
        (0.5, "yellow"),
        (1.0, "red"),
    ]
    return LinearSegmentedColormap.from_list("custom_ae", colors)


def _abs_color():
    # reference visualization.py:638-653 — diverging map with positions
    # derived from the fixed [-25, 25] range
    minimum, maximum = -25.0, 25.0
    zero = (0 - minimum) / (maximum - minimum)
    light_blue = (-5 - minimum) / (maximum - minimum)
    light_red = (5 - minimum) / (maximum - minimum)
    return LinearSegmentedColormap.from_list(
        "CustomMap",
        [
            (0.0, "darkblue"),
            (light_blue, "lightblue"),
            (zero, "white"),
            (light_red, "salmon"),
            (1.0, "darkred"),
        ],
    )


def _residual_mask_cmap():
    # reference 'binary' branch (visualization.py:198): white/gray/black with
    # over/under extremes for residual-sign mask renders
    return ListedColormap(["white", "gray", "black"]).with_extremes(
        over="0.25", under="0.75"
    )


_HV, _HM, _AE, _ABS, _RM = (
    _heat_vibrant(), _heat_muted(), _ae_color(), _abs_color(), _residual_mask_cmap()
)
CMAPS = {
    "heat_vibrant": _HV,
    "custom_heatmap_vibrant": _HV,  # reference cmap-name alias
    "heat_muted": _HM,
    "ae_color": _AE,
    "custom_ae": _AE,
    "abs_color": _ABS,
    "custom": _ABS,
    "residual_mask": _RM,
    "binary": _RM,
    "coolwarm": plt.get_cmap("coolwarm"),
    "plasma": plt.get_cmap("plasma"),
    "viridis": plt.get_cmap("viridis"),
    "gray": plt.get_cmap("gray"),
}

# DELTA uses abs_color with the fixed [-25, 25] normalization (:256-268);
# AE maps use ae_color over [0, 21] with a red >21 overlay (:240-254)
_DELTA_RANGE = (-25.0, 25.0)
_AE_RANGE = (0.0, 21.0)


class ImageContainer:
    """Holds a dict of NHWC field batches + geo metadata; renders products.

    visuals keys: SR, HR, LR, INF (interpolated); derived (reference
    compute_residual_mask, visualization.py:43-50): RESIDUALS (SR - HR),
    RESIDUALS_INTERPOLATED (INF - HR), ABS_RESIDUALS, ABS_INTERPOLATED.
    RESIDUAL / ABS_ERROR are kept as aliases of the first/third.
    """

    def __init__(self, visuals: dict, metadata: Optional[dict] = None, n_images: int = 1):
        self.visuals = {k: np.asarray(v) for k, v in visuals.items()}
        if "SR" in self.visuals and "HR" in self.visuals:
            res = self.visuals["SR"] - self.visuals["HR"]
            self.visuals["RESIDUALS"] = res
            self.visuals["ABS_RESIDUALS"] = np.abs(res)
            self.visuals["RESIDUAL"] = res
            self.visuals["ABS_ERROR"] = np.abs(res)
            if "INF" in self.visuals:
                res_i = self.visuals["INF"] - self.visuals["HR"]
                self.visuals["RESIDUALS_INTERPOLATED"] = res_i
                self.visuals["ABS_INTERPOLATED"] = np.abs(res_i)
        self.metadata = metadata or {}
        self.n_images = n_images
        self.vmin = None
        self.vmax = None

    def set_min_max(self, vmin: float, vmax: float) -> None:
        """Fixed colour range (sample.py uses [220, 315] K; train.py:178)."""
        self.vmin, self.vmax = vmin, vmax

    _RESIDUAL_KEYS = ("RESIDUAL", "RESIDUALS", "RESIDUALS_INTERPOLATED")
    _ABS_KEYS = ("ABS_ERROR", "ABS_RESIDUALS", "ABS_INTERPOLATED")

    def _range_for(self, key: str):
        if key in self._RESIDUAL_KEYS:
            m = float(np.abs(self.visuals[key]).max()) or 1.0
            return -m, m
        if key in self._ABS_KEYS:
            return 0.0, float(self.visuals[key].max()) or 1.0
        if self.vmin is not None:
            return self.vmin, self.vmax
        # shared range over all main fields
        vals = [v for k, v in self.visuals.items() if k in ("SR", "HR", "INF")]
        if not vals:
            vals = list(self.visuals.values())
        return float(min(v.min() for v in vals)), float(max(v.max() for v in vals))

    def _cmap_for(self, key: str, cmap_name: Optional[str]):
        if cmap_name is not None and cmap_name in CMAPS:
            return CMAPS[cmap_name]
        if key in self._RESIDUAL_KEYS:
            return CMAPS["abs_color"]  # the reference's diverging 'custom' map
        if key in self._ABS_KEYS:
            return CMAPS["ae_color"]
        return CMAPS["heat_vibrant"]

    def _draw(self, ax, field: np.ndarray, key: str, cmap_name=None,
              vrange=None, cmap=None):
        if vrange is None:
            vrange = self._range_for(key)
        vmin, vmax = vrange
        if cmap is None:
            cmap = self._cmap_for(key, cmap_name)
        kw = {"vmin": vmin, "vmax": vmax}
        lat = self.metadata.get("hr_lat")
        lon = self.metadata.get("hr_lon")
        if _HAS_CARTOPY and lat is not None and lon is not None:
            im = ax.imshow(
                field,
                origin="lower",
                extent=[float(lon.min()), float(lon.max()), float(lat.min()), float(lat.max())],
                transform=ccrs.PlateCarree(),
                cmap=cmap,
                **kw,
            )
            ax.coastlines()
        else:
            im = ax.imshow(field, origin="lower", cmap=cmap, **kw)
            ax.set_xticks([])
            ax.set_yticks([])
        return im

    def _subplot(self, n, figsize=None):
        figsize = figsize or (5 * n, 3)
        if _HAS_CARTOPY:
            return plt.subplots(
                1, n, figsize=figsize, subplot_kw={"projection": ccrs.PlateCarree()}
            )
        return plt.subplots(1, n, figsize=figsize)

    # ------------------------------------------------------------- 3-panel IT/SR/HR
    def make_wandb_plot(self, idx: int = 0, cmap: Optional[str] = None):
        """3-panel IT/SR/HR figure (visualization.py:321-379)."""
        keys = [k for k in ("INF", "SR", "HR") if k in self.visuals]
        fig, axes = self._subplot(len(keys))
        if len(keys) == 1:
            axes = [axes]
        titles = {
            "INF": "Upsampled with interpolation",
            "SR": "Super-resolution reconstruction",
            "HR": "High-resolution original",
        }
        # shared range over the three panels (reference :357-358)
        vmin = min(float(self.visuals[k][idx].min()) for k in keys)
        vmax = max(float(self.visuals[k][idx].max()) for k in keys)
        for ax, key in zip(np.ravel(axes), keys):
            im = self._draw(ax, self.visuals[key][idx, :, :, 0], key, cmap or "coolwarm",
                            vrange=(vmin, vmax))
            ax.set_title(titles[key])
            fig.colorbar(im, ax=ax, fraction=0.025)
        fig.tight_layout()
        return fig

    def save_it_sr_hr_plot(self, path: str, cmap: Optional[str] = None) -> str:
        """Save the 3-panel IT/SR/HR figure (visualization.py:311-318)."""
        fig = self.make_wandb_plot(cmap=cmap)
        out = path if path.endswith(".png") else path + ".png"
        fig.savefig(out, format="png", bbox_inches="tight")
        plt.close(fig)
        return out

    # --------------------------------------------------- 2-panel HR/SR comparison
    def save_sr_hr_plot(self, path: str, cmap: str = "coolwarm", idx: int = -1) -> str:
        """2-panel ground-truth vs reconstruction at the fixed 220-315 K range
        with 9 contour levels (visualization.py:381-443)."""
        vmin, vmax = 220.0, 315.0
        levels = np.linspace(vmin, vmax, 9)
        fig, axes = self._subplot(2, figsize=(11, 3))
        titles = ("High-resolution Ground truth", "Model reconstruction")
        for ax, key, title in zip(np.ravel(axes), ("HR", "SR"), titles):
            field = np.clip(self.visuals[key][idx, :, :, 0], vmin, vmax)
            # quantize to the reference's 9 contour levels
            field = levels[np.clip(np.digitize(field, levels) - 1, 0, len(levels) - 1)]
            im = self._draw(ax, field, key, cmap, vrange=(vmin, vmax))
            ax.set_title(title)
        fig.colorbar(im, ax=list(np.ravel(axes)), fraction=0.025,
                     ticks=np.round(levels, 1), orientation="horizontal")
        out = f"{path}_sr_hr_{cmap}.png"
        fig.savefig(out, bbox_inches="tight")
        plt.close(fig)
        return out

    def save_sr_hr_abs_plot(self, path: str, idx: int = -1) -> str:
        """2-panel interpolation vs model absolute error, ae_color at [0, 21]
        (visualization.py:445-505)."""
        fig, axes = self._subplot(2, figsize=(11, 3))
        titles = ("Bicubic interpolation Absolute Error", "Model Absolute Error")
        for ax, key, title in zip(
            np.ravel(axes), ("ABS_INTERPOLATED", "ABS_RESIDUALS"), titles
        ):
            im = self._draw(ax, self.visuals[key][idx, :, :, 0], key,
                            vrange=_AE_RANGE, cmap=CMAPS["ae_color"])
            ax.set_title(title)
        fig.colorbar(im, ax=list(np.ravel(axes)), fraction=0.025,
                     ticks=[0, 3, 6, 9, 12, 15, 18, 21], orientation="horizontal")
        out = f"{path}_sr_hr_abs.png"
        fig.savefig(out, bbox_inches="tight")
        plt.close(fig)
        return out

    def save_tensor_it_sr_hr_plot(self, path: str, idx: int = -1) -> str:
        """Raw-tensor 3-panel plates, shared range, gray colormap
        (visualization.py:507-555)."""
        keys = [k for k in ("INF", "SR", "HR") if k in self.visuals]
        titles = {"INF": "Tensor INTERPOLATED", "SR": "Tensor SR", "HR": "Tensor HR"}
        vmin = min(float(self.visuals[k][idx].min()) for k in keys)
        vmax = max(float(self.visuals[k][idx].max()) for k in keys)
        fig, axes = plt.subplots(1, len(keys), figsize=(5 * len(keys), 3))
        for ax, key in zip(np.ravel([axes]), keys):
            p = ax.imshow(self.visuals[key][idx, :, :, 0], cmap="gray",
                          vmin=vmin, vmax=vmax)
            ax.set_title(titles[key])
            ax.grid(False)
        fig.colorbar(p, ax=list(np.ravel([axes])), fraction=0.025)
        out = path if path.endswith(".png") else path + ".png"
        fig.savefig(out, format="png", bbox_inches="tight")
        plt.close(fig)
        return out

    # ------------------------------------------------------------ residual mask
    def save_residual_mask(self, path: str, threshold: float = 1.0, idx: int = 0) -> str:
        """Sign-of-residual mask in the reference's white/gray/black 'binary'
        colormap (visualization.py:196-201): -1 where SR underestimates by
        more than `threshold`, +1 where it overestimates, 0 otherwise."""
        res = self.visuals["RESIDUALS"][idx, :, :, 0]
        mask = np.zeros_like(res)
        mask[res > threshold] = 1.0
        mask[res < -threshold] = -1.0
        fig, ax = self._subplot(1)
        ax0 = np.ravel([ax])[0]
        im = self._draw(ax0, mask, "RESIDUALS", cmap=CMAPS["residual_mask"],
                        vrange=(-1.0, 1.0))
        fig.colorbar(im, ax=ax0, fraction=0.025, boundaries=[-1, -0.33, 0.33, 1],
                     ticks=[-1, 0, 1])
        out = f"{path}_residual_mask.png"
        fig.savefig(out, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return out

    # ------------------------------------------------------------- per-type maps
    def save_all_images(
        self, path_prefix: str, image_types=None, cmap: Optional[str] = None
    ) -> list[str]:
        """Per-type map renders (visualization.py:106-165). Returns file paths.

        Reference range semantics per type: main fields share [min, max] (or
        the fixed set_min_max range); DELTA/RESIDUALS use abs_color with the
        fixed [-25, 25] normalization; ABS maps use ae_color over [0, 21]."""
        os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
        image_types = image_types or [
            k for k in self.visuals if k not in ("LR", "RESIDUAL", "ABS_ERROR")
        ]
        aliases = {"INTERPOLATED": "INF", "DELTA": "RESIDUALS",
                   "AE": "ABS_RESIDUALS", "AE_INTER": "ABS_INTERPOLATED"}
        saved = []
        for name in image_types:
            key = aliases.get(name, name)
            if key not in self.visuals:
                continue
            if key in self._RESIDUAL_KEYS:
                vrange, use_cmap = _DELTA_RANGE, CMAPS["abs_color"]
            elif key in self._ABS_KEYS:
                vrange, use_cmap = _AE_RANGE, CMAPS["ae_color"]
            else:
                vrange, use_cmap = None, None
            for idx in range(min(self.n_images, self.visuals[key].shape[0])):
                fig, ax = self._subplot(1)
                ax0 = np.ravel([ax])[0]
                # the caller cmap applies only to the main fields — DELTA/AE
                # keys ALWAYS use the fixed custom/custom_ae maps (reference
                # visualization.py:136-165 applies cmap_list to HR/SR/LR/
                # INTERPOLATED only)
                im = self._draw(ax0, self.visuals[key][idx, :, :, 0], key,
                                None if use_cmap is not None else cmap,
                                vrange=vrange, cmap=use_cmap)
                fig.colorbar(im, ax=ax0, fraction=0.025)
                out = f"{path_prefix}_{name}_{idx}.png"
                fig.savefig(out, dpi=110, bbox_inches="tight")
                plt.close(fig)
                saved.append(out)
        return saved

"""ImageContainer — map renders of SR/HR/LR/error fields.

Reference: training/visualization.py (cartopy PlateCarree renders with
coastlines, custom colormaps, SR/HR/IT panels, residual/abs-error maps,
fixed [220, 315] K range option). cartopy is not in the baked environment,
so renders degrade gracefully: when cartopy is importable the maps are drawn
on a PlateCarree projection with coastlines; otherwise plain lat/lon imshow
panels with the same colormaps, ranges and products. The custom colormaps
(heat_vibrant, heat_muted, ae_color, abs_color; visualization.py:557-653)
are reproduced as matplotlib LinearSegmentedColormaps.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.colors import LinearSegmentedColormap  # noqa: E402

try:  # optional dependency
    import cartopy.crs as ccrs

    _HAS_CARTOPY = True
except ImportError:  # pragma: no cover
    ccrs = None
    _HAS_CARTOPY = False


CMAPS = {
    "heat_vibrant": LinearSegmentedColormap.from_list(
        "heat_vibrant",
        ["#2c7bb6", "#abd9e9", "#ffffbf", "#fdae61", "#d7191c"],
    ),
    "heat_muted": LinearSegmentedColormap.from_list(
        "heat_muted",
        ["#4575b4", "#91bfdb", "#e0f3f8", "#fee090", "#fc8d59", "#d73027"],
    ),
    "ae_color": LinearSegmentedColormap.from_list(
        "ae_color", ["#313695", "#ffffff", "#a50026"]
    ),
    "abs_color": LinearSegmentedColormap.from_list(
        "abs_color", ["#ffffff", "#fdae61", "#a50026"]
    ),
    "plasma": plt.get_cmap("plasma"),
    "viridis": plt.get_cmap("viridis"),
}


class ImageContainer:
    """Holds a dict of NHWC field batches + geo metadata; renders products.

    visuals keys: SR, HR, LR, INF (interpolated); derived: RESIDUAL
    (SR - HR), ABS_ERROR (|SR - HR|) — visualization.py:43-50.
    """

    def __init__(self, visuals: dict, metadata: Optional[dict] = None, n_images: int = 1):
        self.visuals = {k: np.asarray(v) for k, v in visuals.items()}
        if "SR" in self.visuals and "HR" in self.visuals:
            self.visuals["RESIDUAL"] = self.visuals["SR"] - self.visuals["HR"]
            self.visuals["ABS_ERROR"] = np.abs(self.visuals["RESIDUAL"])
        self.metadata = metadata or {}
        self.n_images = n_images
        self.vmin = None
        self.vmax = None

    def set_min_max(self, vmin: float, vmax: float) -> None:
        """Fixed colour range (sample.py uses [220, 315] K; train.py:178)."""
        self.vmin, self.vmax = vmin, vmax

    def _range_for(self, key: str):
        if key in ("RESIDUAL",):
            m = float(np.abs(self.visuals[key]).max()) or 1.0
            return -m, m
        if key in ("ABS_ERROR",):
            return 0.0, float(self.visuals[key].max()) or 1.0
        if self.vmin is not None:
            return self.vmin, self.vmax
        # shared range over all main fields
        vals = [v for k, v in self.visuals.items() if k in ("SR", "HR", "INF")]
        if not vals:
            vals = list(self.visuals.values())
        return float(min(v.min() for v in vals)), float(max(v.max() for v in vals))

    def _cmap_for(self, key: str, cmap_name: Optional[str]):
        if key == "RESIDUAL":
            return CMAPS["ae_color"]
        if key == "ABS_ERROR":
            return CMAPS["abs_color"]
        return CMAPS.get(cmap_name or "heat_vibrant", CMAPS["heat_vibrant"])

    def _draw(self, ax, field: np.ndarray, key: str, cmap_name=None):
        vmin, vmax = self._range_for(key)
        cmap = self._cmap_for(key, cmap_name)
        lat = self.metadata.get("hr_lat")
        lon = self.metadata.get("hr_lon")
        if _HAS_CARTOPY and lat is not None and lon is not None:
            im = ax.imshow(
                field,
                origin="lower",
                extent=[float(lon.min()), float(lon.max()), float(lat.min()), float(lat.max())],
                transform=ccrs.PlateCarree(),
                cmap=cmap,
                vmin=vmin,
                vmax=vmax,
            )
            ax.coastlines()
        else:
            im = ax.imshow(field, origin="lower", cmap=cmap, vmin=vmin, vmax=vmax)
            ax.set_xticks([])
            ax.set_yticks([])
        return im

    def _subplot(self, n):
        if _HAS_CARTOPY:
            return plt.subplots(
                1, n, figsize=(5 * n, 3), subplot_kw={"projection": ccrs.PlateCarree()}
            )
        return plt.subplots(1, n, figsize=(5 * n, 3))

    def make_wandb_plot(self, idx: int = 0, cmap: Optional[str] = None):
        """3-panel IT/SR/HR figure (visualization.py:321-379)."""
        keys = [k for k in ("INF", "SR", "HR") if k in self.visuals]
        fig, axes = self._subplot(len(keys))
        if len(keys) == 1:
            axes = [axes]
        for ax, key in zip(np.ravel(axes), keys):
            im = self._draw(ax, self.visuals[key][idx, :, :, 0], key, cmap)
            ax.set_title({"INF": "Interpolated", "SR": "Super-resolved", "HR": "Target"}[key])
            fig.colorbar(im, ax=ax, fraction=0.025)
        fig.tight_layout()
        return fig

    def save_all_images(
        self, path_prefix: str, image_types=None, cmap: Optional[str] = None
    ) -> list[str]:
        """Per-type map renders (visualization.py:106-165). Returns file paths."""
        os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
        image_types = image_types or [k for k in self.visuals if k != "LR"]
        saved = []
        for key in image_types:
            if key not in self.visuals:
                continue
            for idx in range(min(self.n_images, self.visuals[key].shape[0])):
                fig, ax = self._subplot(1)
                im = self._draw(np.ravel([ax])[0], self.visuals[key][idx, :, :, 0], key, cmap)
                fig.colorbar(im, ax=np.ravel([ax])[0], fraction=0.025)
                out = f"{path_prefix}_{key}_{idx}.png"
                fig.savefig(out, dpi=110, bbox_inches="tight")
                plt.close(fig)
                saved.append(out)
        return saved

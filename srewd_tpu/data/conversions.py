"""Offline NetCDF -> per-hour .npy conversion (xarray-gated).

Reference: data/conversions/netcdf_to_npy.py. Two fixes over the reference:
  * the reference iterates `batches[0:1]` and silently converts only the
    FIRST batch of timestamps (netcdf_to_npy.py:222) — here all batches are
    written;
  * constant (time-invariant) variables are written alongside time-variate
    ones in one pass.

The reference's LMDB converter (netcdf_to_lmdb.py) is a dead end — nothing
in the codebase ever reads LMDB back (SURVEY.md §2.3) — so it is
intentionally not reproduced.

xarray is not part of the baked environment; the import is deferred so the
rest of the data layer never depends on it.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .store import CONSTANT_FILE, META_DIR, META_FILE, SAMPLES_DIR
from .timeindex import format_date, parse_date


def netcdf_to_npy(
    source: str | list[str], target_dir: str, batch_size: int = 1024
) -> None:
    """Explode NetCDF dataset(s) into the WeatherStore on-disk layout."""
    try:
        import xarray as xr
    except ImportError as e:  # pragma: no cover
        raise ImportError("netcdf_to_npy requires xarray (not in this environment)") from e

    ds = xr.open_mfdataset(source) if isinstance(source, (list, tuple)) else xr.open_dataset(source)
    os.makedirs(target_dir, exist_ok=True)
    for var_name in ds.data_vars:
        var = ds[var_name]
        base = os.path.join(target_dir, str(var_name))
        os.makedirs(os.path.join(base, META_DIR), exist_ok=True)
        samples = os.path.join(base, SAMPLES_DIR)
        os.makedirs(samples, exist_ok=True)

        meta = {
            "name": str(var_name),
            "time_variate": "time" in var.dims,
            "dims": [d for d in var.dims if d != "time"],
            "shape": [
                int(n) for d, n in zip(var.dims, var.shape) if d != "time"
            ],
            "coords": [
                {
                    "name": str(k),
                    "values": np.asarray(ds.coords[k].values).tolist(),
                    "dims": [str(d) for d in ds.coords[k].dims],
                }
                for k in ds.coords
                if k != "time"
            ],
            "attrs": {**{k: str(v) for k, v in ds.attrs.items()},
                      **{k: str(v) for k, v in var.attrs.items()}},
        }
        with open(os.path.join(base, META_DIR, META_FILE), "w") as f:
            json.dump(meta, f)

        if "time" not in var.dims:
            np.save(os.path.join(samples, CONSTANT_FILE), var.values)
            continue

        stamps = var["time"].values
        t_axis = tuple(var.dims).index("time")
        n = len(stamps)
        for lo in range(0, n, batch_size):  # ALL batches (reference bug fixed)
            chunk_ts = stamps[lo : lo + batch_size]
            chunk = var.isel(time=slice(lo, lo + len(chunk_ts))).values
            for i, ts in enumerate(chunk_ts):
                ts = parse_date(ts)
                year_dir = os.path.join(samples, str(ts.item().year))
                os.makedirs(year_dir, exist_ok=True)
                np.save(
                    os.path.join(year_dir, format_date(ts) + ".npy"),
                    np.take(chunk, i, axis=t_axis),
                )

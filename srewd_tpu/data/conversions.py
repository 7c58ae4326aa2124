"""Offline NetCDF -> per-hour .npy conversion (xarray-gated).

Reference: data/conversions/netcdf_to_npy.py. Two fixes over the reference:
  * the reference iterates `batches[0:1]` and silently converts only the
    FIRST batch of timestamps (netcdf_to_npy.py:222) — here all batches are
    written;
  * constant (time-invariant) variables are written alongside time-variate
    ones in one pass.

`netcdf_to_lmdb` reproduces the reference's LMDB exporter
(data/conversions/netcdf_to_lmdb.py:58-88: one timestamp-keyed record per
time step, key = strftime of the data-config datetime format, value = the
raw array bytes) — note that, as in the reference, nothing reads LMDB back
(SURVEY.md §2.3 calls it a dead end); it exists for export parity only.

xarray and lmdb are not part of the baked environment; the imports are
deferred so the rest of the data layer never depends on them.
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


def netcdf_to_lmdb(
    source: str | list[str],
    target_dir: str,
    map_size: float = 1e12,
    batch_size: int = 1024,
) -> int:
    """Export NetCDF dataset(s) into a timestamp-keyed LMDB database.

    Record semantics match the reference exporter exactly
    (netcdf_to_lmdb.py:70-88): for every time-variate variable, one record
    per time step with key = UTC timestamp formatted as the data-config
    datetime format (`%Y-%m-%d-%H`), value = the raw `tobytes()` of the
    per-step array. Time-invariant variables are skipped, as the reference's
    `if "time" in var_data.dims` does. Returns the record count.

    Improvements over the reference: steps stream in `batch_size` chunks
    instead of one `.sel()` per timestamp (one dask materialization per
    chunk), and duplicate keys across variables raise instead of silently
    overwriting (the reference keys records by timestamp ONLY, so a second
    variable clobbers the first — documented quirk, made loud here).
    """
    try:
        import lmdb
    except ImportError as e:  # pragma: no cover
        raise ImportError("netcdf_to_lmdb requires lmdb (not in this environment)") from e
    try:
        import xarray as xr
    except ImportError as e:  # pragma: no cover
        raise ImportError("netcdf_to_lmdb requires xarray (not in this environment)") from e

    ds = xr.open_mfdataset(source) if isinstance(source, (list, tuple)) else xr.open_dataset(source)
    env = lmdb.open(target_dir, map_size=int(map_size), writemap=True)
    written = 0
    try:
        for var_name in ds.data_vars:
            var = ds[var_name]
            if "time" not in var.dims:
                continue
            stamps = var["time"].values
            t_axis = tuple(var.dims).index("time")
            for lo in range(0, len(stamps), batch_size):
                chunk_ts = stamps[lo : lo + batch_size]
                chunk = np.asarray(
                    var.isel(time=slice(lo, lo + len(chunk_ts))).values
                )
                # one write txn per chunk: bounds dirty-page growth for
                # large exports (the reference commits per batch too,
                # netcdf_to_lmdb.py:66-84); duplicate detection still spans
                # the whole export since committed keys persist in the db
                with env.begin(write=True) as txn:
                    for i, ts in enumerate(chunk_ts):
                        key = format_date(parse_date(ts)).encode("utf-8")
                        if not txn.put(
                            key, np.take(chunk, i, axis=t_axis).tobytes(),
                            overwrite=False,
                        ):
                            raise ValueError(
                                f"duplicate LMDB key {key!r} (variable {var_name}): "
                                "the reference's timestamp-only keying overwrites "
                                "earlier variables; export one variable per database"
                            )
                        written += 1
    finally:
        env.close()
    return written

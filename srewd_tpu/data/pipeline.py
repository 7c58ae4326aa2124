"""DataHandler — fitting, batching and date lookup for train/val.

Replaces the reference's DataHandler + WeatherBenchData + DataLoader stack
(data/dataset_builder.py, SURVEY.md §2.3). Batch contract (NHWC):

    {"HR": [B,H,W,C_total], "LR": [B,h,w,C_total], "months": int32 [B]}

with variables concatenated channel-wise in config order (matching
_form_batch, dataset_builder.py:344-382). The bicubic x4 "SR" slot is NOT
produced on the host: it is computed on-device inside the jitted step
(ops.resize.bicubic_up4) — the reference does it per batch on CPU inside
collate (dataset_builder.py:374-380).

Fitting: per (variable x lr/hr x month-group) global/local standard scaling
on the train range only, disk-cached (scalers.py). Validation reuses the
fitted train transforms (dataset_builder.py:249-254).

Multi-host SPMD: `shard(process_index, process_count)` restricts each host
to a disjoint stride of the sample index, so per-host batches compose into
one global batch under a data-parallel mesh.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from .scalers import MonthlyScalerSet, fit_monthly_scalers
from .store import WeatherStore
from .timeindex import months_of, parse_date, select_months, union_hourly_ranges

_TYPES = ("lr", "hr")


def _concat_scalers(sets: list[MonthlyScalerSet]) -> MonthlyScalerSet:
    """Channel-concat per-variable scaler sets into one set for the batch."""
    if all(s.identity for s in sets):
        return MonthlyScalerSet.identity_set()
    kinds = {s.kind for s in sets}
    if len(kinds) != 1:
        raise ValueError(f"mixed scaler kinds across variables: {kinds}")
    mean = np.concatenate([s.mean for s in sets], axis=-1)
    std = np.concatenate([s.std for s in sets], axis=-1)
    return MonthlyScalerSet(mean, std, sets[0].kind)


@dataclass
class DataHandler:
    dataroot: str
    variables: list
    months_subset: list | None = None
    groups: list | None = None
    transformation: str = "GlobalStandardScaling"
    train_min_date: str | None = None
    train_max_date: str | None = None
    val_min_date: str | None = None
    val_max_date: str | None = None
    # extra (min, max) date-range pairs unioned into the index — the
    # reference's add_data_by_date disjoint-range merging (datasets.py:
    # 210-255), exposed as config keys data.train_date_ranges /
    # data.val_date_ranges. Extra train ranges also feed scaler fitting.
    train_date_ranges: list | None = None
    val_date_ranges: list | None = None
    train_batch_size: int = 4
    val_batch_size: int = 8
    shuffle: bool = True
    # forecasting offsets (TimeVariateData lead_time/delays, datasets.py:121-132;
    # the reference's builder always passes lead_time=0 and no delays)
    lead_time: int = 0  # hours added to every read timestamp
    delays: list | None = None  # extra per-sample time offsets, channel-concat
    storage_root: str | None = None
    read_threads: int = 16
    seed: int = 0
    process_index: int = 0
    process_count: int = 1

    stores: dict = field(default_factory=dict, init=False)
    scalers: dict = field(default_factory=dict, init=False)  # (var, type) -> set
    batch_scalers: dict = field(default_factory=dict, init=False)  # type -> set
    metadata: dict = field(default_factory=dict, init=False)
    train_timestamps: np.ndarray | None = field(default=None, init=False)
    val_timestamps: np.ndarray | None = field(default=None, init=False)

    def __post_init__(self):
        if self.groups is None:
            self.groups = [list(range(1, 13))]
        if self.delays is not None:
            d = [int(x) for x in self.delays]
            if 0 not in d:  # reference prepends 0 (datasets.py:126-128)
                d = [0] + d
            if len(d) != len(set(d)):
                raise ValueError("delays must be unique")
            self.delays = d
        for var in self.variables:
            self.stores[var] = {
                t: WeatherStore(os.path.join(self.dataroot, t, var)) for t in _TYPES
            }

    # ------------------------------------------------------------------ setup
    def process_data(self) -> "DataHandler":
        cache_dir = (
            os.path.join(self.storage_root, "scaler_cache") if self.storage_root else None
        )
        for var in self.variables:
            for t in _TYPES:
                store = self.stores[var][t]
                self.scalers[(var, t)] = fit_monthly_scalers(
                    store,
                    self.train_min_date,
                    self.train_max_date,
                    self.months_subset,
                    self.groups,
                    kind=self.transformation,
                    cache_dir=cache_dir,
                    extra_ranges=self.train_date_ranges,
                )
                for coord in ("lat", "lon"):
                    vals = store.coord_values(coord)
                    if vals is not None:
                        self.metadata[f"{t}_{coord}"] = vals
        for t in _TYPES:
            self.batch_scalers[t] = _concat_scalers(
                [self.scalers[(v, t)] for v in self.variables]
            )
        self.train_timestamps = self._index(
            self.train_min_date, self.train_max_date, self.train_date_ranges
        )
        self.val_timestamps = self._index(
            self.val_min_date, self.val_max_date, self.val_date_ranges
        )
        return self

    def _index(self, min_date, max_date, extra_ranges=None) -> np.ndarray | None:
        spans = []
        if min_date is not None and max_date is not None:
            spans.append((min_date, max_date))
        spans.extend(tuple(r) for r in (extra_ranges or []))
        if not spans:
            return None
        ts = select_months(union_hourly_ranges(spans), self.months_subset)
        # intersect with every store's available range, shifted so that every
        # lead/delay offset stays readable (datasets.py:176-177)
        offs = [self.lead_time + d for d in (self.delays or [0])]
        lo_off, hi_off = min(offs + [0]), max(offs + [0])
        for var in self.variables:
            for t in _TYPES:
                st = self.stores[var][t]
                if not st.time_variate:
                    # Constant fields (reference ConstantData, datasets.py:468-623)
                    # are valid at every timestamp: no range restriction.
                    continue
                ts = ts[
                    (ts + np.timedelta64(lo_off, "h") >= st.timestamps[0])
                    & (ts + np.timedelta64(hi_off, "h") <= st.timestamps[-1])
                ]
        if self.process_count > 1:
            ts = ts[self.process_index :: self.process_count]
        return ts

    # ---------------------------------------------------------------- batches
    def assemble(self, ts_batch: np.ndarray, normalized: bool = True) -> dict:
        """Read + normalize one batch of timestamps.

        Normalization semantics with lead_time/delays (intended reference
        parity): every offset slice is scaled with the BASE timestamp's month
        scaler — the reference's TimeVariateData also keys its transform on
        the base sample's month, not the offset read's (datasets.py:297-309),
        so a delayed channel crossing a transform-group boundary uses the
        base group's statistics on both sides.
        """
        months = months_of(ts_batch)  # month of the BASE timestamp (datasets.py:297)
        out = {"months": months.astype(np.int32)}
        offsets = [self.lead_time + d for d in (self.delays or [0])]
        for t, key in (("hr", "HR"), ("lr", "LR")):
            per_off = []
            for off in offsets:
                ts_off = ts_batch + np.timedelta64(off, "h") if off else ts_batch
                per_var = [
                    self.stores[v][t].read_many(ts_off, self.read_threads)
                    for v in self.variables
                ]
                batch = (
                    per_var[0] if len(per_var) == 1 else np.concatenate(per_var, axis=-1)
                )
                if normalized:
                    batch = self.batch_scalers[t].transform(batch, months)
                per_off.append(batch)
            batch = per_off[0] if len(per_off) == 1 else np.concatenate(per_off, axis=-1)
            out[key] = batch.astype(np.float32)
        return out

    def _batches(self, ts: np.ndarray, batch_size: int, shuffle: bool, epoch: int):
        n = (len(ts) // batch_size) * batch_size  # drop_last=True (reference)
        if n == 0:
            return
        order = np.arange(len(ts))
        if shuffle:
            np.random.default_rng(self.seed + 7919 * epoch).shuffle(order)
        for lo in range(0, n, batch_size):
            yield self.assemble(ts[order[lo : lo + batch_size]])

    def train_batches(self, epoch: int = 0):
        yield from self._batches(
            self.train_timestamps, self.train_batch_size, self.shuffle, epoch
        )

    def val_batches(self):
        yield from self._batches(self.val_timestamps, self.val_batch_size, False, 0)

    def steps_per_epoch(self, split: str = "train") -> int:
        ts = self.train_timestamps if split == "train" else self.val_timestamps
        bs = self.train_batch_size if split == "train" else self.val_batch_size
        return len(ts) // bs

    def get_data_by_date(self, date) -> dict:
        """Single-sample batch for an explicit date (sample.py CLI path)."""
        ts = np.array([parse_date(date)], dtype="datetime64[h]")
        return self.assemble(ts)

    # ---------------------------------------------------------------- inverse
    def inverse_transform(self, data: dict, months) -> dict:
        """De-normalize a dict of batches to physical units (Kelvin).

        Keys named 'LR' use the lr scalers; every other key (HR, SR, INF,
        INTERPOLATED, ...) uses hr scalers (transforms.py:81-96).
        """
        months = np.asarray(months, np.int32)
        out = {}
        for key, val in data.items():
            t = "lr" if key == "LR" else "hr"
            out[key] = self.batch_scalers[t].inverse(val, months)
        return out

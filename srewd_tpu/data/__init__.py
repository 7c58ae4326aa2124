"""WeatherBench data layer: npy store, date indexing, scalers, input pipeline.

Replaces the reference's torch Dataset/DataLoader stack (SURVEY.md §2.3) with
a vectorized numpy host pipeline feeding device-resident jitted steps:
  store.py     — WNPYReader equivalent + synthetic data generator
  timeindex.py — np.datetime64 date math (ranges, month subsets)
  scalers.py   — Identity/Global/Local standard scaling with exact
                 Welford-style streaming merge, month-group fitting, caching
  pipeline.py  — DataHandler: fitting, batching, prefetch, date lookup
  conversions.py — offline NetCDF -> npy converter (xarray-gated)
"""

from .store import WeatherStore, make_synthetic_weatherbench
from .timeindex import (
    DATETIME_FORMAT,
    format_date,
    hourly_range,
    months_of,
    parse_date,
    select_months,
)
from .scalers import MonthlyScalerSet, fit_monthly_scalers
from .pipeline import DataHandler

__all__ = [
    "WeatherStore",
    "make_synthetic_weatherbench",
    "DATETIME_FORMAT",
    "parse_date",
    "format_date",
    "hourly_range",
    "months_of",
    "select_months",
    "MonthlyScalerSet",
    "fit_monthly_scalers",
    "DataHandler",
]

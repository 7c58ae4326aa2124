"""Deterministic seeding (reference: training/utils.py:39-51, default seed 0).

JAX PRNG is explicit (keys threaded through the trainer); this seeds the
host-side numpy/python RNGs used by the data pipeline shuffle.
"""

from __future__ import annotations

import random

import numpy as np


def set_seeds(seed: int = 0) -> None:
    random.seed(seed)
    np.random.seed(seed)

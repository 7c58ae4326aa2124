"""Optimizer registry (optax), mirroring training/utils.py:6-33.

Deviation (documented): the reference maps "sgd" -> torch.optim.RMSprop and
"asgd" -> torch.optim.Rprop — evident bugs. Here every name maps to the
optimizer it names; the reference's two aliases are preserved with their
*intended* semantics ("sgd" -> SGD, "asgd" -> SGD) and "rmsprop"/"rprop" are
available explicitly. torch.optim.Adam(amsgrad) used by pretrain.py:224-226
is exposed via "amsgrad".
"""

from __future__ import annotations

import optax


def get_optimizer(name: str, lr: float, **kwargs) -> optax.GradientTransformation:
    name = (name or "adam").lower()
    table = {
        "adam": lambda: optax.adam(lr, **kwargs),
        "amsgrad": lambda: optax.amsgrad(lr, **kwargs),
        "adamw": lambda: optax.adamw(lr, **kwargs),
        "sgd": lambda: optax.sgd(lr, **kwargs),
        "asgd": lambda: optax.sgd(lr, **kwargs),
        "rmsprop": lambda: optax.rmsprop(lr, **kwargs),
        "adadelta": lambda: optax.adadelta(lr, **kwargs),
        "adagrad": lambda: optax.adagrad(lr, **kwargs),
        "adamax": lambda: optax.adamax(lr, **kwargs),
        "lamb": lambda: optax.lamb(lr, **kwargs),
        "lion": lambda: optax.lion(lr, **kwargs),
    }
    if name not in table:
        raise ValueError(f"unknown optimizer {name}; options: {sorted(table)}")
    return table[name]()

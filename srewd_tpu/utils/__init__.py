"""Utilities: logging, seeding, wandb."""

from .logging import setup_logger
from .seeding import set_seeds

__all__ = ["setup_logger", "set_seeds"]

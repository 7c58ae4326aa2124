"""Production serving layer (beyond the reference, which stops at a
one-shot sample.py CLI): a persistent batched sampler service plus a
minimal HTTP front-end (scripts/serve.py)."""

from .export import export_sampler, load_sampler, save_sampler
from .service import SamplerService

__all__ = ["SamplerService", "export_sampler", "load_sampler", "save_sampler"]

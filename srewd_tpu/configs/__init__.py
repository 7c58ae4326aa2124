"""Config system: commented-JSON experiment configs + experiment scaffolding."""

from .config import Config, DataConfig, load_commented_json, dict2str

__all__ = ["Config", "DataConfig", "load_commented_json", "dict2str"]

"""Core: typed config, PRNG streams."""

from .config import Config, apply_overrides, load_config, save_config

__all__ = ["Config", "load_config", "apply_overrides", "save_config"]

from real3dportrait_tpu.config.config import (
    FrozenConfig,
    load_config,
    parse_overrides,
)

__all__ = ["FrozenConfig", "load_config", "parse_overrides"]

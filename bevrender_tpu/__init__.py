"""bevrender_tpu: TPU-native BEV rendering + cross-view registration.

See README.md; reference parity notes cite rpl-cmu/bevrender as file:line.
"""

from bevrender_tpu.config import Config, ModelConfig, DataConfig, TrainConfig, flagship_config

__all__ = [
    "Config",
    "ModelConfig",
    "DataConfig",
    "TrainConfig",
    "flagship_config",
]
__version__ = "0.1.0"

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
    "BEVRenderModel",
    "Trainer",
    "RegistrationPipeline",
]
__version__ = "0.1.0"

_LAZY = {
    # heavy imports (flax/optax/data stack) load on first attribute access
    "BEVRenderModel": ("bevrender_tpu.models.bevrender", "BEVRenderModel"),
    "Trainer": ("bevrender_tpu.training.trainer", "Trainer"),
    "RegistrationPipeline": (
        "bevrender_tpu.inference.register", "RegistrationPipeline",
    ),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'bevrender_tpu' has no attribute {name!r}")

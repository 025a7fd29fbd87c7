"""Config tree: dataclasses + JSON dump + protocol presets."""

from adunet.configs.config import (
    SRTrainConfig,
    SegTrainConfig,
    ProtocolConfig,
    PROTOCOLS,
    config_to_json,
)

__all__ = [
    "SRTrainConfig",
    "SegTrainConfig",
    "ProtocolConfig",
    "PROTOCOLS",
    "config_to_json",
]

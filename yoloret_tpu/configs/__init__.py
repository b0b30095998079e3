from yoloret_tpu.configs.config import (
    BACKBONE,
    BOX_LOSS,
    DATASET_MODE,
    MODE,
    OPT,
    RunConfig,
    load_config,
)

__all__ = [
    "BACKBONE",
    "BOX_LOSS",
    "DATASET_MODE",
    "MODE",
    "OPT",
    "RunConfig",
    "load_config",
]

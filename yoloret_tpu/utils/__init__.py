from yoloret_tpu.utils.checkpoint import CheckpointManager, load_params, save_params

__all__ = ["CheckpointManager", "load_params", "save_params"]

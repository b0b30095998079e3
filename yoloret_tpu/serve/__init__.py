from yoloret_tpu.serve.server import DetectionServer

__all__ = ["DetectionServer"]

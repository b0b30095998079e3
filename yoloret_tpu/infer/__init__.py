from yoloret_tpu.infer.predictor import Detection, Predictor, draw_detections

__all__ = ["Detection", "Predictor", "draw_detections"]

from yoloret_tpu.eval.map import MAPEvaluator, evaluate_map, voc_ap

__all__ = ["MAPEvaluator", "evaluate_map", "voc_ap"]

from .voc_eval import voc_ap, voc_eval_class, evaluate_detections

__all__ = ["voc_ap", "voc_eval_class", "evaluate_detections"]

"""Evaluators: COCO mAP, instance seg, MOT (ByteTrack/QDTrack/MOTS), BDD,
VOC; CLEAR-MOT metrics; RLE codec."""
from .coco_evaluator import COCOEvaluator
from .coco_inst_evaluator import COCOInstEvaluator
from .mot_evaluator import MOTEvaluator
from .bdd_evaluator import BDDEvaluator
from .voc_evaluator import VOCEvaluator
from .coco_map import COCOMeanAP
from .mot_metrics import MOTAccumulator, aggregate_metrics

__all__ = ["COCOEvaluator", "COCOInstEvaluator", "MOTEvaluator",
           "BDDEvaluator", "VOCEvaluator", "COCOMeanAP", "MOTAccumulator",
           "aggregate_metrics"]

from . import rle
from .coco_eval import evaluate_coco_map, precision_at_k_and_iou
from .davis import (
    db_eval_boundary,
    db_eval_iou,
    db_statistics,
    evaluate_sequences,
    evaluate_unsupervised,
)

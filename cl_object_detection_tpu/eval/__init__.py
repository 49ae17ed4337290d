from .coco_eval import CocoProtocolEval, EvalResult

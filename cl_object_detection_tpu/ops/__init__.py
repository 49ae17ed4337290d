from .anchors import anchors_for_shape, generate_base_anchors, num_anchors_for_shape
from .boxes import pairwise_iou, encode_boxes, decode_boxes, clip_boxes
from .focal_loss import focal_loss, FocalLossOutput
from .nms import batched_nms, nms_iterative, nms_padded, top_k_detections

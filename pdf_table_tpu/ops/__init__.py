from .image import (
    resize_bilinear,
    resize_pad_normalize,
    batch_resize_pad_normalize,
    normalize_image,
)
from .warp import (
    perspective_matrices,
    warp_perspective_batch,
    order_points_clockwise,
    crop_rotated_boxes,
)
from .ctc import ctc_greedy_decode
from .nms import hard_nms, nms_mask
from .centernet import topk_scores, gather_feat, decode_boxes_4ps, decode_centernet_bbox, heatmap_nms
from .deform_conv import deform_conv2d
from .connected_components import (connected_components, component_boxes,
                                   batch_component_boxes_u8)

__all__ = [
    "resize_bilinear",
    "resize_pad_normalize",
    "batch_resize_pad_normalize",
    "normalize_image",
    "perspective_matrices",
    "warp_perspective_batch",
    "order_points_clockwise",
    "crop_rotated_boxes",
    "ctc_greedy_decode",
    "hard_nms",
    "nms_mask",
    "topk_scores",
    "gather_feat",
    "decode_boxes_4ps",
    "decode_centernet_bbox",
    "heatmap_nms",
    "deform_conv2d",
    "connected_components",
    "component_boxes",
    "batch_component_boxes_u8",
]

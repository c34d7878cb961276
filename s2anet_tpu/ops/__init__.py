from .rbox import (
    norm_angle,
    rbox_to_poly,
    poly_to_rbox,
    rboxes_encode,
    rboxes_decode,
    rbox_vertices,
)
from .iou_rotated import box_iou_rotated
from .nms_rotated import nms_rotated, ml_nms_rotated, multiclass_nms_rotated
from .deform_conv import deform_conv2d, align_conv_offsets
from .orn import arf_indices, rotate_arf, rotation_invariant_pooling

__all__ = [
    "norm_angle",
    "rbox_to_poly",
    "poly_to_rbox",
    "rboxes_encode",
    "rboxes_decode",
    "rbox_vertices",
    "box_iou_rotated",
    "nms_rotated",
    "ml_nms_rotated",
    "multiclass_nms_rotated",
    "deform_conv2d",
    "align_conv_offsets",
    "arf_indices",
    "rotate_arf",
    "rotation_invariant_pooling",
]

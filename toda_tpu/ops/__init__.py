"""Device-side (JAX/Pallas) compute ops.

This package is the TPU-native replacement for the reference's five CUDA extensions
(pcdet/ops/{iou3d_nms, roiaware_pool3d, roipoint_pool3d, pointnet2_batch,
pointnet2_stack}) plus the external spconv voxelizer. Everything here is jittable,
static-shape, mask-carrying.
"""

from .rotated_iou import boxes_iou_bev, boxes_overlap_bev, boxes_iou3d
from .nms import nms_bev, class_agnostic_nms
from .points_in_boxes import points_in_boxes
from .voxelizer import voxelize, dynamic_voxelize

__all__ = [
    "boxes_iou_bev",
    "boxes_overlap_bev",
    "boxes_iou3d",
    "nms_bev",
    "class_agnostic_nms",
    "points_in_boxes",
    "voxelize",
    "dynamic_voxelize",
]

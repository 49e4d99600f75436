"""World-level augmentation primitives (host numpy), with record/replay params.

Reference: pcdet/datasets/augmentor/augmentor_utils.py:8-585. Every op here takes an
optional ``params`` argument: ``None`` samples fresh randomness and returns the
params used; a concrete value replays them. This single mechanism replaces the
reference's separate DataAugmentorCL replay machinery
(pcdet/datasets/augmentor/data_augmentor_cl.py) — augmentation-as-data from day one,
which is also what the stage-2 consistency loss needs to reverse transforms.
"""

import numpy as np

from ...utils import common_utils


def random_flip_along_x(gt_boxes, points, params=None):
    """Flip y coordinate with prob 0.5. Returns (boxes, points, enable_flag)."""
    enable = np.random.choice([False, True]) if params is None else bool(params)
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]
        points[:, 1] = -points[:, 1]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 8] = -gt_boxes[:, 8]  # velocity_y
    return gt_boxes, points, enable


def random_flip_along_y(gt_boxes, points, params=None):
    """Flip x coordinate with prob 0.5."""
    enable = np.random.choice([False, True]) if params is None else bool(params)
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 0] = -gt_boxes[:, 0]
        gt_boxes[:, 6] = -(gt_boxes[:, 6] + np.pi)
        points[:, 0] = -points[:, 0]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]  # velocity_x
    return gt_boxes, points, enable


def global_rotation(gt_boxes, points, rot_range, params=None):
    noise = (
        np.random.uniform(rot_range[0], rot_range[1]) if params is None else float(params)
    )
    points = common_utils.rotate_points_along_z(points[None], np.array([noise]))[0]
    gt_boxes = gt_boxes.copy()
    gt_boxes[:, 0:3] = common_utils.rotate_points_along_z(
        gt_boxes[None, :, 0:3], np.array([noise])
    )[0]
    gt_boxes[:, 6] += noise
    if gt_boxes.shape[1] > 7:
        vel = np.concatenate(
            [gt_boxes[:, 7:9], np.zeros((gt_boxes.shape[0], 1), dtype=gt_boxes.dtype)], axis=1
        )
        gt_boxes[:, 7:9] = common_utils.rotate_points_along_z(vel[None], np.array([noise]))[
            0, :, 0:2
        ]
    return gt_boxes, points, noise


def global_scaling(gt_boxes, points, scale_range, params=None):
    if scale_range[1] - scale_range[0] < 1e-3 and params is None:
        return gt_boxes, points, 1.0
    scale = (
        np.random.uniform(scale_range[0], scale_range[1]) if params is None else float(params)
    )
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    points[:, :3] *= scale
    gt_boxes[:, :6] *= scale
    if gt_boxes.shape[1] > 7:
        gt_boxes[:, 7:9] *= scale
    return gt_boxes, points, scale


def global_translation(gt_boxes, points, noise_std, params=None):
    if params is None:
        noise = np.random.normal(0, np.asarray(noise_std), 3)
    else:
        noise = np.asarray(params, dtype=np.float64)
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    points[:, :3] += noise
    gt_boxes[:, :3] += noise
    return gt_boxes, points, noise.tolist()


def random_local_rotation(gt_boxes, points, rot_range, params=None):
    """Rotate each object (box + its points) independently about its own center.

    Reference: augmentor_utils random_local_rotation. params: (M,) angles.
    """
    from ...utils import box_utils

    m = len(gt_boxes)
    if m == 0:
        return gt_boxes, points, []
    angles = (
        np.random.uniform(rot_range[0], rot_range[1], m) if params is None
        else np.asarray(params)
    )
    gt_boxes = gt_boxes.copy()
    points = points.copy()
    member = box_utils.points_in_boxes_numpy(points, gt_boxes[:, :7])
    for j in range(m):
        sel = member[j]
        c, s = np.cos(angles[j]), np.sin(angles[j])
        rel = points[sel, :2] - gt_boxes[j, :2]
        points[sel, 0] = rel[:, 0] * c - rel[:, 1] * s + gt_boxes[j, 0]
        points[sel, 1] = rel[:, 0] * s + rel[:, 1] * c + gt_boxes[j, 1]
        gt_boxes[j, 6] += angles[j]
    return gt_boxes, points, angles.tolist()


def random_local_scaling(gt_boxes, points, scale_range, params=None):
    """Scale each object independently about its center (points + box dims)."""
    from ...utils import box_utils

    m = len(gt_boxes)
    if m == 0:
        return gt_boxes, points, []
    scales = (
        np.random.uniform(scale_range[0], scale_range[1], m) if params is None
        else np.asarray(params)
    )
    gt_boxes = gt_boxes.copy()
    points = points.copy()
    member = box_utils.points_in_boxes_numpy(points, gt_boxes[:, :7])
    for j in range(m):
        sel = member[j]
        points[sel, :3] = (points[sel, :3] - gt_boxes[j, :3]) * scales[j] + gt_boxes[j, :3]
        gt_boxes[j, 3:6] *= scales[j]
    return gt_boxes, points, scales.tolist()


def random_world_frustum_dropout(gt_boxes, points, intensity_range=(0.2, 0.7),
                                 direction_range=(-np.pi, np.pi), params=None):
    """Drop all points inside a random azimuth frustum (sensor-occlusion sim).

    Reference: augmentor_utils random_world_frustum_dropout_* family, collapsed
    to the azimuth variant. params: (direction, half_width).
    """
    if params is None:
        direction = np.random.uniform(*direction_range)
        half = np.random.uniform(*intensity_range) / 2.0
    else:
        direction, half = params
    ang = np.arctan2(points[:, 1], points[:, 0])
    rel = (ang - direction + np.pi) % (2 * np.pi) - np.pi
    keep = np.abs(rel) > half
    if len(gt_boxes):
        bang = np.arctan2(gt_boxes[:, 1], gt_boxes[:, 0])
        brel = (bang - direction + np.pi) % (2 * np.pi) - np.pi
        box_keep = np.abs(brel) > half
    else:
        box_keep = np.ones(0, bool)
    return gt_boxes[box_keep], points[keep], (float(direction), float(half)), box_keep


def reverse_boxes_transform(boxes, aug_params):
    """Undo recorded world augmentations on predicted boxes (for the stage-2
    consistency loss — reference pcdet/models/__init__.py reverse_transform).

    aug_params: list of (name, params) in the order applied; we invert in reverse.
    boxes: (N, 7+) numpy or jnp-convertible.
    """
    boxes = np.array(boxes, copy=True)
    for name, p in reversed(aug_params):
        if name == "random_world_flip_x" and p:
            boxes[:, 1] = -boxes[:, 1]
            boxes[:, 6] = -boxes[:, 6]
        elif name == "random_world_flip_y" and p:
            boxes[:, 0] = -boxes[:, 0]
            boxes[:, 6] = -(boxes[:, 6] + np.pi)
        elif name == "random_world_rotation":
            boxes[:, 0:3] = common_utils.rotate_points_along_z(
                boxes[None, :, 0:3], np.array([-p])
            )[0]
            boxes[:, 6] -= p
        elif name == "random_world_scaling":
            boxes[:, :6] /= p
        elif name == "random_world_translation":
            boxes[:, :3] -= np.asarray(p)
    return boxes

"""Intra-domain point-level scene MixUp (stage 2 of TODA) — host numpy.

Reference semantics: pcdet/datasets/processor/intra_domain_point_mixup.py:15-72:
lambda ~ Beta(alpha, alpha); keep a lambda-fraction of scene A's points and a
(1-lambda)-fraction of scene B's, union the boxes. The ``_cd`` (collision
detection) variant first removes B-boxes (and their points) that collide with
A-boxes in BEV.
"""

import numpy as np

from ...utils import box_utils


def _subsample(points, frac, rng):
    n = len(points)
    k = int(round(n * frac))
    if k >= n:
        return points
    idx = rng.choice(n, k, replace=False)
    return points[idx]


def intra_domain_point_mixup(a, b, alpha=1.0, rng=None):
    """Plain MixUp: no collision handling."""
    rng = rng or np.random
    lam = rng.beta(alpha, alpha)
    points = np.concatenate([_subsample(a["points"], lam, rng),
                             _subsample(b["points"], 1.0 - lam, rng)])
    boxes = np.concatenate([a["gt_boxes"], b["gt_boxes"]])
    names = np.concatenate([a["gt_names"], b["gt_names"]])
    return {"points": points, "gt_boxes": boxes, "gt_names": names, "mixup_lambda": lam}


def intra_domain_point_mixup_cd(a, b, alpha=1.0, rng=None):
    """MixUp with collision detection: B-boxes overlapping A-boxes are dropped
    together with their points before mixing."""
    rng = rng or np.random
    ab, bb = a["gt_boxes"], b["gt_boxes"]
    if len(ab) and len(bb):
        iou = box_utils.boxes3d_nearest_bev_iou(bb[:, :7], ab[:, :7])
        keep = iou.max(axis=1) < 1e-2
    else:
        keep = np.ones(len(bb), bool)
    b_points = b["points"]
    if (~keep).any():
        drop_boxes = bb[~keep]
        inside = box_utils.points_in_boxes_numpy(b_points, drop_boxes).any(axis=0)
        b_points = b_points[~inside]
    b_clean = {"points": b_points, "gt_boxes": bb[keep], "gt_names": b["gt_names"][keep]}
    return intra_domain_point_mixup(a, b_clean, alpha=alpha, rng=rng)

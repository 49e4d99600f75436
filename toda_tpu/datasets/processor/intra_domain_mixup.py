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
    """Shuffle then keep the first int(n * frac) points — the reference's
    shuffle_points + [:int(n*lam)] (intra_domain_point_mixup.py:8-28);
    rng.permutation consumes the identical draw sequence."""
    n = len(points)
    idx = rng.permutation(n)
    return points[idx[: int(n * frac)]]


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
    """MixUp with collision detection: B-boxes with nonzero rotated-BEV overlap
    against any A-box are dropped together with their points (the reference's
    boxes_bev_iou_cpu == 0 rule + get_points_in_box margined membership,
    intra_domain_point_mixup.py:33-72) before mixing."""
    from ..augmentor.augmentor_utils import _members_with_margin

    rng = rng or np.random
    lam = rng.beta(alpha, alpha)  # reference draws lambda BEFORE the cd step
    ab, bb = a["gt_boxes"], b["gt_boxes"]
    if len(ab) and len(bb):
        iou = box_utils.boxes_bev_iou_cpu(ab[:, :7], bb[:, :7])
        keep = iou.max(axis=0) == 0
    else:
        keep = np.ones(len(bb), bool)
    b_points = b["points"]
    if (~keep).any():
        inside = _members_with_margin(b_points, bb[~keep][:, :7]).any(axis=0)
        b_points = b_points[~inside]
    points = np.concatenate([_subsample(a["points"], lam, rng),
                             _subsample(b_points, 1.0 - lam, rng)])
    boxes = np.concatenate([ab, bb[keep]])
    names = np.concatenate([a["gt_names"], b["gt_names"][keep]])
    return {"points": points, "gt_boxes": boxes, "gt_names": names, "mixup_lambda": lam}

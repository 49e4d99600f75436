"""Native Waymo AP / APH (no tensorflow / waymo_open_dataset).

Reference: pcdet/datasets/waymo/waymo_eval.py:23 defers to the TF
detection_metrics op. Protocol re-derived from the Waymo Open Dataset metric
definition: per-class 3D-IoU greedy matching (Vehicle 0.7, Pedestrian /
Cyclist / Sign 0.5), all-point PR integration, and APH = AP with each true
positive weighted by heading accuracy 1 - |wrap(theta_dt - theta_gt)| / pi.
Difficulty: LEVEL_2 = labelled level 2 or fewer than 5 lidar points; LEVEL_1
excludes those, LEVEL_2 metrics include everything.
"""

import numpy as np

IOU_THRESH = {"vehicle": 0.7, "car": 0.7, "pedestrian": 0.5, "cyclist": 0.5, "sign": 0.5}


def _iou3d(det_boxes, gt_boxes):
    import jax.numpy as jnp

    from ..ops.rotated_iou import boxes_iou3d

    if len(det_boxes) == 0 or len(gt_boxes) == 0:
        return np.zeros((len(det_boxes), len(gt_boxes)), np.float32)
    return np.asarray(
        boxes_iou3d(jnp.asarray(det_boxes[:, :7]), jnp.asarray(gt_boxes[:, :7]))
    )


def _heading_accuracy(dt_yaw, gt_yaw):
    d = np.abs((dt_yaw - gt_yaw + np.pi) % (2 * np.pi) - np.pi)
    return 1.0 - d / np.pi


def eval_class_aph(det_annos, gt_annos, cls_name, level=2):
    """Returns {'ap', 'aph'} for one class at LEVEL_1 or LEVEL_2."""
    cls_name = cls_name.lower()
    thresh = IOU_THRESH.get(cls_name, 0.5)
    scores, tps, haccs = [], [], []
    total_gt = 0
    for det, gt in zip(det_annos, gt_annos):
        g_m = np.asarray([str(n).lower() for n in gt["name"]]) == cls_name
        g_boxes = np.asarray(gt["boxes_lidar"]).reshape(-1, 7 if g_m.size else 7)[g_m] \
            if g_m.any() else np.zeros((0, 7), np.float32)
        diff = np.asarray(gt.get("difficulty", np.ones(int(g_m.sum()))))[: len(g_boxes)]
        npts = np.asarray(gt.get("num_points_in_gt", np.full(int(g_m.sum()), 5)))[
            : len(g_boxes)
        ]
        is_l2 = (diff >= 2) | (npts < 5)
        care = np.ones(len(g_boxes), bool) if level >= 2 else ~is_l2
        total_gt += int(care.sum())

        d_m = np.asarray([str(n).lower() for n in det["name"]]) == cls_name
        d_boxes = np.asarray(det["boxes_lidar"]).reshape(-1, 7)[d_m] if d_m.any() else \
            np.zeros((0, 7), np.float32)
        d_scores = np.asarray(det["score"])[d_m] if d_m.any() else np.zeros(0)
        if not len(d_boxes):
            continue
        order = np.argsort(-d_scores)
        d_boxes, d_scores = d_boxes[order], d_scores[order]
        iou = _iou3d(d_boxes, g_boxes)
        taken = np.zeros(len(g_boxes), bool)
        for i in range(len(d_boxes)):
            if len(g_boxes):
                cand = np.where(taken, -1.0, iou[i])
                j = int(np.argmax(cand))
                if cand[j] >= thresh:
                    taken[j] = True
                    if care[j]:
                        scores.append(d_scores[i])
                        tps.append(1)
                        haccs.append(_heading_accuracy(d_boxes[i, 6], g_boxes[j, 6]))
                    continue  # matched a don't-care-at-this-level gt: ignored
            scores.append(d_scores[i])
            tps.append(0)
            haccs.append(0.0)
    if total_gt == 0 or not scores:
        return {"ap": 0.0, "aph": 0.0}
    order = np.argsort(-np.asarray(scores))
    tp = np.asarray(tps, np.float64)[order]
    hw = np.asarray(haccs, np.float64)[order]
    cum_tp = np.cumsum(tp)
    cum_h = np.cumsum(hw)
    cum_n = np.arange(1, len(tp) + 1)
    recall = cum_tp / total_gt
    precision = cum_tp / cum_n
    precision_h = cum_h / cum_n
    # all-point interpolated AP: right-max smoothing, integrate over recall
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
        precision_h[i] = max(precision_h[i], precision_h[i + 1])
    r_prev = np.concatenate([[0.0], recall[:-1]])
    ap = float(np.sum((recall - r_prev) * precision))
    aph = float(np.sum((recall - r_prev) * precision_h))
    return {"ap": ap, "aph": aph}


def waymo_eval(det_annos, gt_annos, class_names):
    """(result_str, dict) with AP/APH at LEVEL_1 and LEVEL_2 per class."""
    result = {}
    for cls in class_names:
        for level, tag in ((1, "LEVEL_1"), (2, "LEVEL_2")):
            r = eval_class_aph(det_annos, gt_annos, cls, level=level)
            result[f"{cls}_{tag}/AP"] = r["ap"]
            result[f"{cls}_{tag}/APH"] = r["aph"]
    lines = [f"{k}: {v:.4f}" for k, v in sorted(result.items())]
    return "\n".join(lines), result

"""KITTI-protocol AP (R40) in numpy/JAX — replaces the reference's numba kernels.

Reference: pcdet/datasets/kitti/kitti_object_eval_python/eval.py (808 LoC,
@numba.jit) + rotate_iou.py (numba.cuda). Re-derivation: 40-recall-position
interpolated AP with per-class IoU thresholds (car 0.7, pedestrian/cyclist 0.5),
greedy score-ordered matching on rotated BEV or 3D IoU, difficulty filtering via
the per-box 'difficulty' field (0/1/2; -1 = ignore). The rotated IoU matrix is
computed by the jitted device kernel (toda_tpu/ops/rotated_iou) instead of
numba.cuda.
"""

import numpy as np

DEFAULT_IOU_THRESH = {"car": 0.7, "pedestrian": 0.5, "cyclist": 0.5}
N_SAMPLE_PTS = 40


def _iou_matrix(det_boxes, gt_boxes, metric):
    import jax.numpy as jnp

    from ..ops.rotated_iou import boxes_iou3d, boxes_iou_bev

    if len(det_boxes) == 0 or len(gt_boxes) == 0:
        return np.zeros((len(det_boxes), len(gt_boxes)), np.float32)
    fn = boxes_iou_bev if metric == "bev" else boxes_iou3d
    return np.asarray(fn(jnp.asarray(det_boxes[:, :7]), jnp.asarray(gt_boxes[:, :7])))


def eval_class(det_annos, gt_annos, class_name, metric="3d", iou_thresh=None,
               difficulty=None):
    """AP_R40 for one class. det/gt annos per frame: 'name', 'boxes_lidar',
    det extra 'score', gt optional 'difficulty' (-1 ignores a box)."""
    iou_thresh = iou_thresh or DEFAULT_IOU_THRESH.get(class_name, 0.5)
    scores, tps = [], []
    total_gt = 0
    for det, gt in zip(det_annos, gt_annos):
        g_m = np.asarray(gt["name"]) == class_name
        g_boxes = np.asarray(gt["boxes_lidar"])[g_m]
        diff = np.asarray(gt.get("difficulty", np.zeros(len(gt["name"]))))[g_m]
        if difficulty is not None:
            care = diff <= difficulty
        else:
            care = diff >= 0
        total_gt += int(care.sum())
        d_m = np.asarray(det["name"]) == class_name
        d_boxes = np.asarray(det["boxes_lidar"])[d_m]
        d_scores = np.asarray(det["score"])[d_m]
        if len(d_boxes) == 0:
            continue
        order = np.argsort(-d_scores)
        d_boxes, d_scores = d_boxes[order], d_scores[order]
        iou = _iou_matrix(d_boxes, g_boxes, metric)
        taken = np.zeros(len(g_boxes), bool)
        for i in range(len(d_boxes)):
            if len(g_boxes):
                cand = np.where(taken, -1.0, iou[i])
                j = int(np.argmax(cand))
                if cand[j] >= iou_thresh:
                    taken[j] = True
                    if care[j]:
                        scores.append(d_scores[i]); tps.append(1)
                    # matched to a dont-care gt: neither TP nor FP
                    continue
            scores.append(d_scores[i]); tps.append(0)
    if total_gt == 0 or not scores:
        return 0.0
    order = np.argsort(-np.asarray(scores))
    tp = np.asarray(tps)[order]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(1 - tp)
    recall = cum_tp / total_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)
    # R40: average precision at 40 recall positions (1/40 .. 1)
    ap = 0.0
    for t in np.linspace(1.0 / N_SAMPLE_PTS, 1.0, N_SAMPLE_PTS):
        prec = precision[recall >= t]
        ap += (prec.max() if len(prec) else 0.0) / N_SAMPLE_PTS
    return float(ap)


def kitti_eval(det_annos, gt_annos, class_names, difficulties=(0, 1, 2)):
    """Returns (result_str, dict) with AP_R40 per class x metric x difficulty."""
    result = {}
    for cls in class_names:
        for metric in ("bev", "3d"):
            for d, dname in zip(difficulties, ("easy", "moderate", "hard")):
                ap = eval_class(det_annos, gt_annos, cls, metric=metric, difficulty=d)
                result[f"{cls}_{metric}_{dname}_R40"] = ap
    # headline: moderate 3d mAP
    mods = [v for k, v in result.items() if k.endswith("3d_moderate_R40")]
    result["mAP_3d_moderate"] = float(np.mean(mods)) if mods else 0.0
    lines = [f"{k}: {v:.4f}" for k, v in sorted(result.items())]
    return "\n".join(lines), result

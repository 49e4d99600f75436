"""Golden-file metric parity harness (VERDICT r2 missing #4 / next-round #4).

Real nuScenes/Waymo/KITTI data cannot exist in this environment, so accuracy
evidence is pinned the golden way: a fully deterministic detection scenario
(TPs with controlled center/size/yaw/velocity errors, misses, low-score FPs)
is routed through the COMPLETE output pipeline — padded prediction tensors ->
dataset.generate_prediction_dicts -> dataset.evaluation (official-protocol
native backends) — and every resulting metric is asserted against
tests/golden/metrics_golden.json, committed alongside. Any change to decode,
NMS-side formatting, matching, AP integration, TP-error accumulation, or the
NDS formula shifts these numbers and fails here.

Regenerate (after an INTENTIONAL protocol change only):
    python tests/test_golden_metrics.py --regen
"""

import json
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

GOLDEN = Path(__file__).parent / "golden" / "metrics_golden.json"


def build_scenario():
    """10 frames x 8 GT cars; detections with deterministic error schedule."""
    frames = []
    for f in range(10):
        gt = np.zeros((8, 9), np.float64)
        for i in range(8):
            gt[i, 0] = -30 + 8 * i + f * 0.5
            gt[i, 1] = -20 + 5 * ((i * 3) % 8)
            gt[i, 2] = -0.5 + 0.05 * i
            gt[i, 3:6] = [4.2 + 0.1 * i, 1.9, 1.6]
            gt[i, 6] = (i - 4) * 0.35
            gt[i, 7:9] = [0.5 * (i % 3), 0.25 * (i % 2)]
        attrs = np.array(
            ["vehicle.moving" if i % 3 else "vehicle.parked" for i in range(8)]
        )
        dets, det_scores, det_attrs = [], [], []
        for i in range(8):
            if (f + i) % 7 == 6:
                continue  # miss
            d = gt[i].copy()
            d[0] += 0.3 * (i % 5)        # ATE schedule 0..1.2 m
            d[3:6] *= 0.9 + 0.05 * (i % 4)
            d[6] += 0.1 * (i % 3)        # AOE schedule
            d[7] += 0.2 * (i % 2)        # AVE schedule
            dets.append(d)
            det_scores.append(0.9 - 0.05 * i - 0.002 * f)
            det_attrs.append(attrs[i] if i % 2 == 0 else "vehicle.parked")
        for j in range(3):  # far FPs
            fp = np.zeros(9)
            fp[0], fp[1] = 200 + 10 * j, 200
            fp[3:6] = [4.0, 2.0, 1.6]
            dets.append(fp)
            det_scores.append(0.3 - 0.01 * j)
            det_attrs.append("vehicle.parked")
        frames.append({
            "gt": gt, "gt_attrs": attrs,
            "det": np.asarray(dets), "scores": np.asarray(det_scores),
            "det_attrs": np.asarray(det_attrs),
        })
    return frames


def padded_pred_dicts(frames, k=16):
    """Fixed-capacity prediction tensors, the jitted predict-step output form."""
    preds = []
    for fr in frames:
        n = len(fr["det"])
        boxes = np.zeros((k, 9), np.float32)
        boxes[:n] = fr["det"]
        scores = np.zeros(k, np.float32)
        scores[:n] = fr["scores"]
        labels = np.zeros(k, np.int64)
        labels[:n] = 1
        mask = np.zeros(k, bool)
        mask[:n] = True
        preds.append({
            "pred_boxes": boxes, "pred_scores": scores,
            "pred_labels": labels, "pred_mask": mask,
        })
    return preds


def nuscenes_pipeline(frames, tmp_root):
    from toda_tpu.config import EDict
    from toda_tpu.datasets.nuscenes.nuscenes_dataset import NuScenesDataset

    infos = []
    for f, fr in enumerate(frames):
        infos.append({
            "lidar_path": f"samples/{f}.bin", "token": f"tok{f}",
            "gt_boxes": fr["gt"].astype(np.float32),
            "gt_names": np.array(["car"] * len(fr["gt"])),
            "gt_attributes": fr["gt_attrs"],
            "num_lidar_pts": np.full(len(fr["gt"]), 50),
            "sweeps": [],
        })
    root = Path(tmp_root)
    (root / "nus").mkdir(parents=True, exist_ok=True)
    with open(root / "nus" / "nuscenes_infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = EDict({
        "DATASET": "NuScenesDataset", "DATA_PATH": str(root / "nus"),
        "INFO_PATH": {"train": ["nuscenes_infos_val.pkl"],
                      "test": ["nuscenes_infos_val.pkl"]},
        "MAX_SWEEPS": 1,
        "POINT_CLOUD_RANGE": [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
        "MAX_POINTS": 1024, "MAX_GT_BOXES": 16,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [],
    })
    ds = NuScenesDataset(cfg, ["car"], training=False)
    pred_dicts = padded_pred_dicts(frames)
    det_annos = []
    for i, pd in enumerate(pred_dicts):
        det_annos.extend(
            ds.generate_prediction_dicts({"frame_id": [f"tok{i}"]}, [pd], ["car"])
        )
    # det attributes: explicit (the adapter's velocity heuristic is exercised
    # by leaving half the frames without the key)
    for i, (anno, fr) in enumerate(zip(det_annos, frames)):
        if i % 2 == 0:
            m = anno["pred_labels"] > 0 if "pred_labels" in anno else slice(None)
            anno["attribute"] = fr["det_attrs"]
    _, result = ds.evaluation(det_annos, ["car"])
    return {k: round(float(v), 10) for k, v in result.items()}


def kitti_pipeline(frames):
    from toda_tpu.utils.kitti_eval_native import kitti_eval

    gt_annos, det_annos = [], []
    for fr in frames:
        n = len(fr["gt"])
        gt_annos.append({
            "name": np.array(["car"] * n),
            "boxes_lidar": fr["gt"][:, :7],
            "bbox": np.tile([100.0, 100.0, 300.0, 300.0], (n, 1)),
            "occluded": np.zeros(n, np.int64),
            "truncated": np.zeros(n, np.float64),
            "alpha": np.zeros(n),
            "location": fr["gt"][:, :3], "dimensions": fr["gt"][:, 3:6],
            "rotation_y": fr["gt"][:, 6],
        })
        m = len(fr["det"])
        det_annos.append({
            "name": np.array(["car"] * m),
            "boxes_lidar": fr["det"][:, :7],
            "score": fr["scores"],
            "bbox": np.tile([100.0, 100.0, 300.0, 300.0], (m, 1)),
            "alpha": np.zeros(m),
        })
    _, result = kitti_eval(det_annos, gt_annos, ["car"])
    return {k: round(float(v), 10) for k, v in result.items()}


def waymo_pipeline(frames):
    from toda_tpu.utils.waymo_eval_native import waymo_eval

    gt_annos, det_annos = [], []
    for fr in frames:
        gt_annos.append({
            "name": np.array(["vehicle"] * len(fr["gt"])),
            "boxes_lidar": fr["gt"][:, :7],
            "difficulty": np.ones(len(fr["gt"]), np.int64),
            "num_points_in_gt": np.full(len(fr["gt"]), 50),
        })
        det_annos.append({
            "name": np.array(["vehicle"] * len(fr["det"])),
            "boxes_lidar": fr["det"][:, :7],
            "score": fr["scores"],
        })
    _, result = waymo_eval(det_annos, gt_annos, ["vehicle"])
    return {k: round(float(v), 10) for k, v in result.items()}


def compute_all(tmp_root):
    frames = build_scenario()
    return {
        "nuscenes": nuscenes_pipeline(frames, tmp_root),
        "kitti": kitti_pipeline(frames),
        "waymo": waymo_pipeline(frames),
    }


def test_golden_metric_parity(tmp_path):
    got = compute_all(tmp_path)
    golden = json.loads(GOLDEN.read_text())
    for backend in golden:
        for key, val in golden[backend].items():
            assert key in got[backend], (backend, key)
            assert abs(got[backend][key] - val) < 1e-9, (
                backend, key, got[backend][key], val,
            )
    # sanity on the committed numbers themselves
    assert 0.2 < golden["nuscenes"]["mAP"] < 1.0
    assert 0.1 < golden["nuscenes"]["NDS"] < 1.0


if __name__ == "__main__":
    import sys
    import tempfile

    if "--regen" in sys.argv:
        out = compute_all(tempfile.mkdtemp())
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(json.dumps(out, indent=1, sort_keys=True))
        print("wrote", GOLDEN)
        print(json.dumps({k: v.get("mAP", v) for k, v in out.items()}, indent=1)[:500])

"""KITTI adapter + native R40 eval tests on fabricated data."""

import pickle

import numpy as np
import pytest
import yaml

from toda_tpu.config import EDict
from toda_tpu.datasets import build_dataloader
from toda_tpu.utils.kitti_eval_native import kitti_eval


@pytest.fixture(scope="module")
def fake_kitti(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    (root / "velodyne").mkdir()
    rng = np.random.RandomState(0)
    infos = []
    for i in range(3):
        n = 2000
        pts = rng.uniform(-30, 30, (n, 4)).astype(np.float32)
        pts[:, 2] = rng.uniform(-2, 1, n)
        idx = f"{i:06d}"
        pts.tofile(root / "velodyne" / f"{idx}.bin")
        boxes = np.zeros((2, 7), np.float32)
        boxes[:, :2] = rng.uniform(-15, 15, (2, 2))
        boxes[:, 2] = -0.8
        boxes[:, 3:6] = [3.9, 1.6, 1.55]
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, 2)
        infos.append(
            {
                "point_cloud": {"lidar_idx": idx},
                "annos": {
                    "name": np.asarray(["Car", "Pedestrian"]),
                    "gt_boxes_lidar": boxes,
                    "difficulty": np.asarray([0, 1]),
                },
            }
        )
    with open(root / "kitti_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    with open(root / "kitti_infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)
    return root, infos


def kitti_cfg(root):
    with open("tools/cfgs/dataset_configs/synthetic_dataset.yaml") as f:
        cfg = EDict(yaml.safe_load(f))
    cfg.DATASET = "KittiDataset"
    cfg.DATA_PATH = str(root)
    cfg.INFO_PATH = {"train": ["kitti_infos_train.pkl"], "test": ["kitti_infos_val.pkl"]}
    cfg.POINT_CLOUD_RANGE = [-40.0, -40.0, -3.0, 40.0, 40.0, 1.0]
    cfg.DATA_PROCESSOR[2].NUM_POINTS = {"train": 4096, "test": 4096}
    return cfg


def test_kitti_loading(fake_kitti):
    root, infos = fake_kitti
    cfg = kitti_cfg(root)
    ds, loader, _ = build_dataloader(cfg, ["Car", "Pedestrian"], batch_size=2, training=True)
    assert len(ds) == 3
    pts, boxes, names = ds.get_raw_scene(0)
    assert pts.shape[1] == 4
    assert len(boxes) == 2
    batch = next(iter(loader))
    assert batch["points"].shape == (2, 4096, 4)


def test_kitti_eval_perfect(fake_kitti):
    root, infos = fake_kitti
    gt = [
        {"boxes_lidar": i["annos"]["gt_boxes_lidar"],
         "name": np.asarray([n.lower() for n in i["annos"]["name"]]),
         "difficulty": i["annos"]["difficulty"]}
        for i in infos
    ]
    det = [
        {"boxes_lidar": g["boxes_lidar"], "name": g["name"],
         "score": np.ones(len(g["name"]))}
        for g in gt
    ]
    s, result = kitti_eval(det, gt, ["car", "pedestrian"])
    assert result["car_3d_moderate_R40"] > 0.95
    assert result["mAP_3d_moderate"] > 0.95


def test_kitti_eval_misses(fake_kitti):
    root, infos = fake_kitti
    gt = [
        {"boxes_lidar": i["annos"]["gt_boxes_lidar"],
         "name": np.asarray([n.lower() for n in i["annos"]["name"]]),
         "difficulty": i["annos"]["difficulty"]}
        for i in infos
    ]
    det = [
        {"boxes_lidar": np.zeros((0, 7)), "name": np.asarray([]), "score": np.asarray([])}
        for _ in gt
    ]
    _, result = kitti_eval(det, gt, ["car", "pedestrian"])
    assert result["mAP_3d_moderate"] == 0.0

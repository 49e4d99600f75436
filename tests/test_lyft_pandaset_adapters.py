"""Lyft / Pandaset adapters on fabricated info fixtures + the native Lyft mAP."""

import pickle

import numpy as np
import pytest
import yaml

from toda_tpu.config import EDict
from toda_tpu.datasets import build_dataloader


def _base_cfg():
    with open("tools/cfgs/dataset_configs/synthetic_dataset.yaml") as f:
        cfg = EDict(yaml.safe_load(f))
    cfg.POINT_CLOUD_RANGE = [-40.0, -40.0, -3.0, 40.0, 40.0, 3.0]
    cfg.DATA_PROCESSOR[2].NUM_POINTS = {"train": 4096, "test": 4096}
    return cfg


@pytest.fixture(scope="module")
def fake_lyft(tmp_path_factory):
    root = tmp_path_factory.mktemp("lyft")
    rng = np.random.RandomState(0)
    (root / "samples").mkdir()
    infos = []
    for i in range(3):
        n = 2000
        pts = np.zeros((n, 5), np.float32)
        pts[:, 0] = rng.uniform(-30, 30, n)
        pts[:, 1] = rng.uniform(-30, 30, n)
        pts[:, 2] = rng.uniform(-2, 1, n)
        pts[:, 3] = rng.uniform(0, 100, n)
        pts.tofile(root / "samples" / f"f{i}.bin")
        boxes = np.zeros((2, 7), np.float32)
        boxes[:, :2] = rng.uniform(-20, 20, (2, 2))
        boxes[:, 3:6] = [4.5, 1.9, 1.7]
        infos.append(
            {
                "lidar_path": f"samples/f{i}.bin",
                "token": f"ly{i}",
                "sweeps": [],
                "gt_boxes": boxes,
                "gt_names": np.asarray(["car", "truck"]),
            }
        )
    with open(root / "lyft_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    with open(root / "lyft_infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)
    return root, infos


def test_lyft_adapter_loads_and_prepares(fake_lyft):
    root, infos = fake_lyft
    cfg = _base_cfg()
    cfg.DATASET = "LyftDataset"
    cfg.DATA_PATH = str(root)
    cfg.MAX_SWEEPS = 1
    cfg.INFO_PATH = {"train": ["lyft_infos_train.pkl"], "test": ["lyft_infos_val.pkl"]}
    cfg.POINT_FEATURE_ENCODING = {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity", "timestamp"],
        "src_feature_list": ["x", "y", "z", "intensity", "timestamp"],
    }
    ds, loader, _ = build_dataloader(cfg, ["car", "truck"], batch_size=1, training=True)
    assert len(ds) == 3
    pts, boxes, names = ds.get_raw_scene(0)
    assert pts.shape[1] == 5 and boxes.shape == (2, 7)
    # ego points removed (none are within 1 m here, but the path must run)
    batch = next(iter(loader))
    assert batch["points"].shape[0] == 1


def test_lyft_native_map_eval(fake_lyft):
    root, infos = fake_lyft
    from toda_tpu.datasets.lyft.lyft_dataset import lyft_map_eval

    gts = [
        {"boxes_lidar": i["gt_boxes"][:, :7],
         "name": np.asarray([n for n in i["gt_names"]])}
        for i in infos
    ]
    # perfect detections -> mAP 1.0 at every threshold
    dets = [
        {"boxes_lidar": g["boxes_lidar"].copy(), "name": g["name"].copy(),
         "score": np.linspace(0.9, 0.5, len(g["name"]))}
        for g in gts
    ]
    _, ap = lyft_map_eval(dets, gts, ["car", "truck"], [0.5, 0.7])
    assert ap["mAP"] == pytest.approx(1.0)
    # shifted detections -> zero at high threshold
    far = [
        {"boxes_lidar": g["boxes_lidar"] + np.array([10, 0, 0, 0, 0, 0, 0], np.float32),
         "name": g["name"].copy(), "score": np.ones(len(g["name"])) * 0.8}
        for g in gts
    ]
    _, ap2 = lyft_map_eval(far, gts, ["car", "truck"], [0.5])
    assert ap2["mAP"] == pytest.approx(0.0)


def test_pandaset_adapter_loads(tmp_path):
    rng = np.random.RandomState(1)
    (tmp_path / "lidar").mkdir()
    infos = []
    for i in range(2):
        pts = rng.uniform(-30, 30, size=(1500, 4)).astype(np.float32)
        np.save(tmp_path / "lidar" / f"s0_{i}.npy", pts)
        boxes = np.zeros((1, 7), np.float32)
        boxes[0, 3:6] = [4.0, 2.0, 1.5]
        infos.append(
            {
                "sequence": 0, "frame_idx": i,
                "lidar_path": f"lidar/s0_{i}.npy",
                "gt_boxes": boxes, "gt_names": np.asarray(["car"]),
                "zrot_world_to_ego": 0.3,
                "pose": np.zeros(7, np.float32),
            }
        )
    with open(tmp_path / "pandaset_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    with open(tmp_path / "pandaset_infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)

    cfg = _base_cfg()
    cfg.DATASET = "PandasetDataset"
    cfg.DATA_PATH = str(tmp_path)
    cfg.INFO_PATH = {
        "train": ["pandaset_infos_train.pkl"], "test": ["pandaset_infos_val.pkl"]
    }
    ds, loader, _ = build_dataloader(cfg, ["car"], batch_size=1, training=True)
    assert len(ds) == 2
    item = ds[0]
    assert item["points"].shape[1] == 4
    out_str, ap = ds.evaluation([], ["car"])
    assert ap == {}

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


def test_lyft_devkit_free_info_generation(tmp_path):
    """Raw Lyft JSON tables (nuScenes schema) -> infos: flat category names,
    7-dim boxes (no velocity), ImageSets split lists, sweep prev chain."""
    import json

    from toda_tpu.datasets.lyft.lyft_dataset import create_lyft_infos

    data = tmp_path / "trainval" / "data"
    data.mkdir(parents=True)
    q_id = [1.0, 0.0, 0.0, 0.0]

    def write(name, rows):
        (data / f"{name}.json").write_text(json.dumps(rows))

    write("scene", [{"token": "sc0", "name": "host-a004-lesson-1"},
                    {"token": "sc1", "name": "host-a004-lesson-2"}])
    write("sensor", [{"token": "se0", "channel": "LIDAR_TOP", "modality": "lidar"}])
    write("calibrated_sensor", [
        {"token": "cs0", "sensor_token": "se0",
         "translation": [0.0, 0.0, 0.0], "rotation": q_id}])
    write("ego_pose", [
        {"token": "ep0", "translation": [0.0, 0.0, 0.0], "rotation": q_id}])
    write("sample", [
        {"token": "s0", "scene_token": "sc0", "timestamp": 1_000_000},
        {"token": "s1", "scene_token": "sc1", "timestamp": 2_000_000}])
    write("sample_data", [
        {"token": "sw0", "sample_token": "s0", "is_key_frame": False,
         "calibrated_sensor_token": "cs0", "ego_pose_token": "ep0",
         "timestamp": 900_000, "filename": "sweep0.bin", "prev": "", "next": "sd0"},
        {"token": "sd0", "sample_token": "s0", "is_key_frame": True,
         "calibrated_sensor_token": "cs0", "ego_pose_token": "ep0",
         "timestamp": 1_000_000, "filename": "lidar0.bin", "prev": "sw0",
         "next": "sd1"},
        {"token": "sd1", "sample_token": "s1", "is_key_frame": True,
         "calibrated_sensor_token": "cs0", "ego_pose_token": "ep0",
         "timestamp": 2_000_000, "filename": "lidar1.bin", "prev": "sd0",
         "next": ""}])
    # Lyft categories are already detection names — no remap must happen
    write("category", [{"token": "cat0", "name": "car"},
                       {"token": "cat1", "name": "other_vehicle"}])
    write("instance", [{"token": "in0", "category_token": "cat0"},
                       {"token": "in1", "category_token": "cat1"}])
    # raw schema: no category_token / num_lidar_pts on the annotation rows
    write("sample_annotation", [
        {"token": "a0", "sample_token": "s0", "instance_token": "in0",
         "translation": [5.0, 3.0, 1.0], "rotation": q_id,
         "size": [2.0, 4.0, 1.5], "prev": "", "next": ""},
        {"token": "a1", "sample_token": "s1", "instance_token": "in1",
         "translation": [-2.0, 7.0, 0.5], "rotation": q_id,
         "size": [2.5, 8.0, 3.0], "prev": "", "next": ""}])
    sets = tmp_path / "ImageSets"
    sets.mkdir()
    (sets / "train.txt").write_text("host-a004-lesson-1\n")
    (sets / "val.txt").write_text("host-a004-lesson-2\n")

    train, val = create_lyft_infos(tmp_path, version="trainval",
                                   save_path=tmp_path, max_sweeps=2)
    assert len(train) == 1 and len(val) == 1
    info = train[0]
    assert info["lidar_path"] == "lidar0.bin"
    box = np.asarray(info["gt_boxes"])
    assert box.shape == (1, 7)  # no velocity channels for Lyft
    # identity poses: global == lidar frame; size (w,l,h) -> (dx=l, dy=w, dz=h)
    assert np.allclose(box[0], [5.0, 3.0, 1.0, 4.0, 2.0, 1.5, 0.0], atol=1e-6)
    assert info["gt_names"][0] == "car"
    assert info["num_lidar_pts"][0] == -1  # raw lyft rows lack the field
    assert len(info["sweeps"]) == 1
    assert info["sweeps"][0]["lidar_path"] == "sweep0.bin"
    assert val[0]["gt_names"][0] == "other_vehicle"
    # pkls written with the reference file names
    with open(tmp_path / "lyft_infos_train.pkl", "rb") as f:
        assert len(pickle.load(f)) == 1


def test_pandaset_devkit_free_extraction(tmp_path):
    """Raw gzip-pickled DataFrames + poses.json -> ego-frame npy + infos:
    device filtering, world->ego, pandaset-ego->normative axis swap,
    intensity/255, cuboid dim swap + zrot yaw shift."""
    import pandas as pd

    from toda_tpu.datasets.pandaset.pandaset_dataset import (
        _pandaset_frame_to_normative,
        create_pandaset_infos,
    )

    seq = tmp_path / "001"
    (seq / "lidar").mkdir(parents=True)
    (seq / "annotations" / "cuboids").mkdir(parents=True)
    # pose: position (10, 20, 0), identity heading
    pose = {"position": {"x": 10.0, "y": 20.0, "z": 0.0},
            "heading": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0}}
    (seq / "lidar" / "poses.json").write_text(
        __import__("json").dumps([pose]))
    # two points for device 0, one for device 1 (must be filtered)
    lidar = pd.DataFrame({
        "x": [10.0, 12.0, 99.0], "y": [30.0, 20.0, 99.0],
        "z": [1.0, 0.0, 9.0], "i": [255.0, 127.5, 3.0],
        "t": [0.0, 0.0, 0.0], "d": [0, 0, 1]})
    lidar.to_pickle(seq / "lidar" / "00.pkl.gz")
    cub = pd.DataFrame({
        "position.x": [12.0, 0.0], "position.y": [25.0, 0.0],
        "position.z": [0.5, 0.0],
        "dimensions.x": [2.0, 1.0], "dimensions.y": [4.5, 1.0],
        "dimensions.z": [1.5, 1.0],
        "yaw": [0.3, 0.0], "label": ["Car", "Pedestrian"],
        "cuboids.sensor_id": [-1, 1]})  # sensor_id 1 = front-lidar-only -> drop
    cub.to_pickle(seq / "annotations" / "cuboids" / "00.pkl.gz")

    save = tmp_path / "out"
    save.mkdir()
    cfg = EDict({"LIDAR_DEVICE": 0,
                 "TRAINING_CATEGORIES": {"Car": "car"},
                 "SEQUENCES": {"train": ["001"], "val": []}})
    train, val = create_pandaset_infos(cfg, None, tmp_path, save)
    assert len(train) == 1 and len(val) == 0
    info = train[0]
    pts = np.load(save / info["lidar_path"])
    # world (10,30,1) - t = pandaset-ego (0,10,1) -> normative (10, 0, 1)
    assert pts.shape == (2, 4)
    assert np.allclose(pts[0], [10.0, 0.0, 1.0, 1.0], atol=1e-5)
    # world (12,20,0) - t = pandaset-ego (2,0,0) -> normative (0, -2, 0)
    assert np.allclose(pts[1], [0.0, -2.0, 0.0, 0.5], atol=1e-5)
    # cuboid: world (12,25,.5) -> ego (2,5,.5) -> normative (5,-2,.5);
    # dims swap (dx=4.5, dy=2); identity heading -> zrot 0, yaw unchanged
    boxes = np.asarray(info["gt_boxes"])
    assert boxes.shape == (1, 7)
    assert np.allclose(boxes[0], [5.0, -2.0, 0.5, 4.5, 2.0, 1.5, 0.3], atol=1e-5)
    assert info["gt_names"][0] == "car"  # TRAINING_CATEGORIES remap applied
    assert info["zrot_world_to_ego"] == pytest.approx(0.0)

    # rotated pose: heading yaw +90deg -> zrot_world_to_ego = -pi/2
    import numpy as _np
    qy = {"position": {"x": 0.0, "y": 0.0, "z": 0.0},
          "heading": {"w": float(_np.cos(_np.pi / 4)), "x": 0.0, "y": 0.0,
                      "z": float(_np.sin(_np.pi / 4))}}
    z = _np.zeros(0)
    _, _, _, zrot = _pandaset_frame_to_normative(
        _np.zeros((0, 3)), _np.zeros(0),
        (z, z, z, z, z, z, z, _np.asarray([], object)), qy)
    assert zrot == pytest.approx(-_np.pi / 2)

    # the written infos load through the adapter end-to-end
    cfg2 = _base_cfg()
    cfg2.DATASET = "PandasetDataset"
    cfg2.DATA_PATH = str(save)
    cfg2.INFO_PATH = {"train": ["pandaset_infos_train.pkl"],
                      "test": ["pandaset_infos_train.pkl"]}
    ds, _, _ = build_dataloader(cfg2, ["car"], batch_size=1, training=True)
    p, b, n = ds.get_raw_scene(0)
    assert p.shape == (2, 4) and b.shape == (1, 7) and n[0] == "car"


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

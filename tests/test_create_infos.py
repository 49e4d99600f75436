"""tools/create_infos.py — the unified info-generation CLI.

Pins the KITTI path end-to-end as a subprocess: raw file tree in, info pkls
+ GT database out, and the generated infos load back through KittiDataset.
(The nuScenes/Waymo generation functions have their own fixture tests in
test_nuscenes_adapter.py / test_waymo_tfrecord.py; this covers the CLI
plumbing and the devkit-gated errors.)
"""

import os
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

CALIB_TXT = "\n".join([
    "P0: 7e2 0 6e2 0 0 7e2 1.8e2 0 0 0 1 0",
    "P1: 7e2 0 6e2 0 0 7e2 1.8e2 0 0 0 1 0",
    "P2: 721.54 0 609.56 44.86 0 721.54 172.85 0.22 0 0 1 0.0027",
    "P3: 721.54 0 609.56 -339.52 0 721.54 172.85 2.2 0 0 1 0.0027",
    "R0_rect: 0.9999 0.0098 -0.0074 -0.0098 0.9999 -0.0043 0.0074 0.0043 0.9999",
    "Tr_velo_to_cam: 7.5e-3 -0.9999 -6e-4 -4e-3 1.4e-2 7e-4 -0.9998 -7.6e-2 "
    "0.9998 7.5e-3 1.4e-2 -0.27",
])
LABEL_TXT = (
    "Car 0.00 0 -1.58 600.0 160.0 700.0 220.0 1.55 1.62 3.9 1.0 1.6 15.0 -1.55\n"
)


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_cli")
    for sub in ("velodyne", "calib", "label_2"):
        (root / sub).mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        idx = f"{i:06d}"
        pts = rng.uniform(-30, 30, (2000, 4)).astype(np.float32)
        pts[:, 2] = rng.uniform(-2, 1, 2000)
        cluster = rng.uniform(-0.5, 0.5, (64, 4)).astype(np.float32)
        cluster[:, 0] += 15.0
        cluster[:, 1] -= 1.0
        np.concatenate([pts, cluster]).tofile(root / "velodyne" / f"{idx}.bin")
        (root / "calib" / f"{idx}.txt").write_text(CALIB_TXT)
        (root / "label_2" / f"{idx}.txt").write_text(LABEL_TXT)
    return root


def test_kitti_cli_end_to_end(raw_tree):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "create_infos.py"), "kitti",
         "--data_path", str(raw_tree), "--with_gt_db"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for fname in ("kitti_infos_train.pkl", "kitti_infos_val.pkl",
                  "kitti_dbinfos_train.pkl"):
        assert (raw_tree / fname).exists(), fname
    with open(raw_tree / "kitti_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 2
    assert infos[0]["annos"]["name"][0] == "Car"
    with open(raw_tree / "kitti_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert len(db["Car"]) == 2 and db["Car"][0]["num_points_in_gt"] > 20

    # the generated infos load back through the dataset
    from toda_tpu.config import EDict
    from toda_tpu.datasets import build_dataloader
    import yaml

    with open(REPO / "tools/cfgs/dataset_configs/synthetic_dataset.yaml") as f:
        cfg = EDict(yaml.safe_load(f))
    cfg.DATASET = "KittiDataset"
    cfg.DATA_PATH = str(raw_tree)
    cfg.INFO_PATH = {"train": ["kitti_infos_train.pkl"],
                     "test": ["kitti_infos_val.pkl"]}
    cfg.POINT_CLOUD_RANGE = [-40.0, -40.0, -3.0, 40.0, 40.0, 1.0]
    cfg.DATA_PROCESSOR[2].NUM_POINTS = {"train": 1024, "test": 1024}
    ds, loader, _ = build_dataloader(cfg, ["Car"], batch_size=1, training=True)
    assert len(ds) == 2
    batch = next(iter(loader))
    assert batch["points"].shape == (1, 1024, 4)


def test_lyft_cli_fails_cleanly_without_tables(raw_tree):
    # lyft info-gen is devkit-free (JSON tables); on a tree with no tables the
    # CLI must fail with a missing-file error, not import a devkit
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "create_infos.py"), "lyft",
         "--data_path", str(raw_tree)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode != 0
    assert "lyft_dataset_sdk" not in out.stderr
    assert "No such file" in out.stderr or "FileNotFoundError" in out.stderr


def _write_fake_nuscenes(root):
    """Minimal raw nuScenes JSON tables + lidar bins (mirrors the geometry of
    tests/test_nuscenes_adapter.py::test_devkit_free_info_generation: ego at
    (100,50) yaw +90deg, sensor +1m along ego-x, one car 10 m ahead)."""
    import json

    version = "v1.0-mini"
    base = root / version
    base.mkdir(parents=True)
    q_yaw90 = [float(np.cos(np.pi / 4)), 0, 0, float(np.sin(np.pi / 4))]
    q_id = [1.0, 0, 0, 0]

    def write(name, rows):
        (base / f"{name}.json").write_text(json.dumps(rows))

    write("scene", [{"token": "sc0", "name": "scene-0061"}])
    write("sensor", [{"token": "se0", "channel": "LIDAR_TOP",
                      "modality": "lidar"}])
    write("calibrated_sensor", [{"token": "cs0", "sensor_token": "se0",
                                 "translation": [1.0, 0.0, 2.0],
                                 "rotation": q_id}])
    write("ego_pose", [{"token": "ep0", "translation": [100.0, 50.0, 0.0],
                        "rotation": q_yaw90}])
    write("sample", [{"token": "s0", "scene_token": "sc0",
                      "timestamp": 1_000_000}])
    write("sample_data", [
        {"token": "sd0", "sample_token": "s0", "is_key_frame": True,
         "calibrated_sensor_token": "cs0", "ego_pose_token": "ep0",
         "timestamp": 1_000_000, "filename": "lidar0.bin", "prev": "",
         "next": ""}])
    write("category", [{"token": "cat_car", "name": "vehicle.car"}])
    write("instance", [{"token": "inst0", "category_token": "cat_car"}])
    write("sample_annotation", [
        {"token": "a0", "sample_token": "s0", "instance_token": "inst0",
         "category_token": "cat_car", "translation": [100.0, 60.0, 1.0],
         "rotation": q_yaw90, "size": [2.0, 4.5, 1.7],
         "num_lidar_pts": 42, "prev": "", "next": ""}])
    # lidar bin (x, y, z, intensity, ring) — a cluster at the box's sensor
    # frame location (9, 0, z~-1) plus background
    rng = np.random.RandomState(0)
    pts = rng.uniform(-20, 20, (500, 5)).astype(np.float32)
    cluster = np.zeros((80, 5), np.float32)
    cluster[:, 0] = 9.0 + rng.uniform(-1.5, 1.5, 80)
    cluster[:, 1] = rng.uniform(-0.8, 0.8, 80)
    cluster[:, 2] = rng.uniform(-1.5, 0.0, 80)
    np.concatenate([pts, cluster]).tofile(root / "lidar0.bin")
    return root


def test_nuscenes_cli_with_gt_db(tmp_path):
    root = _write_fake_nuscenes(tmp_path)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "create_infos.py"), "nuscenes",
         "--data_path", str(root), "--version", "v1.0-mini",
         "--max_sweeps", "3", "--with_gt_db", "--classes", "car",
         "--sub_db_percents", "100"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    with open(root / "nuscenes_infos_3sweeps_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 1 and infos[0]["gt_names"][0] == "car"
    with open(root / "nuscenes_dbinfos_3sweeps.pkl", "rb") as f:
        db = pickle.load(f)
    assert len(db["car"]) == 1 and db["car"][0]["num_points_in_gt"] > 20
    assert (root / "nuscenes_dbinfos_3sweeps_100pct.pkl").exists()


def test_waymo_cli_with_gt_db(tmp_path):
    from tests.test_waymo_tfrecord import enc_frame, enc_label, make_range_image
    from toda_tpu.datasets.waymo import tfrecord_io as tio

    ri = make_range_image()
    labels = [enc_label(1, [5.0, 1.0, 0.5, 4.5, 2.0, 1.6, 0.3], num_pts=25)]
    frames = [enc_frame(ri, labels, ts=1000 + i) for i in range(2)]
    raw = tmp_path / "raw"
    raw.mkdir()
    tio.write_tfrecords(raw / "segment-0001.tfrecord", frames)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "create_infos.py"), "waymo",
         "--data_path", str(raw), "--save_path", str(tmp_path),
         "--with_gt_db", "--classes", "Vehicle"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    with open(tmp_path / "waymo_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 2
    assert (tmp_path / "waymo_processed_data" / "segment-0001" / "0000.npy").exists()
    with open(tmp_path / "waymo_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert len(db["Vehicle"]) == 2  # one car per frame

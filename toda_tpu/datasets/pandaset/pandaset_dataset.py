"""Pandaset dataset adapter.

Reference: pcdet/datasets/pandaset/pandaset_dataset.py:52-446. The reference
reads raw sequence frames through the pandaset devkit at __getitem__ time;
here a devkit-free info-generation step precomputes ego-frame points to
npy and stores ego-frame gt boxes in the infos, so training needs no raw reads —
the same split the nuScenes/Waymo adapters use.

Info contract per frame:
    sequence, frame_idx, lidar_path (npy, ego frame, (N, 4) xyzi),
    gt_boxes (M, 7) ego frame (x fwd, z up, yaw ccw from +x),
    gt_names (M,), zrot_world_to_ego (float), pose (10,) numpy pose
    [px py pz qw qx qy qz] padded — kept so predictions can be taken back to
    the world frame (reference :256-357).
"""

import json
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class PandasetDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        self.pandaset_infos = []
        self.include_pandaset_infos(self.mode)

    def include_pandaset_infos(self, mode):
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            path = Path(info_path)
            if not path.is_absolute() and self.root_path is not None:
                path = Path(self.root_path) / info_path
            if not path.exists():
                if self.logger:
                    self.logger.warning("info path missing: %s", path)
                continue
            with open(path, "rb") as f:
                self.pandaset_infos.extend(pickle.load(f))
        if self.logger:
            self.logger.info("loaded %d Pandaset infos (%s)", len(self.pandaset_infos), mode)

    def __len__(self):
        return len(self.pandaset_infos)

    def get_raw_scene(self, index):
        info = self.pandaset_infos[index]
        path = Path(info["lidar_path"])
        if not path.is_absolute() and self.root_path is not None:
            path = Path(self.root_path) / info["lidar_path"]
        points = np.load(str(path)).astype(np.float32)
        gt_boxes = np.asarray(info.get("gt_boxes", np.zeros((0, 7))), np.float32)
        gt_names = np.asarray(info.get("gt_names", []))
        return points, gt_boxes, gt_names

    def __getitem__(self, index):
        info = self.pandaset_infos[index]
        points, gt_boxes, gt_names = self.get_raw_scene(index)
        return self.prepare_data(
            {
                "points": points,
                "gt_boxes": gt_boxes,
                "gt_names": gt_names,
                "frame_id": f"{info.get('sequence', 0)}_{info.get('frame_idx', index)}",
                "metadata": {
                    "zrot_world_to_ego": info.get("zrot_world_to_ego", 0.0),
                    "pose": info.get("pose", np.zeros(7, np.float32)),
                },
            }
        )

    def evaluation(self, det_annos, class_names, eval_metric=None, **kwargs):
        """Pandaset has no official benchmark; the reference returns an empty
        result (:437-444). A kitti-style AP is offered for experimentation."""
        if (eval_metric or kwargs.get("eval_metric")) == "kitti":
            from ...utils.kitti_eval_native import kitti_eval

            gts = [
                {
                    "boxes_lidar": np.asarray(
                        i.get("gt_boxes", np.zeros((0, 7))), np.float32
                    )[:, :7],
                    "name": np.asarray([str(n).lower() for n in i.get("gt_names", [])]),
                }
                for i in self.pandaset_infos
            ]
            det_annos = [
                dict(d, name=np.asarray([str(n).lower() for n in d["name"]]))
                for d in det_annos
            ]
            return kitti_eval(det_annos, gts, [c.lower() for c in class_names])
        if self.logger:
            self.logger.warning(
                "No official Pandaset evaluation exists; returning empty results "
                "(reference pandaset_dataset.py:437-444)."
            )
        return "", {}


def quaternion_to_yaw(qw, qx, qy, qz):
    """Heading (z rotation) of a quaternion, reference pose convention."""
    return np.arctan2(2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz))


def lidar_points_to_ego(points, pose):
    """World -> ego: R(q)^T @ (p - t) (the pandaset devkit's
    geometry.lidar_points_to_ego, re-derived devkit-free). pose is the raw
    poses.json dict {position: {x,y,z}, heading: {w,x,y,z}}."""
    from ..nuscenes.nuscenes_utils import quat_to_rot

    t = np.asarray(
        [pose["position"]["x"], pose["position"]["y"], pose["position"]["z"]],
        np.float64,
    )
    h = pose["heading"]
    r = quat_to_rot([h["w"], h["x"], h["y"], h["z"]])
    return (np.asarray(points, np.float64) - t) @ r


def _pandaset_frame_to_normative(world_points, intensity, cuboids, pose,
                                 training_categories=None, lidar_device=0):
    """One frame's world-frame points + cuboid table -> normative ego frame.

    Re-derivation of the reference conversion (pandaset_dataset.py:150-255):
    Pandaset ego axes are x-right / y-front / z-up; normative axes are
    x-forward / y-left / z-up, so (x, y) -> (y, -x). Cuboid dims swap
    dx<->dy under the same axis change; yaws shift by zrot_world_to_ego
    (the world->ego z rotation from the transformed y axis), with the
    negligible-pitch assumption the reference documents.
    """
    ego_points = lidar_points_to_ego(world_points[:, :3], pose)
    ego_points = ego_points[:, [1, 0, 2]]
    ego_points[:, 1] = -ego_points[:, 1]
    points = np.concatenate(
        [ego_points, np.asarray(intensity, np.float64).reshape(-1, 1) / 255.0],
        axis=1,
    ).astype(np.float32)

    yaxis = lidar_points_to_ego(np.asarray([[0.0, 0, 0], [0, 1.0, 0]]), pose)
    yaxis = yaxis[1] - yaxis[0]
    zrot_world_to_ego = float(np.arctan2(-yaxis[0], yaxis[1]))

    xs, ys, zs, dxs, dys, dzs, yaws, labels = cuboids
    centers = np.stack([xs, ys, zs], axis=1).reshape(-1, 3)
    ego_centers = lidar_points_to_ego(centers, pose)
    ego_boxes = np.stack(
        [
            ego_centers[:, 1], -ego_centers[:, 0], ego_centers[:, 2],
            np.asarray(dys, np.float64), np.asarray(dxs, np.float64),
            np.asarray(dzs, np.float64),
            np.asarray(yaws, np.float64) + zrot_world_to_ego,
        ],
        axis=1,
    ).astype(np.float32) if len(xs) else np.zeros((0, 7), np.float32)
    if training_categories:
        labels = np.asarray([training_categories.get(l, l) for l in labels])
    return points, ego_boxes, np.asarray(labels), zrot_world_to_ego


def create_pandaset_infos(dataset_cfg, class_names, data_path, save_path,
                          sequences=None, logger=None):
    """Build infos + ego-frame npy point clouds from raw Pandaset sequences,
    devkit-free (the devkit is only a gzip-pickle/JSON loader).

    Raw layout per sequence <data_path>/<seq>/: lidar/NN.pkl.gz (pickled
    DataFrame with columns x y z i t d), lidar/poses.json (list of
    {position, heading} per frame), annotations/cuboids/NN.pkl.gz (DataFrame
    with position.*/dimensions.*/yaw/label/cuboids.sensor_id columns).
    Mirrors the reference conversion (pandaset_dataset.py:101-137, 139-255):
    device filtering (LIDAR_DEVICE, default 0 = mechanical 360deg), world ->
    ego via the frame's lidar pose, pandaset-ego -> normative axis swap,
    intensity / 255. Writes <save_path>/pandaset_processed/<seq>/NN.npy and
    pandaset_infos_{train,val}.pkl (name-ordered 80/20 sequence split unless
    dataset_cfg.SEQUENCES gives {'train': [...], 'test'/'val': [...]}).
    """
    import gzip

    import pandas as pd

    data_path = Path(data_path)
    save_path = Path(save_path)
    device = int(dataset_cfg.get("LIDAR_DEVICE", 0)) if dataset_cfg else 0
    training_categories = dict(dataset_cfg.get("TRAINING_CATEGORIES", {}) or {}) \
        if dataset_cfg else {}
    if sequences is None:
        sequences = sorted(
            p.name for p in data_path.iterdir()
            if p.is_dir() and (p / "lidar").is_dir()
        )
    split_cfg = dict(dataset_cfg.get("SEQUENCES", {}) or {}) if dataset_cfg else {}
    if split_cfg:
        splits = {
            "train": [str(s) for s in split_cfg.get("train", [])],
            "val": [str(s) for s in
                    (split_cfg.get("val") or split_cfg.get("test") or [])],
        }
    else:
        cut = max(1, int(len(sequences) * 0.8)) if sequences else 0
        splits = {"train": sequences[:cut], "val": sequences[cut:]}

    def read_pickle(path):
        # pandas read_pickle handles .gz transparently; keep an explicit
        # gzip fallback for plain-pickled fixtures
        try:
            return pd.read_pickle(path)
        except Exception:
            with gzip.open(path, "rb") as f:
                return pickle.load(f)

    train_infos, val_infos = [], []
    for seq in sequences:
        seq_dir = data_path / seq
        with open(seq_dir / "lidar" / "poses.json") as f:
            poses = json.load(f)
        frame_files = sorted((seq_dir / "lidar").glob("*.pkl*"))
        out_dir = save_path / "pandaset_processed" / seq
        out_dir.mkdir(parents=True, exist_ok=True)
        for frame_file in frame_files:
            frame_idx = int(frame_file.name.split(".")[0])
            lidar = read_pickle(frame_file)
            if device != -1 and "d" in lidar.columns:
                lidar = lidar[lidar["d"] == device]
            world = lidar[["x", "y", "z"]].to_numpy(np.float64)
            intensity = lidar["i"].to_numpy(np.float64)

            cub_file = seq_dir / "annotations" / "cuboids" / frame_file.name
            if cub_file.exists():
                cub = read_pickle(cub_file)
                if device != -1 and "cuboids.sensor_id" in cub.columns:
                    cub = cub[cub["cuboids.sensor_id"] != 1 - device]
                cuboids = (
                    cub["position.x"].to_numpy(), cub["position.y"].to_numpy(),
                    cub["position.z"].to_numpy(), cub["dimensions.x"].to_numpy(),
                    cub["dimensions.y"].to_numpy(), cub["dimensions.z"].to_numpy(),
                    cub["yaw"].to_numpy(), cub["label"].to_numpy(),
                )
            else:
                z = np.zeros(0)
                cuboids = (z, z, z, z, z, z, z, np.asarray([], dtype=object))

            points, gt_boxes, gt_names, zrot = _pandaset_frame_to_normative(
                world, intensity, cuboids, poses[frame_idx],
                training_categories=training_categories, lidar_device=device,
            )
            npy_path = out_dir / f"{frame_idx:02d}.npy"
            np.save(npy_path, points)
            pose = poses[frame_idx]
            info = {
                "sequence": seq,
                "frame_idx": frame_idx,
                "lidar_path": str(npy_path.relative_to(save_path)),
                "gt_boxes": gt_boxes,
                "gt_names": gt_names,
                "zrot_world_to_ego": zrot,
                "pose": np.asarray(
                    [pose["position"]["x"], pose["position"]["y"],
                     pose["position"]["z"], pose["heading"]["w"],
                     pose["heading"]["x"], pose["heading"]["y"],
                     pose["heading"]["z"]], np.float32),
            }
            (train_infos if seq in splits["train"] else val_infos).append(info)
        if logger:
            logger.info("sequence %s: %d frames", seq, len(frame_files))

    with open(save_path / "pandaset_infos_train.pkl", "wb") as f:
        pickle.dump(train_infos, f)
    with open(save_path / "pandaset_infos_val.pkl", "wb") as f:
        pickle.dump(val_infos, f)
    if logger:
        logger.info(
            "pandaset infos: %d train, %d val", len(train_infos), len(val_infos)
        )
    return train_infos, val_infos

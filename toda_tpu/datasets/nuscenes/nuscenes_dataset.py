"""nuScenes dataset adapter (info-pkl driven).

Reference: pcdet/datasets/nuscenes/nuscenes_dataset.py:13-557 + nuscenes_utils.py.
Info schema (identical keys so infos produced by OpenPCDet tooling load
directly): each info dict carries
    'lidar_path', 'token', 'sweeps' [{lidar_path, transform_matrix, time_lag}],
    'gt_boxes' (N, 7 or 9 with velocity), 'gt_names', 'num_lidar_pts'.

Covered here: multi-sweep loading with time-lag channel, class-balanced
resampling (CBGS), SHIFT_COOR, native nuScenes-protocol evaluation (mAP/NDS —
toda_tpu/utils/nuscenes_eval_native.py, devkit-free), percentage-subset GT
database creation for SSDA (create_sub_groundtruth_database). Info *generation*
from raw nuScenes needs the devkit and is gated with a clear error.
"""

import pickle
from pathlib import Path

import numpy as np

from ...utils import box_utils
from ..dataset import DatasetTemplate


class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        self.infos = []
        self.max_sweeps = int(dataset_cfg.get("MAX_SWEEPS", 1))
        self.shift_coor = dataset_cfg.get("SHIFT_COOR", None)
        self.include_nuscenes_data(self.mode)
        pct = float(dataset_cfg.get("LABELED_PERCENTAGE", 100.0))
        if self.training and pct < 100.0 and len(self.infos):
            # SSDA labeled-fraction split: deterministic percentage subset of
            # the train frames (reference's ssda3d_centerpoint_* configs pair
            # with percentage info files; here the subset is drawn seeded)
            n = max(int(round(len(self.infos) * pct / 100.0)), 1)
            sel = np.random.RandomState(3407).permutation(len(self.infos))[:n]
            self.infos = [self.infos[i] for i in sorted(sel)]
            if self.logger:
                self.logger.info("labeled subset: %d frames (%.1f%%)", n, pct)
        if self.training and dataset_cfg.get("BALANCED_RESAMPLING", False):
            self.infos = self.balanced_infos_resampling(self.infos)

    def include_nuscenes_data(self, mode):
        info_paths = self.dataset_cfg.INFO_PATH[mode]
        for info_path in info_paths:
            path = Path(info_path)
            if not path.is_absolute() and self.root_path is not None:
                path = Path(self.root_path) / info_path
            if not path.exists():
                if self.logger:
                    self.logger.warning("info path missing: %s", path)
                continue
            with open(path, "rb") as f:
                self.infos.extend(pickle.load(f))
        if self.logger:
            self.logger.info("loaded %d nuScenes infos (%s)", len(self.infos), mode)

    def balanced_infos_resampling(self, infos):
        """Class-balanced resampling (CBGS; reference nuscenes_dataset.py:64-96):
        duplicate frames so every class appears with equal frequency."""
        cls_infos = {name: [] for name in self.class_names}
        for info in infos:
            for name in set(info["gt_names"]):
                if name in cls_infos:
                    cls_infos[name].append(info)
        duplicated = sum(len(v) for v in cls_infos.values())
        if duplicated == 0:
            return infos
        frac = 1.0 / max(len(self.class_names), 1)
        sampled = []
        for v in cls_infos.values():
            if not v:
                continue
            ratio = frac * duplicated / len(v)
            sampled += np.random.choice(v, int(len(v) * ratio)).tolist()
        return sampled or infos

    def get_sweep(self, sweep_info):
        points = self._load_bin(sweep_info["lidar_path"])
        tm = np.asarray(sweep_info.get("transform_matrix", np.eye(4)), dtype=np.float32)
        pts_h = np.concatenate(
            [points[:, :3], np.ones((len(points), 1), np.float32)], axis=1
        )
        points[:, :3] = (pts_h @ tm.T)[:, :3]
        time_lag = float(sweep_info.get("time_lag", 0.0))
        times = np.full((len(points), 1), time_lag, dtype=np.float32)
        return points, times

    def _load_bin(self, lidar_path):
        path = Path(lidar_path)
        if not path.is_absolute() and self.root_path is not None:
            path = Path(self.root_path) / lidar_path
        num_feats = int(self.dataset_cfg.get("NUM_RAW_FEATURES", 5))
        points = np.fromfile(str(path), dtype=np.float32).reshape(-1, num_feats)
        return points[:, :4]  # x, y, z, intensity (drop ring index)

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        """Reference nuscenes_dataset.py:98-116: key frame + transformed sweeps,
        5th channel = time lag."""
        info = self.infos[index]
        points = self._load_bin(info["lidar_path"])
        times = np.zeros((len(points), 1), dtype=np.float32)
        all_pts, all_times = [points], [times]
        for sweep_info in info.get("sweeps", [])[: max_sweeps - 1]:
            p, t = self.get_sweep(sweep_info)
            all_pts.append(p)
            all_times.append(t)
        points = np.concatenate(all_pts)
        times = np.concatenate(all_times)
        points = np.concatenate([points, times], axis=1)
        if self.shift_coor:
            points[:, :3] += np.asarray(self.shift_coor, dtype=np.float32)
        return points

    def get_raw_scene(self, index):
        """Mixing protocol: (points, gt_boxes, gt_names)."""
        info = self.infos[index]
        points = self.get_lidar_with_sweeps(index, self.max_sweeps)
        gt_boxes = np.asarray(info.get("gt_boxes", np.zeros((0, 7))), dtype=np.float32)
        gt_names = np.asarray(info.get("gt_names", []))
        if self.shift_coor and len(gt_boxes):
            gt_boxes = gt_boxes.copy()
            gt_boxes[:, :3] += np.asarray(self.shift_coor, dtype=np.float32)
        if self.dataset_cfg.get("FILTER_MIN_POINTS_IN_GT", 0) and "num_lidar_pts" in info:
            keep = np.asarray(info["num_lidar_pts"]) >= self.dataset_cfg.FILTER_MIN_POINTS_IN_GT
            gt_boxes, gt_names = gt_boxes[keep], gt_names[keep]
        return points, gt_boxes, gt_names

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index):
        points, gt_boxes, gt_names = self.get_raw_scene(index)
        return self.prepare_data(
            {
                "points": points, "gt_boxes": gt_boxes, "gt_names": gt_names,
                "frame_id": self.infos[index].get("token", index),
            }
        )

    # most-frequent attribute per class on the nuScenes train split — the
    # reference's fallback when the velocity heuristic is inconclusive
    # (pcdet nuscenes_utils.py cls_attr_dist argmax, :43-120)
    DEFAULT_ATTRIBUTE = {
        "car": "vehicle.parked", "truck": "vehicle.parked",
        "construction_vehicle": "vehicle.parked", "trailer": "vehicle.parked",
        "bus": "vehicle.moving", "bicycle": "cycle.without_rider",
        "motorcycle": "cycle.without_rider", "pedestrian": "pedestrian.moving",
        "barrier": "", "traffic_cone": "",
    }

    @classmethod
    def assign_det_attributes(cls, anno):
        """Velocity-heuristic attribute assignment for the official AAE metric
        (reference nuscenes_utils.transform_det_annos_to_nusc_annos:436-453)."""
        boxes = np.asarray(anno["boxes_lidar"])
        names = np.asarray(anno["name"])
        attrs = []
        for i, name in enumerate(names):
            speed = (
                float(np.linalg.norm(boxes[i, 7:9])) if boxes.shape[-1] >= 9 else 0.0
            )
            if speed > 0.2:
                if name in ("car", "construction_vehicle", "bus", "truck", "trailer"):
                    attr = "vehicle.moving"
                elif name in ("bicycle", "motorcycle"):
                    attr = "cycle.with_rider"
                else:
                    attr = None
            else:
                if name == "pedestrian":
                    attr = "pedestrian.standing"
                elif name == "bus":
                    attr = "vehicle.stopped"
                else:
                    attr = None
            attrs.append(attr if attr is not None else cls.DEFAULT_ATTRIBUTE.get(name, ""))
        return np.asarray(attrs)

    def evaluation(self, det_annos, class_names, **kwargs):
        """Native nuScenes-protocol mAP/NDS — full official formula incl. AVE
        (velocity box columns 7:9) and AAE (velocity-heuristic det attributes vs
        stored GT attributes). Reference defers to the devkit
        (nuscenes_dataset.py:314-368)."""
        from ...utils.nuscenes_eval_native import nuscenes_eval

        det_annos = [dict(a) for a in det_annos]
        for anno in det_annos:
            if "attribute" not in anno and "attribute_name" not in anno:
                anno["attribute"] = self.assign_det_attributes(anno)
        gt_annos = []
        for info in self.infos:
            boxes = np.asarray(info.get("gt_boxes", np.zeros((0, 7))), dtype=np.float32)
            if self.shift_coor and len(boxes):
                boxes = boxes.copy()
                boxes[:, :3] += np.asarray(self.shift_coor, dtype=np.float32)
            gt = {"boxes_lidar": boxes, "name": np.asarray(info.get("gt_names", []))}
            if "gt_attributes" in info:
                gt["attribute"] = np.asarray(info["gt_attributes"])
            gt_annos.append(gt)
        return nuscenes_eval(det_annos, gt_annos, class_names)

    # ---- info / database generation -----------------------------------------
    def create_groundtruth_database(self, used_classes=None, out_path=None):
        """GT database for copy-paste sampling (reference nuscenes tooling)."""
        used_classes = used_classes or self.class_names
        db = {c: [] for c in used_classes}
        for idx in range(len(self.infos)):
            points, gt_boxes, gt_names = self.get_raw_scene(idx)
            if not len(gt_boxes):
                continue
            member = box_utils.points_in_boxes_numpy(points, gt_boxes[:, :7])
            for j, name in enumerate(gt_names):
                if name not in db:
                    continue
                obj = points[member[j]].copy()
                obj[:, :3] -= gt_boxes[j, :3]
                db[name].append(
                    {
                        "name": name, "box3d_lidar": gt_boxes[j],
                        "points": obj, "num_points_in_gt": len(obj), "difficulty": 0,
                    }
                )
        if out_path:
            with open(out_path, "wb") as f:
                pickle.dump(db, f)
        return db

    def create_sub_groundtruth_database(self, percentage, seed=0, out_path=None):
        """Percentage subset of frames -> database (SSDA labeled-fraction splits;
        reference nuscenes_dataset.create_sub_groundtruth_database)."""
        rng = np.random.RandomState(seed)
        n = max(1, int(round(len(self.infos) * percentage)))
        subset = rng.permutation(len(self.infos))[:n]
        saved_infos = self.infos
        try:
            self.infos = [saved_infos[i] for i in subset]
            db = self.create_groundtruth_database(out_path=out_path)
        finally:
            self.infos = saved_infos
        return db, sorted(subset.tolist())


def create_nuscenes_infos(version, data_path, save_path, max_sweeps=10, **kwargs):
    """Info generation from raw nuScenes — devkit-free (the raw data is plain
    JSON tables; see nuscenes_utils.create_nuscenes_infos)."""
    from .nuscenes_utils import create_nuscenes_infos as _impl

    return _impl(version, data_path, save_path, max_sweeps=max_sweeps, **kwargs)

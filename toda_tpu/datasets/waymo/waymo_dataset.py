"""Waymo dataset adapter (per-sequence info pkls + npy point files).

Reference: pcdet/datasets/waymo/waymo_dataset.py:21-474 + waymo_utils.py (TFRecord
-> npy extraction) + waymo_eval.py (TF-metrics APH). The TFRecord extraction and
the official Waymo metrics need tensorflow + waymo_open_dataset, which are not in
this image — those entry points are import-gated; the adapter itself consumes the
already-extracted artifact layout (OpenPCDet convention):

    <root>/waymo_processed_data/<sequence_name>/{0000.npy, 0001.npy, ...}
    infos: {'point_cloud': {'lidar_sequence', 'sample_idx'},
            'annos': {'name', 'gt_boxes_lidar', 'num_points_in_gt', ...}}

Evaluation defaults to the KITTI-style rotated-IoU AP backend
(toda_tpu/utils/kitti_eval_native.py), mirroring the reference's
`kitti`-eval-metric mode for Waymo; the `waymo` mode requires the official TF
metrics package.
"""

import pickle
from pathlib import Path

import numpy as np

from ...utils import box_utils
from ..dataset import DatasetTemplate


class WaymoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        self.infos = []
        self.data_path = Path(self.root_path or ".") / dataset_cfg.get(
            "PROCESSED_DATA_TAG", "waymo_processed_data"
        )
        self.include_waymo_data(self.mode)

    def include_waymo_data(self, mode):
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            path = Path(info_path)
            if not path.is_absolute() and self.root_path is not None:
                path = Path(self.root_path) / info_path
            if not path.exists():
                if self.logger:
                    self.logger.warning("info path missing: %s", path)
                continue
            with open(path, "rb") as f:
                self.infos.extend(pickle.load(f))
        interval = int(self.dataset_cfg.get("SAMPLED_INTERVAL", {}).get(mode, 1) or 1)
        if interval > 1:
            self.infos = self.infos[::interval]
        if self.logger:
            self.logger.info("loaded %d Waymo infos (%s)", len(self.infos), mode)

    def get_lidar(self, sequence_name, sample_idx):
        path = self.data_path / sequence_name / f"{sample_idx:04d}.npy"
        points = np.load(str(path))  # (N, 6): x y z intensity elongation ts
        # reference keeps [x, y, z, intensity, elongation] and NLZ filtering
        return points[:, :5].astype(np.float32)

    def get_raw_scene(self, index):
        info = self.infos[index]
        pc = info["point_cloud"]
        points = self.get_lidar(pc["lidar_sequence"], pc["sample_idx"])
        annos = info.get("annos", {})
        gt_boxes = np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 7))), dtype=np.float32)
        gt_names = np.asarray(annos.get("name", []))
        if self.dataset_cfg.get("FILTER_MIN_POINTS_IN_GT", 0) and "num_points_in_gt" in annos:
            keep = (
                np.asarray(annos["num_points_in_gt"])
                >= self.dataset_cfg.FILTER_MIN_POINTS_IN_GT
            )
            gt_boxes, gt_names = gt_boxes[keep], gt_names[keep]
        return points, gt_boxes[:, :7], gt_names

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index):
        points, gt_boxes, gt_names = self.get_raw_scene(index)
        return self.prepare_data(
            {"points": points, "gt_boxes": gt_boxes, "gt_names": gt_names, "frame_id": index}
        )

    def evaluation(self, det_annos, class_names, eval_metric="kitti", **kwargs):
        gt_annos = []
        for info in self.infos:
            annos = info.get("annos", {})
            g = {
                "boxes_lidar": np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 7))))[:, :7],
                "name": np.asarray([str(n).lower() for n in annos.get("name", [])]),
            }
            for k in ("difficulty", "num_points_in_gt"):
                if k in annos:
                    g[k] = np.asarray(annos[k])
            gt_annos.append(g)
        det_annos = [
            dict(d, name=np.asarray([str(n).lower() for n in d["name"]])) for d in det_annos
        ]
        if eval_metric == "waymo":
            # native AP/APH (replaces the reference's TF detection_metrics op;
            # toda_tpu/utils/waymo_eval_native.py)
            from ...utils.waymo_eval_native import waymo_eval

            return waymo_eval(det_annos, gt_annos, [c.lower() for c in class_names])
        from ...utils.kitti_eval_native import kitti_eval

        return kitti_eval(det_annos, gt_annos, [c.lower() for c in class_names])

    def create_groundtruth_database(self, used_classes=None, out_path=None):
        used_classes = used_classes or self.class_names
        db = {c: [] for c in used_classes}
        for idx in range(len(self.infos)):
            points, gt_boxes, gt_names = self.get_raw_scene(idx)
            if not len(gt_boxes):
                continue
            member = box_utils.points_in_boxes_numpy(points, gt_boxes)
            for j, name in enumerate(gt_names):
                if name not in db:
                    continue
                obj = points[member[j]].copy()
                obj[:, :3] -= gt_boxes[j, :3]
                db[name].append(
                    {
                        "name": name, "box3d_lidar": gt_boxes[j], "points": obj,
                        "num_points_in_gt": len(obj), "difficulty": 0,
                    }
                )
        if out_path:
            with open(out_path, "wb") as f:
                pickle.dump(db, f)
        return db


def create_waymo_infos(raw_data_path, save_path, **kwargs):
    """TFRecord -> npy + info extraction — requires tensorflow + waymo_open_dataset."""
    try:
        import tensorflow  # noqa
        from waymo_open_dataset import dataset_pb2  # noqa
    except ImportError as e:
        raise ImportError(
            "waymo info generation needs tensorflow + waymo_open_dataset; "
            "precomputed OpenPCDet-style infos/npy files load without them"
        ) from e
    raise NotImplementedError("port the TFRecord traversal when TF is available")

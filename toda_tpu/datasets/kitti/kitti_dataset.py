"""KITTI dataset adapter (info-pkl driven, lidar-frame boxes).

Reference: pcdet/datasets/kitti/kitti_dataset.py:13-491 (+ calibration_kitti,
object3d_kitti). Info schema kept OpenPCDet-compatible: each info carries
'point_cloud': {'lidar_idx'}, and 'annos': {'name', 'gt_boxes_lidar',
'difficulty', 'num_points_in_gt', ...}. Camera-frame geometry (calib, image
projections, FOV crops) applies to camera models (CaDDN) and info generation —
the lidar detection path here consumes lidar-frame boxes directly; evaluation is
the native KITTI-protocol R40 AP (toda_tpu/utils/kitti_eval_native.py).
"""

import pickle
from pathlib import Path

import numpy as np

from ...utils import box_utils
from ..dataset import DatasetTemplate


class KittiDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        self.infos = []
        self.include_kitti_data(self.mode)

    def include_kitti_data(self, mode):
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
        if self.logger:
            self.logger.info("loaded %d KITTI infos (%s)", len(self.infos), mode)

    def get_lidar(self, lidar_idx):
        path = Path(self.root_path) / "velodyne" / f"{lidar_idx}.bin"
        return np.fromfile(str(path), dtype=np.float32).reshape(-1, 4)

    def get_raw_scene(self, index):
        info = self.infos[index]
        points = self.get_lidar(info["point_cloud"]["lidar_idx"])
        annos = info.get("annos", {})
        gt_boxes = np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 7))), dtype=np.float32)
        gt_names = np.asarray(annos.get("name", []))
        keep = gt_names != "DontCare"
        return points, gt_boxes[keep[: len(gt_boxes)]], gt_names[keep]

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index):
        points, gt_boxes, gt_names = self.get_raw_scene(index)
        return self.prepare_data(
            {
                "points": points, "gt_boxes": gt_boxes, "gt_names": gt_names,
                "frame_id": self.infos[index]["point_cloud"]["lidar_idx"],
            }
        )

    def evaluation(self, det_annos, class_names, **kwargs):
        from ...utils.kitti_eval_native import kitti_eval

        gt_annos = []
        for info in self.infos:
            annos = info.get("annos", {})
            names = np.asarray(annos.get("name", []))
            keep = names != "DontCare"
            boxes = np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 7))))
            gt_annos.append(
                {
                    "boxes_lidar": boxes[keep[: len(boxes)]],
                    "name": names[keep],
                    "difficulty": np.asarray(
                        annos.get("difficulty", np.zeros(keep.sum()))
                    )[: keep.sum()],
                }
            )
        # KITTI class names are capitalized in annos; detector emits lowercase
        norm = lambda arr: np.asarray([str(n).lower() for n in arr])
        for g in gt_annos:
            g["name"] = norm(g["name"])
        det_annos = [dict(d, name=norm(d["name"])) for d in det_annos]
        return kitti_eval(det_annos, gt_annos, [c.lower() for c in class_names])

    def create_groundtruth_database(self, used_classes=None, out_path=None):
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
                        "name": name, "box3d_lidar": gt_boxes[j], "points": obj,
                        "num_points_in_gt": len(obj), "difficulty": 0,
                    }
                )
        if out_path:
            with open(out_path, "wb") as f:
                pickle.dump(db, f)
        return db

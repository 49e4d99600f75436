"""Lyft Level-5 dataset adapter.

Reference: pcdet/datasets/lyft/lyft_dataset.py:13-250 (+ lyft_utils.py and
lyft_mAP_eval/lyft_eval.py). Same info-pkl contract as the nuScenes adapter:
each info carries lidar_path, sweeps [{lidar_path, transform_matrix,
time_lag}], gt_boxes (N, 7(+2)), gt_names, num_lidar_pts. Info generation,
loading and evaluation are all devkit-free (Lyft raw data is the nuScenes
JSON-table schema; see create_lyft_infos):

  * eval_metric 'kitti' -> native official-protocol KITTI AP
    (toda_tpu/utils/kitti_eval_native.py)
  * eval_metric 'lyft'  -> native Lyft mAP: per-class AP averaged over an IoU
    threshold list (reference lyft_mAP_eval/lyft_eval.py:get_average_precisions,
    BEV-center greedy matching by score with all-point PR integration)
"""

import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class LyftDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        self.infos = []
        self.max_sweeps = int(dataset_cfg.get("MAX_SWEEPS", 1))
        self.include_lyft_data(self.mode)

    def include_lyft_data(self, mode):
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
            self.logger.info("loaded %d Lyft infos (%s)", len(self.infos), mode)

    @staticmethod
    def remove_ego_points(points, center_radius=1.0):
        # reference lyft_dataset.py:38-40
        mask = ~(
            (np.abs(points[:, 0]) < center_radius)
            & (np.abs(points[:, 1]) < center_radius)
        )
        return points[mask]

    def _load_bin(self, lidar_path):
        path = Path(lidar_path)
        if not path.is_absolute() and self.root_path is not None:
            path = Path(self.root_path) / lidar_path
        num_feats = int(self.dataset_cfg.get("NUM_RAW_FEATURES", 5))
        pts = np.fromfile(str(path), dtype=np.float32)
        pts = pts.reshape(-1, num_feats)[:, :4]
        return pts

    def get_sweep(self, sweep_info):
        points = self.remove_ego_points(self._load_bin(sweep_info["lidar_path"]))
        tm = np.asarray(sweep_info.get("transform_matrix", np.eye(4)), np.float32)
        pts_h = np.concatenate(
            [points[:, :3], np.ones((len(points), 1), np.float32)], axis=1
        )
        points = points.copy()
        points[:, :3] = (pts_h @ tm.T)[:, :3]
        times = np.full(
            (len(points), 1), float(sweep_info.get("time_lag", 0.0)), np.float32
        )
        return points, times

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        info = self.infos[index]
        points = self.remove_ego_points(self._load_bin(info["lidar_path"]))
        times = np.zeros((len(points), 1), np.float32)
        all_pts, all_times = [points], [times]
        for sweep_info in info.get("sweeps", [])[: max_sweeps - 1]:
            p, t = self.get_sweep(sweep_info)
            all_pts.append(p)
            all_times.append(t)
        points = np.concatenate(all_pts)
        times = np.concatenate(all_times)
        return np.concatenate([points, times], axis=1)

    def get_raw_scene(self, index):
        """Mixing protocol: (points, gt_boxes, gt_names)."""
        info = self.infos[index]
        points = self.get_lidar_with_sweeps(index, self.max_sweeps)
        gt_boxes = np.asarray(info.get("gt_boxes", np.zeros((0, 7))), np.float32)
        gt_names = np.asarray(info.get("gt_names", []))
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

    # ---- evaluation --------------------------------------------------------
    def _gt_annos(self):
        gts = []
        for info in self.infos:
            gts.append(
                {
                    "boxes_lidar": np.asarray(
                        info.get("gt_boxes", np.zeros((0, 7))), np.float32
                    )[:, :7],
                    "name": np.asarray([str(n).lower() for n in info.get("gt_names", [])]),
                }
            )
        return gts

    def evaluation(self, det_annos, class_names, eval_metric=None, **kwargs):
        eval_metric = eval_metric or kwargs.get("eval_metric", "lyft")
        det_annos = [
            dict(d, name=np.asarray([str(n).lower() for n in d["name"]]))
            for d in det_annos
        ]
        cls = [c.lower() for c in class_names]
        if eval_metric == "kitti":
            from ...utils.kitti_eval_native import kitti_eval

            return kitti_eval(det_annos, self._gt_annos(), cls)
        thresholds = [
            float(t) for t in self.dataset_cfg.get("EVAL_LYFT_IOU_LIST", [0.5, 0.55, 0.6])
        ]
        return lyft_map_eval(det_annos, self._gt_annos(), cls, thresholds)

    def create_groundtruth_database(self, used_classes=None, out_path=None):
        """Crop per-gt point clouds for the GT sampler (reference :206-249)."""
        from ...utils.box_utils import points_in_boxes_numpy

        used = used_classes or self.class_names
        db = {n: [] for n in used}
        for idx in range(len(self)):
            points, gt_boxes, gt_names = self.get_raw_scene(idx)
            if not len(gt_boxes):
                continue
            masks = points_in_boxes_numpy(points[:, :3], gt_boxes[:, :7])
            for i, name in enumerate(gt_names):
                if name not in db:
                    continue
                obj_pts = points[masks[:, i]].copy()
                obj_pts[:, :3] -= gt_boxes[i, :3]
                db[name].append(
                    {"name": name, "box3d_lidar": gt_boxes[i, :7],
                     "points": obj_pts, "num_points_in_gt": len(obj_pts)}
                )
        if out_path is not None:
            with open(out_path, "wb") as f:
                pickle.dump(db, f)
        return db


def lyft_map_eval(det_annos, gt_annos, class_names, iou_thresholds):
    """Native Lyft mAP: per class, AP averaged over IoU thresholds.

    Matches the reference protocol's shape (lyft_mAP_eval/lyft_eval.py):
    detections sorted by score, greedily matched to unmatched gts of the same
    class when BEV rotated IoU >= threshold; AP = all-point precision-recall
    integration; the headline metric averages over classes and thresholds.
    """
    from ...utils.box_utils import boxes_bev_iou_cpu

    ap_dict = {}
    per_class = {c: [] for c in class_names}
    for thr in iou_thresholds:
        for c in class_names:
            scores, tps = [], []
            num_gt = 0
            for det, gt in zip(det_annos, gt_annos):
                g_mask = gt["name"] == c
                g_boxes = gt["boxes_lidar"][g_mask]
                num_gt += len(g_boxes)
                d_mask = det["name"] == c
                d_boxes = np.asarray(det["boxes_lidar"])[d_mask][:, :7]
                d_scores = np.asarray(det["score"])[d_mask]
                order = np.argsort(-d_scores)
                d_boxes, d_scores = d_boxes[order], d_scores[order]
                matched = np.zeros(len(g_boxes), bool)
                iou = (
                    boxes_bev_iou_cpu(d_boxes, g_boxes)
                    if len(d_boxes) and len(g_boxes)
                    else np.zeros((len(d_boxes), len(g_boxes)))
                )
                for di in range(len(d_boxes)):
                    best, best_j = thr, -1
                    for gj in range(len(g_boxes)):
                        if not matched[gj] and iou[di, gj] >= best:
                            best, best_j = iou[di, gj], gj
                    scores.append(d_scores[di])
                    tps.append(best_j >= 0)
                    if best_j >= 0:
                        matched[best_j] = True
            if num_gt == 0:
                ap = 0.0
            elif not scores:
                ap = 0.0
            else:
                order = np.argsort(-np.asarray(scores))
                tp = np.asarray(tps, np.float64)[order]
                cum_tp = np.cumsum(tp)
                recall = cum_tp / num_gt
                precision = cum_tp / (np.arange(len(tp)) + 1)
                # all-point interpolation
                for i in range(len(precision) - 2, -1, -1):
                    precision[i] = max(precision[i], precision[i + 1])
                ap = float(
                    np.sum(np.diff(np.concatenate([[0.0], recall])) * precision)
                )
            ap_dict[f"AP_{c}@{thr:.2f}"] = ap
            per_class[c].append(ap)
    for c in class_names:
        ap_dict[f"AP_{c}"] = float(np.mean(per_class[c])) if per_class[c] else 0.0
    ap_dict["mAP"] = float(np.mean([ap_dict[f"AP_{c}"] for c in class_names]))
    result_str = "\n".join(f"{k}: {v:.4f}" for k, v in ap_dict.items())
    return result_str, ap_dict


def create_lyft_infos(data_path, version="trainval", save_path=None,
                      split_scenes=None, max_sweeps=10, logger=None):
    """Devkit-free info generation from the raw Lyft Level-5 JSON tables.

    Lyft ships the nuScenes schema (scene / sample / sample_data / ego_pose /
    calibrated_sensor / sample_annotation / instance / category JSON tables),
    so the traversal reuses the devkit-free nuScenes table reader. Mirrors the
    reference procedure (lyft_dataset.py:251-307 + lyft_utils.py:91-224
    fill_trainval_infos) with the Lyft-specific conventions:
      * category names are already detection names (car, pedestrian, ...) —
        no general->detection remap;
      * no velocity channels — gt_boxes stay (N, 7);
      * splits come from <data_path>/ImageSets/{train,val}.txt scene-name
        lists when present (the reference's layout), else `split_scenes`,
        else a name-ordered 85/15 split.

    Layout: tables at <data_path>/<version>/data/*.json (the devkit's
    json_path) or directly at <data_path>/<version>/*.json.
    """
    from ..nuscenes.nuscenes_utils import NuScenesTables, fill_infos

    root = Path(data_path) / version
    json_dir = root / "data" if (root / "data" / "sample.json").exists() else root
    t = NuScenesTables(json_dir.parent, json_dir.name)

    if split_scenes is None:
        split_dir = Path(data_path) / "ImageSets"
        train_txt, val_txt = split_dir / "train.txt", split_dir / "val.txt"
        if train_txt.exists():
            split_scenes = {
                "train": [x.strip() for x in train_txt.read_text().splitlines() if x.strip()],
                "val": [x.strip() for x in val_txt.read_text().splitlines() if x.strip()]
                if val_txt.exists() else [],
            }
        else:
            names = sorted(s["name"] for s in t.rows["scene"])
            cut = int(len(names) * 0.85)
            split_scenes = {"train": names[:cut], "val": names[cut:]}
            if logger:
                logger.warning(
                    "no ImageSets split lists found; using a name-ordered "
                    "85/15 scene split"
                )

    train_infos, val_infos = fill_infos(
        t, split_scenes, max_sweeps=max_sweeps, name_map=None,
        with_velocity=False, with_attributes=False,
    )
    if logger:
        logger.info("lyft infos: %d train, %d val", len(train_infos), len(val_infos))
    if save_path is not None:
        save_path = Path(save_path)
        with open(save_path / "lyft_infos_train.pkl", "wb") as f:
            pickle.dump(train_infos, f)
        with open(save_path / "lyft_infos_val.pkl", "wb") as f:
            pickle.dump(val_infos, f)
    return train_infos, val_infos


def create_lyft_info(version, data_path, save_path, split, max_sweeps=10):
    """Reference-signature wrapper (lyft_dataset.py:251) over the devkit-free
    generator above. `split` is accepted for CLI compatibility; the split
    lists come from ImageSets (or the fallback name split)."""
    return create_lyft_infos(
        data_path, version=version, save_path=save_path, max_sweeps=max_sweeps
    )

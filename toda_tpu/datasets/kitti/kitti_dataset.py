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

    # ---- raw-file IO (reference kitti_dataset.py:60-150) --------------------

    def root_split_path(self):
        """KITTI layout root/<training|testing>/..., falling back to a flat
        root for pre-arranged fixtures."""
        split_dir = "testing" if self.dataset_cfg.get("DATA_SPLIT", {}).get(
            self.mode, "train"
        ) == "test" else "training"
        cand = Path(self.root_path) / split_dir
        return cand if cand.exists() else Path(self.root_path)

    def get_lidar(self, lidar_idx):
        path = self.root_split_path() / "velodyne" / f"{lidar_idx}.bin"
        return np.fromfile(str(path), dtype=np.float32).reshape(-1, 4)

    def get_calib(self, idx):
        from .calibration_kitti import Calibration

        return Calibration(str(self.root_split_path() / "calib" / f"{idx}.txt"))

    def get_label(self, idx):
        from .object3d_kitti import get_objects_from_label

        return get_objects_from_label(
            str(self.root_split_path() / "label_2" / f"{idx}.txt")
        )

    def get_image_shape(self, idx):
        """(H, W) — read from a sidecar shape file or the png header; falls
        back to the standard KITTI 375x1242 when no image tree exists."""
        p = self.root_split_path() / "image_2" / f"{idx}.png"
        if p.exists():
            import struct

            with open(p, "rb") as f:
                head = f.read(26)
            w, h = struct.unpack(">II", head[16:24])
            return np.asarray([h, w], dtype=np.int32)
        return np.asarray([375, 1242], dtype=np.int32)

    def get_road_plane(self, idx):
        p = self.root_split_path() / "planes" / f"{idx}.txt"
        if not p.exists():
            return None
        with open(p) as f:
            lines = f.readlines()
        plane = np.asarray([float(v) for v in lines[3].split()])
        if plane[1] > 0:
            plane = -plane
        return plane / np.linalg.norm(plane[:3])

    def get_image(self, lidar_idx, out_shape=None):
        """Load image_2/<idx>.png as float32 (H, W, 3) in [0, 1], padded
        bottom/right to `out_shape` for static batching (reference
        kitti_dataset.get_image + pcdet's pad-to-multiple convention)."""
        from PIL import Image

        path = self.root_split_path() / "image_2" / f"{lidar_idx}.png"
        img = np.asarray(Image.open(str(path)).convert("RGB"), dtype=np.float32) / 255.0
        if out_shape is not None:
            h, w = out_shape
            img = img[:h, :w]
            pad_h, pad_w = h - img.shape[0], w - img.shape[1]
            if pad_h or pad_w:
                img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
        return img

    def get_calib_matrices(self, info):
        """(trans_lidar_to_cam (4, 4), trans_cam_to_img (3, 4)) from the info's
        calib block — the two operators ImageVFE's frustum-to-voxel needs
        (reference calibration_kitti + f2v sampler)."""
        calib = info["calib"]
        v2c = np.asarray(calib["Tr_velo_to_cam"], np.float32).reshape(4, 4)
        r0 = np.asarray(calib["R0_rect"], np.float32).reshape(4, 4)
        p2 = np.asarray(calib["P2"], np.float32).reshape(4, 4)[:3]
        return (r0 @ v2c).astype(np.float32), p2.astype(np.float32)

    @staticmethod
    def get_fov_flag(pts_rect, img_shape, calib):
        """Points visible in the camera image (reference get_fov_flag)."""
        pts_img, depth = calib.rect_to_img(pts_rect)
        ok = (
            (pts_img[:, 0] >= 0) & (pts_img[:, 0] < img_shape[1])
            & (pts_img[:, 1] >= 0) & (pts_img[:, 1] < img_shape[0])
            & (depth >= 0)
        )
        return ok

    def get_raw_scene(self, index):
        info = self.infos[index]
        points = self.get_lidar(info["point_cloud"]["lidar_idx"])
        if self.dataset_cfg.get("FOV_POINTS_ONLY", False) and "calib" in info:
            from .calibration_kitti import Calibration

            calib = Calibration({
                "P2": info["calib"]["P2"][:3],
                "R0": info["calib"]["R0_rect"][:3, :3],
                "Tr_velo2cam": info["calib"]["Tr_velo_to_cam"][:3],
            })
            fov = self.get_fov_flag(
                calib.lidar_to_rect(points[:, :3]),
                info["image"]["image_shape"], calib,
            )
            points = points[fov]
        annos = info.get("annos", {})
        gt_boxes = np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 7))), dtype=np.float32)
        gt_names = np.asarray(annos.get("name", []))
        keep = gt_names != "DontCare"
        return points, gt_boxes[keep[: len(gt_boxes)]], gt_names[keep]

    # ---- info generation (reference kitti_dataset.get_infos :150-214) -------

    def get_infos(self, has_label=True, count_inside_pts=True, sample_id_list=None):
        """Build info dicts from the raw file tree (calib/label_2/velodyne).

        The reference parallelizes with a thread pool; this host has one core,
        so a plain loop is the same speed and simpler.
        """
        if sample_id_list is None:
            ids_file = self.root_split_path().parent / "ImageSets" / (
                self.dataset_cfg.get("DATA_SPLIT", {}).get(self.mode, "train") + ".txt"
            )
            if ids_file.exists():
                sample_id_list = [ln.strip() for ln in open(ids_file) if ln.strip()]
            else:
                sample_id_list = sorted(
                    p.stem for p in (self.root_split_path() / "velodyne").glob("*.bin")
                )
        infos = []
        for idx in sample_id_list:
            calib = self.get_calib(idx)
            info = {
                "point_cloud": {"num_features": 4, "lidar_idx": idx},
                "image": {"image_idx": idx, "image_shape": self.get_image_shape(idx)},
                "calib": {
                    "P2": np.vstack([calib.P2, [0.0, 0.0, 0.0, 1.0]]),
                    "R0_rect": np.block(
                        [[calib.R0, np.zeros((3, 1))], [np.zeros((1, 3)), np.ones((1, 1))]]
                    ).astype(np.float32),
                    "Tr_velo_to_cam": np.vstack([calib.V2C, [0.0, 0.0, 0.0, 1.0]]),
                },
            }
            if has_label:
                objs = self.get_label(idx)
                ann = {
                    "name": np.asarray([o.cls_type for o in objs]),
                    "truncated": np.asarray([o.truncation for o in objs]),
                    "occluded": np.asarray([o.occlusion for o in objs]),
                    "alpha": np.asarray([o.alpha for o in objs]),
                    "bbox": np.asarray([o.box2d for o in objs]).reshape(-1, 4),
                    "dimensions": np.asarray([[o.l, o.h, o.w] for o in objs]).reshape(-1, 3),
                    "location": np.asarray([o.loc for o in objs]).reshape(-1, 3),
                    "rotation_y": np.asarray([o.ry for o in objs]),
                    "score": np.asarray([o.score for o in objs]),
                    "difficulty": np.asarray([o.level for o in objs], np.int32),
                }
                num_obj = sum(1 for o in objs if o.cls_type != "DontCare")
                ann["index"] = np.asarray(
                    list(range(num_obj)) + [-1] * (len(objs) - num_obj), np.int32
                )
                loc = ann["location"][:num_obj]
                dims = ann["dimensions"][:num_obj]
                rots = ann["rotation_y"][:num_obj]
                loc_lidar = calib.rect_to_lidar(loc) if num_obj else loc
                l, h, w = dims[:, 0:1], dims[:, 1:2], dims[:, 2:3]
                if num_obj:
                    loc_lidar[:, 2] += h[:, 0] / 2
                ann["gt_boxes_lidar"] = np.concatenate(
                    [loc_lidar, l, w, h, -(np.pi / 2 + rots[:, None])], axis=1
                ).astype(np.float32)
                if count_inside_pts and num_obj:
                    points = self.get_lidar(idx)
                    member = box_utils.points_in_boxes_numpy(
                        points[:, :3], ann["gt_boxes_lidar"]
                    )
                    cnt = member.sum(axis=1)
                    ann["num_points_in_gt"] = np.concatenate(
                        [cnt, -np.ones(len(objs) - num_obj, dtype=cnt.dtype)]
                    )
                info["annos"] = ann
            infos.append(info)
        return infos

    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        """Detections -> KITTI-format annos (bbox/alpha/camera boxes), optional
        label-style txt dump (reference kitti_dataset.generate_prediction_dicts)."""
        from .calibration_kitti import Calibration

        annos = []
        for i, pd in enumerate(pred_dicts):
            mask = pd["pred_mask"].astype(bool)
            boxes = np.asarray(pd["pred_boxes"])[mask][:, :7]
            scores = np.asarray(pd["pred_scores"])[mask]
            labels = np.asarray(pd["pred_labels"])[mask].astype(int)
            names = np.asarray(
                [class_names[max(l - 1, 0)] for l in labels]
            )
            frame_id = batch_dict["frame_id"][i] if "frame_id" in batch_dict else i
            anno = {
                "name": names, "score": scores, "boxes_lidar": boxes,
                "frame_id": frame_id,
                "pred_labels": labels,
            }
            info = next(
                (
                    inf for inf in self.infos
                    if inf["point_cloud"]["lidar_idx"] == frame_id
                ),
                None,
            )
            if info is not None and "calib" in info and len(boxes):
                calib = Calibration({
                    "P2": info["calib"]["P2"][:3],
                    "R0": info["calib"]["R0_rect"][:3, :3],
                    "Tr_velo2cam": info["calib"]["Tr_velo_to_cam"][:3],
                })
                cam = box_utils.boxes3d_lidar_to_kitti_camera(boxes, calib)
                img = box_utils.boxes3d_kitti_camera_to_imageboxes(
                    cam, calib, image_shape=info["image"]["image_shape"]
                )
                anno.update({
                    "alpha": -np.arctan2(-boxes[:, 1], boxes[:, 0]) + cam[:, 6],
                    "bbox": img,
                    "dimensions": cam[:, 3:6],
                    "location": cam[:, 0:3],
                    "rotation_y": cam[:, 6],
                })
                if output_path is not None:
                    out = Path(output_path) / f"{frame_id}.txt"
                    out.parent.mkdir(parents=True, exist_ok=True)
                    with open(out, "w") as f:
                        for k in range(len(boxes)):
                            f.write(
                                "%s -1 -1 %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f "
                                "%.4f %.4f %.4f %.4f %.4f\n"
                                % (
                                    names[k], anno["alpha"][k], *img[k],
                                    cam[k, 4], cam[k, 5], cam[k, 3],
                                    *cam[k, 0:3], cam[k, 6], scores[k],
                                )
                            )
            annos.append(anno)
        return annos

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index):
        info = self.infos[index]
        points, gt_boxes, gt_names = self.get_raw_scene(index)
        data_dict = {
            "points": points, "gt_boxes": gt_boxes, "gt_names": gt_names,
            "frame_id": info["point_cloud"]["lidar_idx"],
        }
        # camera items for CaDDN (reference GET_ITEM_LIST
        # ['images', 'calib_matricies'], kitti_dataset.py __getitem__)
        item_list = self.dataset_cfg.get("GET_ITEM_LIST", ["points"])
        if "images" in item_list:
            shape = self.dataset_cfg.get("IMAGE_SHAPE", [384, 1248])
            data_dict["images"] = self.get_image(
                info["point_cloud"]["lidar_idx"], out_shape=tuple(shape)
            )
        if "calib_matricies" in item_list and "calib" in info:
            l2c, c2i = self.get_calib_matrices(info)
            data_dict["trans_lidar_to_cam"] = l2c
            data_dict["trans_cam_to_img"] = c2i
        return self.prepare_data(data_dict)

    def evaluation(self, det_annos, class_names, **kwargs):
        """Official-protocol eval: passes the FULL annos (incl. DontCare rows
        and occlusion/truncation/bbox metadata) so kitti_eval_native applies
        the per-difficulty ignore rules and DontCare absorption itself
        (reference kitti_dataset.py:356-380 + kitti_object_eval_python)."""
        from ...utils.kitti_eval_native import kitti_eval

        gt_annos = []
        for info in self.infos:
            annos = info.get("annos", {})
            names = np.asarray(annos.get("name", []))
            is_dc = names == "DontCare"
            boxes = np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 7))))
            # gt_boxes_lidar excludes DontCare rows; re-align with the name list
            boxes_full = np.zeros((len(names), 7), np.float32)
            boxes_full[~is_dc] = boxes[: int((~is_dc).sum())]
            g = {"boxes_lidar": boxes_full, "name": names}
            for k in ("bbox", "occluded", "truncated", "alpha", "difficulty"):
                if k in annos:
                    g[k] = np.asarray(annos[k])
            gt_annos.append(g)
        # KITTI class names are capitalized in annos; detector emits lowercase
        norm = lambda arr: np.asarray([str(n).lower() for n in arr])
        for g in gt_annos:
            g["name"] = np.asarray(
                [str(n) if str(n) == "DontCare" else str(n).lower() for n in g["name"]]
            )
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

"""Synthetic LiDAR scenes — the hermetic train/eval fixture.

The reference leans on nuScenes v1.0-mini as its de-facto smoke fixture
(SURVEY.md §4); with zero data egress we synthesize scenes instead: boxes placed
collision-free in the range, points sampled on box surfaces + ground clutter,
deterministic per (seed, index). Used by unit tests, the trainer smoke path, and
bench.py.
"""

import numpy as np

from ...utils import box_utils
from ..dataset import DatasetTemplate

DEFAULT_SIZES = {
    "car": (4.6, 1.95, 1.7),
    "pedestrian": (0.8, 0.7, 1.7),
    "cyclist": (1.8, 0.8, 1.6),
}


def make_scene(
    rng,
    class_names,
    pc_range,
    num_objects=(3, 10),
    points_per_object=(60, 400),
    num_background=2000,
    num_features=4,
    size_scale=1.0,
):
    """Returns (points (N, num_features), gt_boxes (M, 7), gt_names (M,))."""
    pc_range = np.asarray(pc_range, dtype=np.float32)
    n_obj = rng.randint(num_objects[0], num_objects[1] + 1)
    boxes, names = [], []
    tries = 0
    while len(boxes) < n_obj and tries < n_obj * 10:
        tries += 1
        cls = class_names[rng.randint(len(class_names))]
        base = DEFAULT_SIZES.get(cls, (4.0, 2.0, 1.6))
        dims = np.asarray(base) * size_scale * rng.uniform(0.85, 1.15, 3)
        margin = max(base[0], base[1])
        cx = rng.uniform(pc_range[0] + margin, pc_range[3] - margin)
        cy = rng.uniform(pc_range[1] + margin, pc_range[4] - margin)
        cz = rng.uniform(-1.2, -0.6) + dims[2] / 2
        yaw = rng.uniform(-np.pi, np.pi)
        cand = np.array([cx, cy, cz, *dims, yaw], dtype=np.float32)
        if boxes:
            iou = box_utils.boxes3d_nearest_bev_iou(cand[None, :7], np.stack(boxes)[:, :7])
            if iou.max() > 1e-3:
                continue
        boxes.append(cand)
        names.append(cls)
    gt_boxes = np.stack(boxes) if boxes else np.zeros((0, 7), np.float32)
    gt_names = np.asarray(names)

    pts = []
    for box in gt_boxes:
        n_pts = rng.randint(points_per_object[0], points_per_object[1] + 1)
        # surface-ish samples: uniform in box, pushed toward faces
        local = rng.uniform(-0.5, 0.5, (n_pts, 3))
        face = rng.randint(0, 3, n_pts)
        sign = rng.choice([-0.5, 0.5], n_pts)
        local[np.arange(n_pts), face] = sign * rng.uniform(0.9, 1.0, n_pts)
        local *= box[3:6]
        c, s = np.cos(box[6]), np.sin(box[6])
        x = local[:, 0] * c - local[:, 1] * s + box[0]
        y = local[:, 0] * s + local[:, 1] * c + box[1]
        z = local[:, 2] + box[2]
        feat = rng.uniform(0, 1, (n_pts, num_features - 3)).astype(np.float32)
        pts.append(np.concatenate([np.stack([x, y, z], 1).astype(np.float32), feat], 1))

    bg_xy = rng.uniform(pc_range[[0, 1]], pc_range[[3, 4]], (num_background, 2))
    bg_z = rng.normal(-1.6, 0.05, (num_background, 1))
    bg_feat = rng.uniform(0, 1, (num_background, num_features - 3))
    pts.append(np.concatenate([bg_xy, bg_z, bg_feat], 1).astype(np.float32))
    points = np.concatenate(pts, axis=0)
    return points, gt_boxes, gt_names


class SyntheticDataset(DatasetTemplate):
    """Deterministic synthetic scenes behind the standard DatasetTemplate API."""

    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg,
            class_names=class_names,
            training=training,
            root_path=root_path,
            logger=logger,
        )
        self.num_scenes = int(dataset_cfg.get("NUM_SCENES", 64))
        # TEST_SEED_OFFSET: seed shift applied in test mode (default 10_000 =
        # a disjoint val split). Setting it to 0 makes a test-mode loader
        # present the TRAIN scenes — the synthetic analog of the reference
        # pseudo-label configs pointing DATA_SPLIT.test at the train infos
        # (/root/reference/tools/cfgs/pseudo_labels/*.yaml), needed so pseudo
        # labels are generated for the same frames stage 2 reads back.
        test_offset = int(dataset_cfg.get("TEST_SEED_OFFSET", 10_000))
        self.seed = int(dataset_cfg.get("SEED", 0)) + (0 if training else test_offset)
        self.num_features = len(dataset_cfg.POINT_FEATURE_ENCODING.src_feature_list)
        self.scene_kwargs = dict(
            num_objects=tuple(dataset_cfg.get("NUM_OBJECTS", (3, 10))),
            num_background=int(dataset_cfg.get("NUM_BACKGROUND_POINTS", 2000)),
            # per-object point-count range — the synthetic analog of beam
            # density, used to fabricate a dense->sparse domain gap
            # (Waymo 64-beam -> nuScenes 32-beam) for SSDA experiments
            points_per_object=tuple(
                dataset_cfg.get("POINTS_PER_OBJECT", (60, 400))),
            # global object-size multiplier — the synthetic analog of the
            # Waymo->nuScenes size-statistics gap (US vs SG car sizes)
            size_scale=float(dataset_cfg.get("SIZE_SCALE", 1.0)),
        )

    def __len__(self):
        return self.num_scenes

    def get_raw_scene(self, index):
        rng = np.random.RandomState(self.seed + index)
        return make_scene(
            rng,
            self.class_names,
            self.point_cloud_range,
            num_features=self.num_features,
            **self.scene_kwargs,
        )

    def __getitem__(self, index):
        points, gt_boxes, gt_names = self.get_raw_scene(index)
        data_dict = {
            "points": points,
            "gt_boxes": gt_boxes,
            "gt_names": gt_names,
            "frame_id": index,
        }
        if self.dataset_cfg.get("WITH_CAMERA", False):
            img, l2c, c2i = self.render_camera(points)
            data_dict["images"] = img
            data_dict["trans_lidar_to_cam"] = l2c
            data_dict["trans_cam_to_img"] = c2i
        return self.prepare_data(data_dict=data_dict)

    def render_camera(self, points):
        """Fabricated forward-facing pinhole camera: z-buffered point splats
        over (depth, intensity, 1) channels, so objects in front of the
        sensor are visible in the image and CaDDN has real signal to learn
        from (the synthetic analog of the KITTI image path, VERDICT r3 #7).

        Camera frame: x_cam = -y_lidar (right), y_cam = -z_lidar (down),
        z_cam = x_lidar (forward). Returns (H, W, 3) image, 4x4 lidar->cam,
        3x4 cam->img.
        """
        h, w = [int(v) for v in self.dataset_cfg.get("CAMERA_IMAGE_SIZE", (96, 128))]
        f = float(self.dataset_cfg.get("CAMERA_FOCAL", w * 0.6))
        depth_max = float(self.dataset_cfg.get("CAMERA_DEPTH_MAX", 40.0))
        l2c = np.array(
            [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
            np.float32,
        )
        c2i = np.array(
            [[f, 0, w / 2.0, 0], [0, f, h / 2.0, 0], [0, 0, 1, 0]], np.float32
        )
        cam = points[:, :3] @ l2c[:3, :3].T
        z = cam[:, 2]
        vis = z > 1.0
        u = (f * cam[vis, 0] / z[vis] + w / 2.0).astype(np.int32)
        v = (f * cam[vis, 1] / z[vis] + h / 2.0).astype(np.int32)
        inb = (u >= 0) & (u < w) & (v >= 0) & (v < h)
        u, v, zv = u[inb], v[inb], z[vis][inb]
        inten = points[vis, 3][inb] if points.shape[1] > 3 else np.ones_like(zv)
        img = np.zeros((h, w, 3), np.float32)
        depth = np.full((h, w), np.inf, np.float32)
        # z-buffer: nearest point wins per pixel (iterate far -> near)
        order = np.argsort(-zv)
        depth[v[order], u[order]] = zv[order]
        img[v[order], u[order], 0] = 1.0 - np.clip(zv[order] / depth_max, 0, 1)
        img[v[order], u[order], 1] = inten[order]
        img[v[order], u[order], 2] = 1.0
        return img, l2c, c2i

    def evaluation(self, det_annos, class_names, **kwargs):
        """Simple mAP@IoU(0.5) over synthetic GT (hermetic eval harness)."""
        from ...utils.eval_utils import eval_map

        gt_annos = []
        for i in range(len(self)):
            _, boxes, names = self.get_raw_scene(i)
            gt_annos.append({"boxes_lidar": boxes, "name": names})
        ap_dict = eval_map(det_annos, gt_annos, class_names, iou_thresh=0.5)
        ap_str = "\n".join(f"{k}: {v:.4f}" for k, v in ap_dict.items())
        return ap_str, ap_dict

    def create_groundtruth_database(self, num_scenes=None):
        """Build an in-memory gt database (same schema as reference db_info pkls,
        points inline) for gt_sampling tests."""
        db = {c: [] for c in self.class_names}
        for i in range(num_scenes or len(self)):
            points, gt_boxes, gt_names = self.get_raw_scene(i)
            member = box_utils.points_in_boxes_numpy(points, gt_boxes)
            for j, (box, name) in enumerate(zip(gt_boxes, gt_names)):
                obj_pts = points[member[j]].copy()
                obj_pts[:, :3] -= box[:3]
                db[name].append(
                    {
                        "name": name,
                        "box3d_lidar": box,
                        "points": obj_pts,
                        "num_points_in_gt": len(obj_pts),
                        "difficulty": 0,
                    }
                )
        return db

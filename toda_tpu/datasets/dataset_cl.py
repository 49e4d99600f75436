"""Two-view (adv, org) dataset for stage-2 consistency training.

Reference: pcdet/datasets/dataset_cl.py:14-356 (DatasetTemplateCL): items are
PAIRS of the same scene — the first view freshly augmented, the second re-using
the recorded params plus one extra independent augmentation; collate produces a
dual batch. Here the record/replay mechanism is built into DataAugmentor
(augmentor/data_augmentor.py), so this wrapper is small.
"""

import numpy as np


class CLPairDataset:
    """Wraps any DatasetTemplate whose __getitem__ goes through prepare_data with
    raw access (get_raw_scene or sampling-based like MixUpDataset)."""

    def __init__(self, base_dataset, extra_rotation=(-0.39, 0.39), extra_scale=(0.95, 1.05)):
        self.base = base_dataset
        self.extra_rotation = extra_rotation
        self.extra_scale = extra_scale
        # forwarded metadata
        self.class_names = base_dataset.class_names
        self.grid_size = base_dataset.grid_size
        self.voxel_size = base_dataset.voxel_size
        self.point_cloud_range = base_dataset.point_cloud_range
        self.point_feature_encoder = base_dataset.point_feature_encoder
        self.data_processor = base_dataset.data_processor
        self.training = base_dataset.training
        self.train_percent = 0.0

    def __len__(self):
        return len(self.base)

    def __getitem__(self, index):
        self.base.train_percent = self.train_percent
        if hasattr(self.base, "get_raw_item"):
            raw = dict(self.base.get_raw_item(index))
        else:
            points, gt_boxes, gt_names = self.base.get_raw_scene(index)
            raw = {"points": points, "gt_boxes": gt_boxes, "gt_names": gt_names}
        adv = self.base.prepare_data({**raw, "frame_id": index})
        replay = list(adv.get("augmentation_params", []))
        points, gt_boxes, gt_names = raw["points"], raw["gt_boxes"], raw["gt_names"]
        # org view: replayed params + one extra independent rotation/scale,
        # recorded so its transform can be reversed in the consistency loss
        extra = [
            ("random_world_rotation", float(np.random.uniform(*self.extra_rotation))),
            ("random_world_scaling", float(np.random.uniform(*self.extra_scale))),
        ]
        merged = []
        seen = set()
        for name, p in replay:
            if name == "random_world_rotation":
                p = p + extra[0][1]
            elif name == "random_world_scaling":
                p = p * extra[1][1]
            merged.append((name, p))
            seen.add(name)
        for name, p in extra:
            if name not in seen:
                merged.append((name, p))
        org = self.base.prepare_data(
            {
                "points": points, "gt_boxes": gt_boxes, "gt_names": gt_names,
                "frame_id": index, "replay_params": merged,
            }
        )
        return {"adv": adv, "org": org}

    @staticmethod
    def collate_batch(batch_list, _unused=False):
        from .dataset import DatasetTemplate

        adv = DatasetTemplate.collate_batch([b["adv"] for b in batch_list])
        org = DatasetTemplate.collate_batch([b["org"] for b in batch_list])
        return {"adv": adv, "org": org, "batch_size": len(batch_list)}

    def collate(self, batch_list):
        return self.collate_batch(batch_list)

    def evaluation(self, det_annos, class_names, **kwargs):
        return self.base.evaluation(det_annos, class_names, **kwargs)

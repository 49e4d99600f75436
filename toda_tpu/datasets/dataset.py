"""Dataset template: host pipeline ending in static-shape padded tensors.

Reference: pcdet/datasets/dataset.py:13-233 (DatasetTemplate.prepare_data,
collate_batch). Key redesigns for TPU:
  * dense (B, ...) batching instead of ragged concat with batch-idx columns;
  * every frame is padded to static caps (points -> NUM_POINTS via sample_points,
    gt_boxes -> MAX_GT_BOXES) with validity masks;
  * no voxels on host — the jitted step voxelizes on device.
"""

import numpy as np

from ..utils import common_utils
from .augmentor.data_augmentor import DataAugmentor
from .point_feature_encoder import PointFeatureEncoder
from .processor.data_processor import DataProcessor


class DatasetTemplate:
    def __init__(self, dataset_cfg=None, class_names=None, training=True, root_path=None, logger=None):
        self.dataset_cfg = dataset_cfg
        self.training = training
        self.class_names = class_names
        self.logger = logger
        self.root_path = root_path if root_path is not None else dataset_cfg.get("DATA_PATH", None)
        if dataset_cfg is None or class_names is None:
            return
        self.point_cloud_range = np.array(dataset_cfg.POINT_CLOUD_RANGE, dtype=np.float32)
        self.point_feature_encoder = PointFeatureEncoder(
            dataset_cfg.POINT_FEATURE_ENCODING, point_cloud_range=self.point_cloud_range
        )
        self.data_augmentor = (
            DataAugmentor(
                self.root_path, dataset_cfg.DATA_AUGMENTOR, self.class_names, logger=logger
            )
            if self.training and dataset_cfg.get("DATA_AUGMENTOR", None)
            else None
        )
        self.data_processor = DataProcessor(
            dataset_cfg.DATA_PROCESSOR,
            point_cloud_range=self.point_cloud_range,
            training=self.training,
            num_point_features=self.point_feature_encoder.num_point_features,
        )
        self.grid_size = self.data_processor.grid_size
        self.voxel_size = self.data_processor.voxel_size
        self.max_points = self.data_processor.max_points or int(
            dataset_cfg.get("MAX_POINTS", 65536)
        )
        self.max_gt_boxes = int(dataset_cfg.get("MAX_GT_BOXES", 128))
        self.total_epochs = 0
        self._merge_all_iters_to_one_epoch = False
        # curriculum knob updated by the train loop every iteration
        # (reference: train_utils.py:47-48 sets dataset.train_percent)
        self.train_percent = 0.0

    @property
    def mode(self):
        return "train" if self.training else "test"

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError

    def prepare_data(self, data_dict):
        """augment -> class filter -> encode -> process -> pad to static shapes.

        Mirrors reference prepare_data (dataset.py:90-160) then adds the padding
        stage that replaces ragged collate.
        """
        if self.training and self.data_augmentor is not None:
            assert "gt_boxes" in data_dict, "gt_boxes should be provided for training"
            gt_boxes_mask = np.array(
                [n in self.class_names for n in data_dict["gt_names"]], dtype=np.bool_
            )
            data_dict["gt_boxes_mask"] = gt_boxes_mask
            data_dict = self.data_augmentor.forward(data_dict)
            if "gt_boxes_mask" in data_dict:
                data_dict.pop("gt_boxes_mask")

        if data_dict.get("gt_boxes", None) is not None:
            selected = common_utils.keep_arrays_by_name(data_dict["gt_names"], self.class_names)
            data_dict["gt_boxes"] = data_dict["gt_boxes"][selected]
            data_dict["gt_names"] = data_dict["gt_names"][selected]
            gt_classes = np.array(
                [self.class_names.index(n) + 1 for n in data_dict["gt_names"]],
                dtype=np.float32,
            )
            data_dict["gt_boxes"] = np.concatenate(
                (data_dict["gt_boxes"].astype(np.float32), gt_classes.reshape(-1, 1)), axis=1
            )

        if data_dict.get("points", None) is not None:
            data_dict = self.point_feature_encoder.forward(data_dict)
        data_dict = self.data_processor.forward(data_dict=data_dict)

        if self.training and len(data_dict.get("gt_boxes", [])) == 0:
            # resample another frame (reference dataset.py:152-154). Bounded:
            # if every sample comes back empty (e.g. class_names don't match
            # the infos' gt_names) fail with a diagnosis instead of recursing
            # until the stack blows.
            self._empty_resamples = getattr(self, "_empty_resamples", 0) + 1
            # constant cap: the retries recurse, so it must stay well under the
            # interpreter stack limit regardless of dataset size
            if self._empty_resamples > 128:
                raise RuntimeError(
                    f"{self._empty_resamples} consecutive empty-gt resamples — "
                    f"no training sample yields gt boxes for class_names="
                    f"{self.class_names}; check the class list against the "
                    "infos' gt_names (case-sensitive) and the point-cloud range."
                )
            new_index = np.random.randint(len(self))
            return self.__getitem__(new_index)
        self._empty_resamples = 0

        return self.pad_to_static(data_dict)

    AUG_VECTOR_KEYS = (
        "random_world_flip_x", "random_world_flip_y", "random_world_rotation",
        "random_world_scaling",
    )

    def aug_vector(self, aug_params):
        """Encode recorded world-aug params as a fixed (7,) vector
        [flip_x, flip_y, rot, scale, tx, ty, tz] so the jitted consistency loss
        can reverse transforms (stage-2 CL; reference reverse_transform)."""
        vec = np.array([0, 0, 0, 1, 0, 0, 0], dtype=np.float32)
        for name, p in aug_params or []:
            if name == "random_world_flip_x":
                vec[0] = float(bool(p))
            elif name == "random_world_flip_y":
                vec[1] = float(bool(p))
            elif name == "random_world_rotation":
                vec[2] = float(p)
            elif name == "random_world_scaling":
                vec[3] = float(p)
            elif name == "random_world_translation":
                vec[4:7] = np.asarray(p, dtype=np.float32)
        return vec

    def pad_to_static(self, data_dict):
        points = np.asarray(data_dict["points"], dtype=np.float32)
        n = len(points)
        data_dict["points"] = common_utils.pad_to(points, self.max_points)
        mask = np.zeros(self.max_points, dtype=np.bool_)
        mask[: min(n, self.max_points)] = True
        data_dict["points_mask"] = mask
        if data_dict.get("gt_boxes", None) is not None:
            data_dict["gt_boxes"] = common_utils.pad_to(
                np.asarray(data_dict["gt_boxes"], dtype=np.float32), self.max_gt_boxes
            )
        if "augmentation_params" in data_dict:
            data_dict["aug_vector"] = self.aug_vector(data_dict["augmentation_params"])
        data_dict.pop("gt_names", None)
        data_dict.pop("use_lead_xyz", None)
        data_dict.pop("replay_params", None)
        return data_dict

    @staticmethod
    def collate_batch(batch_list, _unused=False):
        """Stack same-shape frames into dense (B, ...) arrays; non-array metadata
        becomes lists. Replaces reference collate_batch (dataset.py:162-233)."""
        batch = {}
        keys = batch_list[0].keys()
        for key in keys:
            vals = [d[key] for d in batch_list]
            if key in ("augmentation_params", "replay_params"):
                batch[key] = vals
            elif isinstance(vals[0], np.ndarray):
                batch[key] = np.stack(vals, axis=0)
            else:
                batch[key] = vals
        batch["batch_size"] = len(batch_list)
        return batch

    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names, output_path=None):
        """Decode network output into per-frame annotation dicts (numpy).

        Args:
            pred_dicts: list of {'pred_boxes' (K, 7), 'pred_scores' (K,),
                'pred_labels' (K,), 'pred_mask' (K,)} numpy per frame.
        """
        annos = []
        for index, box_dict in enumerate(pred_dicts):
            m = box_dict.get("pred_mask", np.ones(len(box_dict["pred_scores"]), bool))
            boxes = np.asarray(box_dict["pred_boxes"])[m]
            scores = np.asarray(box_dict["pred_scores"])[m]
            labels = np.asarray(box_dict["pred_labels"])[m].astype(int)
            annos.append(
                {
                    "name": np.array([class_names[i - 1] for i in labels]),
                    "score": scores,
                    "boxes_lidar": boxes,
                    "pred_labels": labels,
                    "frame_id": batch_dict["frame_id"][index]
                    if "frame_id" in batch_dict
                    else index,
                }
            )
        return annos

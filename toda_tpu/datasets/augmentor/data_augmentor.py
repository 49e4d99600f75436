"""Config-driven augmentation queue with record/replay (host numpy).

Reference: pcdet/datasets/augmentor/data_augmentor.py:9-257 + the replayable variant
data_augmentor_cl.py (348 LoC). Here one class covers both: each op appends
``(name, params)`` to ``data_dict['augmentation_params']``; passing
``data_dict['replay_params']`` replays a recorded sequence instead of sampling.
"""

from functools import partial

import numpy as np

from ...utils import common_utils
from . import augmentor_utils
from .database_sampler import DataBaseSampler


class DataAugmentor:
    def __init__(self, root_path, augmentor_configs, class_names, logger=None):
        self.root_path = root_path
        self.class_names = class_names
        self.logger = logger
        self.data_augmentor_queue = []
        aug_config_list = (
            augmentor_configs
            if isinstance(augmentor_configs, list)
            else augmentor_configs.AUG_CONFIG_LIST
        )
        self.disable_list = (
            []
            if isinstance(augmentor_configs, list)
            else augmentor_configs.get("DISABLE_AUG_LIST", [])
        )
        for cur_cfg in aug_config_list:
            if cur_cfg.NAME in self.disable_list:
                continue
            cur_augmentor = getattr(self, cur_cfg.NAME)(config=cur_cfg)
            self.data_augmentor_queue.append(cur_augmentor)

    # ---- ops ---------------------------------------------------------------
    def gt_sampling(self, config=None):
        return DataBaseSampler(
            root_path=self.root_path,
            sampler_cfg=config,
            class_names=self.class_names,
            logger=self.logger,
        )

    def _replay_param(self, data_dict, name):
        replay = data_dict.get("replay_params", None)
        if replay is None:
            return None
        for n, p in replay:
            if n == name:
                return p
        return None

    def _record(self, data_dict, name, params):
        data_dict.setdefault("augmentation_params", []).append((name, params))

    def random_world_flip(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_flip, config=config)
        gt_boxes = data_dict.get("gt_boxes", np.zeros((0, 7), np.float32))
        points = data_dict["points"]
        for cur_axis in config.ALONG_AXIS_LIST:
            name = f"random_world_flip_{cur_axis}"
            fn = getattr(augmentor_utils, f"random_flip_along_{cur_axis}")
            gt_boxes, points, used = fn(
                gt_boxes, points, params=self._replay_param(data_dict, name)
            )
            self._record(data_dict, name, used)
        data_dict["gt_boxes"] = gt_boxes
        data_dict["points"] = points
        return data_dict

    def random_world_rotation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_rotation, config=config)
        rot_range = config.WORLD_ROT_ANGLE
        if not isinstance(rot_range, (list, tuple)):
            rot_range = [-rot_range, rot_range]
        gt_boxes, points, used = augmentor_utils.global_rotation(
            data_dict.get("gt_boxes", np.zeros((0, 7), np.float32)),
            data_dict["points"],
            rot_range=rot_range,
            params=self._replay_param(data_dict, "random_world_rotation"),
        )
        self._record(data_dict, "random_world_rotation", used)
        data_dict["gt_boxes"] = gt_boxes
        data_dict["points"] = points
        return data_dict

    def random_world_scaling(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_scaling, config=config)
        gt_boxes, points, used = augmentor_utils.global_scaling(
            data_dict.get("gt_boxes", np.zeros((0, 7), np.float32)),
            data_dict["points"],
            scale_range=config.WORLD_SCALE_RANGE,
            params=self._replay_param(data_dict, "random_world_scaling"),
        )
        self._record(data_dict, "random_world_scaling", used)
        data_dict["gt_boxes"] = gt_boxes
        data_dict["points"] = points
        return data_dict

    def random_world_translation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_translation, config=config)
        gt_boxes, points, used = augmentor_utils.global_translation(
            data_dict.get("gt_boxes", np.zeros((0, 7), np.float32)),
            data_dict["points"],
            noise_std=config.NOISE_TRANSLATE_STD,
            params=self._replay_param(data_dict, "random_world_translation"),
        )
        self._record(data_dict, "random_world_translation", used)
        data_dict["gt_boxes"] = gt_boxes
        data_dict["points"] = points
        return data_dict

    def random_local_rotation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_rotation, config=config)
        rot_range = config.LOCAL_ROT_ANGLE
        if not isinstance(rot_range, (list, tuple)):
            rot_range = [-rot_range, rot_range]
        gt_boxes, points, used = augmentor_utils.random_local_rotation(
            data_dict.get("gt_boxes", np.zeros((0, 7), np.float32)),
            data_dict["points"], rot_range=rot_range,
            params=self._replay_param(data_dict, "random_local_rotation"),
        )
        self._record(data_dict, "random_local_rotation", used)
        data_dict["gt_boxes"], data_dict["points"] = gt_boxes, points
        return data_dict

    def random_local_scaling(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_scaling, config=config)
        gt_boxes, points, used = augmentor_utils.random_local_scaling(
            data_dict.get("gt_boxes", np.zeros((0, 7), np.float32)),
            data_dict["points"], scale_range=config.LOCAL_SCALE_RANGE,
            params=self._replay_param(data_dict, "random_local_scaling"),
        )
        self._record(data_dict, "random_local_scaling", used)
        data_dict["gt_boxes"], data_dict["points"] = gt_boxes, points
        return data_dict

    def random_world_frustum_dropout(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_frustum_dropout, config=config)
        gt_boxes, points, used, box_keep = augmentor_utils.random_world_frustum_dropout(
            data_dict.get("gt_boxes", np.zeros((0, 7), np.float32)),
            data_dict["points"],
            intensity_range=tuple(config.get("INTENSITY_RANGE", (0.2, 0.7))),
            directions=tuple(config.get("DIRECTION", ("top",))),
            params=self._replay_param(data_dict, "random_world_frustum_dropout"),
        )
        self._record(data_dict, "random_world_frustum_dropout", used)
        data_dict["gt_boxes"], data_dict["points"] = gt_boxes, points
        if "gt_names" in data_dict:
            data_dict["gt_names"] = np.asarray(data_dict["gt_names"])[box_keep]
        if "gt_boxes_mask" in data_dict:
            data_dict["gt_boxes_mask"] = np.asarray(data_dict["gt_boxes_mask"])[box_keep]
        return data_dict

    def random_local_frustum_dropout(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_frustum_dropout, config=config)
        gt_boxes, points, used, _ = augmentor_utils.random_local_frustum_dropout(
            data_dict.get("gt_boxes", np.zeros((0, 7), np.float32)),
            data_dict["points"],
            intensity_range=tuple(config.get("INTENSITY_RANGE", (0.2, 0.7))),
            directions=tuple(config.get("DIRECTION", ("top",))),
            params=self._replay_param(data_dict, "random_local_frustum_dropout"),
        )
        self._record(data_dict, "random_local_frustum_dropout", used)
        data_dict["gt_boxes"], data_dict["points"] = gt_boxes, points
        return data_dict

    def random_local_translation(self, data_dict=None, config=None):
        """Reference: data_augmentor.py:118-134 (per-axis per-box offsets)."""
        if data_dict is None:
            return partial(self.random_local_translation, config=config)
        offset_range = config.LOCAL_TRANSLATION_RANGE
        replay = self._replay_param(data_dict, "random_local_translation")
        used = {}
        for ax in config["ALONG_AXIS_LIST"]:
            fn = getattr(augmentor_utils, f"random_local_translation_along_{ax}")
            gt_boxes, points, offs = fn(
                data_dict.get("gt_boxes", np.zeros((0, 7), np.float32)),
                data_dict["points"], offset_range,
                params=None if replay is None else replay[ax],
            )
            used[ax] = offs
            data_dict["gt_boxes"], data_dict["points"] = gt_boxes, points
        self._record(data_dict, "random_local_translation", used)
        return data_dict

    def random_local_pyramid_aug(self, data_dict=None, config=None):
        """Face-pyramid dropout -> sparsify -> swap (reference
        data_augmentor.py:205-226). Data-dependent point counts make this
        non-replayable; CL pipelines keep it out of the replayed queue."""
        if data_dict is None:
            return partial(self.random_local_pyramid_aug, config=config)
        gt_boxes = data_dict.get("gt_boxes", np.zeros((0, 7), np.float32))
        points = data_dict["points"]
        gt_boxes, points, pyramids = augmentor_utils.local_pyramid_dropout(
            gt_boxes, points, config["DROP_PROB"]
        )
        gt_boxes, points, pyramids = augmentor_utils.local_pyramid_sparsify(
            gt_boxes, points, config["SPARSIFY_PROB"], config["SPARSIFY_MAX_NUM"],
            pyramids,
        )
        gt_boxes, points = augmentor_utils.local_pyramid_swap(
            gt_boxes, points, config["SWAP_PROB"], config["SWAP_MAX_NUM"], pyramids
        )
        data_dict["gt_boxes"], data_dict["points"] = gt_boxes, points
        return data_dict

    # ---- driver ------------------------------------------------------------
    def forward(self, data_dict):
        for cur_augmentor in self.data_augmentor_queue:
            data_dict = cur_augmentor(data_dict=data_dict)
        if "gt_boxes" in data_dict and len(data_dict["gt_boxes"]):
            data_dict["gt_boxes"][:, 6] = common_utils.limit_period(
                data_dict["gt_boxes"][:, 6], offset=0.5, period=2 * np.pi
            )
        return data_dict

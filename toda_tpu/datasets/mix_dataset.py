"""Two-domain mixing dataset (TODA stage 1) and intra-domain MixUp dataset (stage 2).

Reference surface:
  * CutMixDatasetTemplate / WaymoNus{CutMix,PolarMix,LaserMix}Dataset
    (pcdet/datasets/two_dataset.py:19-368, mix_dataset/*.py): with probability
    MIX_PROB load one frame from EACH domain, augment each with its own domain
    augmentor, remap classes to the unified space, apply the configured mixer,
    else return a plain sample from whichever domain the index addresses;
    __len__ = len(source) + len(target).
  * NuScenesMixUpDataset (nuscenes/nuscenes_mixup_dataset.py:13-434): per item,
    with prob 1-MIXUP_PROB a plain sample (GT-labeled w.p. GT_PROB else pseudo),
    else MixUp of a pair per MIXUP_TYPE.

Both are generic here: any child dataset exposing ``get_raw_scene(i) ->
(points, gt_boxes, gt_names)`` plugs in (synthetic, nuScenes, waymo...).
"""

import numpy as np

from .dataset import DatasetTemplate
from .processor import inter_domain_mix
from .processor.intra_domain_mixup import (
    intra_domain_point_mixup,
    intra_domain_point_mixup_cd,
)

MIXERS = {
    "cutmix": inter_domain_mix.cutmix,
    "polarmix": inter_domain_mix.polarmix,
    "lasermix": inter_domain_mix.lasermix,
    "pseudobbox": lambda s, t, **kw: inter_domain_mix.pseudomix(s, t, "pseudobbox"),
    "pseudobackground": lambda s, t, **kw: inter_domain_mix.pseudomix(s, t, "pseudobackground"),
}


class CutMixDataset(DatasetTemplate):
    """Stage-1 inter-domain mixing over (source, target) child datasets."""

    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None,
                 source_dataset=None, target_dataset=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        from . import build_dataset

        self.source = source_dataset or build_dataset(
            dataset_cfg.SOURCE_CFG, class_names, training=training, logger=logger
        )
        self.target = target_dataset or build_dataset(
            dataset_cfg.TARGET_CFG, class_names, training=training, logger=logger
        )
        self.mix_type = dataset_cfg.get("MIX_TYPE", "cutmix")
        # CUTMIX_PROB / POLARMIX_PROB are the same knob in the reference —
        # each pair-dataset class reads its own name (waymo_nus_*_dataset.py:148,161)
        self.mix_prob = float(dataset_cfg.get(
            "CUTMIX_PROB", dataset_cfg.get("POLARMIX_PROB", 0.5)))
        self.class_mapping = dataset_cfg.get("CLASS_MAPPING", None)  # e.g. all -> 'car'
        # reference MIX_INC_METHOD / POLARMIX_* knobs
        # (inter_domain_point_polarmix.py:44-94,247-300, two_dataset.py:70-105)
        self.polarmix_width = dataset_cfg.get(
            "POLARMIX_UPDATE_METHOD",
            dataset_cfg.get("POLARMIX_WIDTH_METHOD", "FIX"))
        self.polarmix_degree = dataset_cfg.get(
            "POLARMIX_DEGREE", [np.pi / 6, np.pi])
        self.polarmix_rc_num = int(dataset_cfg.get("POLARMIX_RC_NUM", 1))
        self.polarmix_dis = dataset_cfg.get("POLARMIX_DIS", "FULL")
        self.inc_method = dataset_cfg.get("MIX_INC_METHOD", "center")
        self.use_pitch = bool(dataset_cfg.get("POLARMIX_USE_PITCH", False))
        self.lasermix_mode = dataset_cfg.get("LASERMIX_MODE", "spherical")
        self.lasermix_num_areas = dataset_cfg.get("LASERMIX_NUM_AREAS", None)
        self.lasermix_num_angles = dataset_cfg.get("LASERMIX_NUM_ANGLES", None)
        self.lasermix_pitch = dataset_cfg.get("LASERMIX_PITCH_ANGLE", None)
        pc_range = dataset_cfg.get("POINT_CLOUD_RANGE", None)
        self.range_max = float(pc_range[3]) if pc_range is not None else 60.0
        self.pc_range = np.asarray(pc_range, np.float64) if pc_range is not None else None
        # reference hard-codes >10000 target points per accepted window
        # (inter_domain_point_cutmix.py:58); configurable for small fixtures
        self.cutmix_min_points = int(dataset_cfg.get("CUTMIX_MIN_POINTS", 10000))

    def __len__(self):
        return len(self.source) + len(self.target)

    def _raw(self, dataset, idx):
        points, gt_boxes, gt_names = dataset.get_raw_scene(idx)
        if self.class_mapping:
            gt_names = np.asarray([self.class_mapping.get(n, n) for n in gt_names])
        return {"points": points, "gt_boxes": gt_boxes, "gt_names": gt_names}

    def _augment_domain(self, dataset, d):
        if dataset.data_augmentor is None:
            return d
        d = dict(d)
        d["gt_boxes_mask"] = np.asarray([n in self.class_names for n in d["gt_names"]])
        d = dataset.data_augmentor.forward(d)
        d.pop("gt_boxes_mask", None)
        d.pop("augmentation_params", None)
        return d

    def __getitem__(self, index):
        do_mix = self.training and np.random.rand() < self.mix_prob
        if do_mix:
            src = self._raw(self.source, np.random.randint(len(self.source)))
            tgt = self._raw(self.target, np.random.randint(len(self.target)))
            src = self._augment_domain(self.source, src)
            tgt = self._augment_domain(self.target, tgt)
            mix_type = self.mix_type
            if mix_type == "cutpolarmix":
                # reference two_dataset.py:240-254: a fair coin picks cutmix
                # or polarmix per mixed sample
                mix_type = "cutmix" if np.random.rand() < 0.5 else "polarmix"
            kw = {}
            if mix_type == "cutmix":
                kw = dict(pc_range=self.pc_range, min_points=self.cutmix_min_points)
            elif mix_type == "polarmix":
                kw = dict(
                    train_percent=self.train_percent,
                    width_method=self.polarmix_width,
                    degree=self.polarmix_degree,
                    rot_copy_num=self.polarmix_rc_num,
                    polar_dis=self.polarmix_dis,
                    range_max=self.range_max,
                    inc_method=self.inc_method,
                    use_pitch=self.use_pitch,
                )
            elif mix_type == "lasermix":
                kw = dict(mode=self.lasermix_mode, inc_method=self.inc_method,
                          num_areas=self.lasermix_num_areas,
                          num_angles=self.lasermix_num_angles,
                          pitch_angles_deg=self.lasermix_pitch,
                          range_max=self.range_max)
            mixed = MIXERS[mix_type](src, tgt, **kw)
            data_dict = {**mixed, "frame_id": index}
            # domain augmentors already ran; skip the template augmentor
            aug, self.data_augmentor = self.data_augmentor, None
            try:
                out = self.prepare_data(data_dict)
            finally:
                self.data_augmentor = aug
            return out
        if index < len(self.source):
            d = self._raw(self.source, index)
        else:
            d = self._raw(self.target, index - len(self.source))
        out = self.prepare_data({**d, "frame_id": index})
        # mixed samples run the per-domain augmentors (no replay recording);
        # strip the template augmentor's replay artifacts here too or a
        # mixed/plain batch collates inconsistent key sets
        out.pop("augmentation_params", None)
        out.pop("aug_vector", None)
        return out

    def evaluation(self, det_annos, class_names, **kwargs):
        return self.target.evaluation(det_annos, class_names, **kwargs)


class MixUpDataset(DatasetTemplate):
    """Stage-2 intra-domain MixUp over {GT-labeled} ∪ {pseudo-labeled} frames.

    The pseudo pool is a list of dicts {'index', 'gt_boxes', 'gt_names', 'score',
    optional 'perturb'} referencing frames of ``base_dataset`` (written by the
    pseudo-label generator). ``adv_alpha`` scales stored adversarial point
    perturbations applied inside pseudo boxes (NuScenesMixUpAdvDataset analog).
    """

    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None,
                 base_dataset=None, pseudo_infos=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        from . import build_dataset

        self.base = base_dataset or build_dataset(
            dataset_cfg.BASE_CFG, class_names, training=training, logger=logger
        )
        self.pseudo_infos = pseudo_infos or []
        self.labeled_indices = list(dataset_cfg.get("LABELED_INDICES", range(len(self.base))))
        self.mixup_prob = float(dataset_cfg.get("MIXUP_PROB", 0.5))
        self.gt_prob = float(dataset_cfg.get("GT_PROB", 0.5))
        self.mixup_type = dataset_cfg.get("MIXUP_TYPE", "gt+ps_gt+ps")
        self.alpha = float(dataset_cfg.get("ALPHA", 1.0))
        self.collision_detection = bool(dataset_cfg.get("COLLISION_DETECTION", True))
        self.adv_alpha = float(dataset_cfg.get("ADV_ALPHA", 0.0))
        self.score_thresh = float(dataset_cfg.get("PSEUDO_SCORE_THRESH", 0.0))
        # epoch-length multiplier for small labeled-percentage target pools
        # (reference nuscenes_mixup_adv_dataset.py:280-281, cfg REPEAT /
        # stage2 CLI --repeat); samples are drawn randomly so this only
        # lengthens the pass over the pool
        self.repeat = int(dataset_cfg.get("REPEAT", 0))

    def __len__(self):
        # reference: len(gt_infos) * repeat — only the LABELED pool is
        # multiplied (nuscenes_mixup_adv_dataset.py:280-281); the pseudo pool
        # sets the unrepeated epoch floor
        if self.repeat:
            return len(self.labeled_indices) * self.repeat
        return len(self.labeled_indices) + len(self.pseudo_infos)

    def _gt_sample(self, rng):
        idx = self.labeled_indices[rng.randint(len(self.labeled_indices))]
        points, gt_boxes, gt_names = self.base.get_raw_scene(idx)
        return {"points": points, "gt_boxes": gt_boxes, "gt_names": gt_names}

    def _pseudo_sample(self, rng):
        info = self.pseudo_infos[rng.randint(len(self.pseudo_infos))]
        points, _, _ = self.base.get_raw_scene(info["index"])
        boxes = np.asarray(info["gt_boxes"], dtype=np.float32)
        names = np.asarray(info["gt_names"])
        scores = np.asarray(info.get("score", np.ones(len(boxes))))
        keep = scores >= self.score_thresh
        boxes, names = boxes[keep], names[keep]
        if self.adv_alpha > 0.0 and "point_perturb" in info:
            points = self._apply_perturb(points, boxes, info, rng)
        return {"points": points, "gt_boxes": boxes, "gt_names": names}

    def _apply_perturb(self, points, boxes, info, rng):
        """Apply stored adversarial gradients to points inside pseudo boxes with a
        random modify/add/remove choice (NuScenesMixUpAdvDataset
        get_ps_adv_lidar_with_sweeps analog, nuscenes_mixup_adv_dataset.py:191-277)."""
        from ..utils import box_utils

        points = points.copy()
        member = box_utils.points_in_boxes_numpy(points, boxes[:, :7]).any(axis=0)
        mode = rng.randint(3)
        if "p_voxel_coords" in info:
            # robust voxel-coordinate storage (reference `_k` variant): attach
            # each point's perturbation by its voxel cell — survives resampling
            from ..runtime.pseudo_label import lookup_voxel_perturb

            delta = lookup_voxel_perturb(points, info)
        else:
            perturb = np.asarray(info["point_perturb"], dtype=np.float32)
            if perturb.ndim == 1:
                delta = np.broadcast_to(perturb[:3], (len(points), 3))
            elif len(perturb) == len(points):
                delta = perturb[:, :3]
            else:  # per-point perturb no longer aligned (resampled frame)
                delta = np.zeros((len(points), 3), dtype=np.float32)
        if mode == 0:  # modify in place
            points[member, :3] += self.adv_alpha * delta[member, :3]
        elif mode == 1:  # add perturbed copies
            extra = points[member].copy()
            extra[:, :3] += self.adv_alpha * delta[member, :3]
            points = np.concatenate([points, extra])
        else:  # remove a random fraction of in-box points
            drop = member & (rng.rand(len(member)) < 0.3)
            points = points[~drop]
        return points

    def _sample_pair_kinds(self, rng):
        """MIXUP_TYPE ∈ {only_gt, ps_gt, gt_gt+ps, gt+ps_gt+ps, no_mixup}
        (reference stage-2 config key)."""
        t = self.mixup_type
        if t == "only_gt":
            return "gt", "gt"
        if t == "ps_gt":
            return "ps", "gt"
        if t == "gt_gt+ps":
            return "gt", ("gt" if rng.rand() < 0.5 else "ps")
        # gt+ps_gt+ps: both sides free
        pick = lambda: "gt" if rng.rand() < self.gt_prob else "ps"
        return pick(), pick()

    def _get(self, kind, rng):
        if kind == "ps" and self.pseudo_infos:
            return self._pseudo_sample(rng)
        return self._gt_sample(rng)

    def get_raw_item(self, index):
        """Sample + mix, before augmentation/encoding — the unit the stage-2 CL
        pair dataset prepares twice (fresh vs replayed augmentation)."""
        rng = np.random
        do_mix = (
            self.training and self.mixup_type != "no_mixup" and rng.rand() < self.mixup_prob
        )
        if do_mix:
            ka, kb = self._sample_pair_kinds(rng)
            a, b = self._get(ka, rng), self._get(kb, rng)
            fn = intra_domain_point_mixup_cd if self.collision_detection else intra_domain_point_mixup
            mixed = fn(a, b, alpha=self.alpha, rng=rng)
            mixed.pop("mixup_lambda", None)
            return mixed
        kind = "gt" if (rng.rand() < self.gt_prob or not self.pseudo_infos) else "ps"
        return self._get(kind, rng)

    def __getitem__(self, index):
        return self.prepare_data({**self.get_raw_item(index), "frame_id": index})

    def evaluation(self, det_annos, class_names, **kwargs):
        return self.base.evaluation(det_annos, class_names, **kwargs)

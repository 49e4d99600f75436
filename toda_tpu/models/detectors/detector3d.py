"""Config-driven detector assembly + functional train/eval surface.

Reference: pcdet/models/detectors/detector3d_template.py:23-173 (module_topology
walk) and :178-328 (post_processing). Redesign for JAX:

  * `Detector3D` is ONE generic flax module that instantiates whichever stages the
    cfg names (vfe / backbone_3d / map_to_bev / backbone_2d / dense_head) — the
    reference's per-detector subclasses mostly differ in loss composition, which
    here lives in pure functions on `DetectorBundle`.
  * Voxelization happens INSIDE the model (device-side, part of the jitted step) —
    batch_dict arrives with just padded points.
  * `DetectorBundle` carries the static companions (anchors, target assigner, box
    coder, post-processing cfg) and exposes `loss(params, batch)` /
    `predict(params, batch)` pure functions for jit/grad.
"""

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import voxelize
from ...ops.nms import class_agnostic_nms
from ...utils.box_coder_utils import ResidualCoder
from ..backbones_2d import __all__ as bev_backbones
from ..backbones_2d.map_to_bev import __all__ as map_to_bev_modules
from ..backbones_3d.vfe import __all__ as vfe_modules
from ..dense_heads import __all__ as dense_heads
from ..dense_heads.anchor_head_single import anchor_head_loss, generate_predicted_boxes
from ..dense_heads.target_assigner.anchor_generator import AnchorGenerator
from ..dense_heads.target_assigner.axis_aligned_target_assigner import (
    AxisAlignedTargetAssigner,
)


@dataclass(frozen=True)
class DatasetMeta:
    """Static dataset facts the model needs at build/trace time."""

    class_names: tuple
    point_cloud_range: tuple
    voxel_size: tuple
    grid_size: tuple  # (nx, ny, nz)
    num_point_features: int
    max_voxels: int
    max_points_per_voxel: int

    @classmethod
    def from_dataset(cls, dataset):
        # point-only pipelines (PointRCNN) have no voxelization processor
        voxel_size = getattr(dataset, "voxel_size", None)
        grid_size = getattr(dataset, "grid_size", None)
        dp = dataset.data_processor
        return cls(
            class_names=tuple(dataset.class_names),
            point_cloud_range=tuple(float(v) for v in dataset.point_cloud_range),
            voxel_size=None if voxel_size is None else tuple(float(v) for v in voxel_size),
            grid_size=None if grid_size is None else tuple(int(v) for v in grid_size),
            num_point_features=dataset.point_feature_encoder.num_point_features,
            max_voxels=int(dp.max_voxels) if dp.max_voxels else 0,
            max_points_per_voxel=(
                int(dp.max_points_per_voxel) if dp.max_points_per_voxel else 0
            ),
        )


class Detector3D(nn.Module):
    model_cfg: dict
    num_class: int
    meta: DatasetMeta
    num_anchors_per_location: int = 1
    code_size: int = 7
    feature_map_size: tuple = (0, 0)
    anchors: object = None  # numpy, set when an anchor head (+ roi head) is used
    box_coder_ref: object = None
    multihead_kwargs: tuple = ()  # AnchorHeadMulti group sizes (hashable)

    def _voxelize(self, batch_dict):
        def one(points, mask):
            return voxelize(
                points,
                mask,
                self.meta.voxel_size,
                self.meta.point_cloud_range,
                grid_size=self.meta.grid_size,
                max_voxels=self.meta.max_voxels,
                max_points_per_voxel=self.meta.max_points_per_voxel,
            )

        out = jax.vmap(one)(batch_dict["points"], batch_dict["points_mask"])
        batch_dict.update(out)
        return batch_dict

    @nn.compact
    def __call__(self, batch_dict, training=False):
        from ..backbones_3d import POINT_CONSUMING

        cfg = self.model_cfg
        batch_dict = dict(batch_dict)
        batch_dict.setdefault("batch_size", batch_dict["points"].shape[0])
        bb3d_name = cfg.get("BACKBONE_3D", {}).get("NAME") if cfg.get("BACKBONE_3D") else None
        vfe_name = cfg.get("VFE", {}).get("NAME") if cfg.get("VFE") else None
        # pcdet's public aliases for the dynamic VFEs
        vfe_name = {"DynMeanVFE": "DynamicMeanVFE", "DynPillarVFE": "DynamicPillarVFE"}.get(
            vfe_name, vfe_name
        )
        # pillar backbones and dynamic VFEs own their voxelization
        skip_voxelize = bb3d_name in POINT_CONSUMING or vfe_name in (
            "DynamicMeanVFE", "DynamicPillarVFE", "ImageVFE"
        )
        if "voxels" not in batch_dict and not skip_voxelize:
            batch_dict = self._voxelize(batch_dict)

        if cfg.get("VFE", None) is not None and bb3d_name not in POINT_CONSUMING:
            vfe_cls = vfe_modules[vfe_name]
            kwargs = dict(model_cfg=cfg["VFE"], num_point_features=self.meta.num_point_features)
            if vfe_name == "PillarVFE":
                kwargs.update(
                    voxel_size=self.meta.voxel_size,
                    point_cloud_range=self.meta.point_cloud_range,
                )
            elif vfe_name in ("DynamicMeanVFE", "DynamicPillarVFE", "ImageVFE"):
                kwargs.update(
                    voxel_size=self.meta.voxel_size,
                    point_cloud_range=self.meta.point_cloud_range,
                    grid_size=self.meta.grid_size,
                    max_voxels=self.meta.max_voxels,
                )
            batch_dict = vfe_cls(name="vfe", **kwargs)(batch_dict, training=training)
            if "pillar_features" not in batch_dict and "voxel_features" in batch_dict:
                batch_dict["pillar_features"] = batch_dict["voxel_features"]

        if cfg.get("BACKBONE_3D", None) is not None:
            from ..backbones_3d import __all__ as backbones_3d

            kwargs = dict(
                model_cfg=cfg["BACKBONE_3D"],
                input_channels=self.meta.num_point_features,
                grid_size=self.meta.grid_size,
            )
            if bb3d_name in POINT_CONSUMING:
                kwargs.update(
                    voxel_size=self.meta.voxel_size,
                    point_cloud_range=self.meta.point_cloud_range,
                )
            bb = backbones_3d[bb3d_name](name="backbone_3d", **kwargs)
            batch_dict = bb(batch_dict, training=training)

        if cfg.get("MAP_TO_BEV", None) is not None:
            m2b_name = cfg["MAP_TO_BEV"]["NAME"]
            m2b_cls = map_to_bev_modules[m2b_name]
            kwargs = dict(model_cfg=cfg["MAP_TO_BEV"])
            if m2b_name == "PointPillarScatter":
                kwargs["grid_size"] = self.meta.grid_size
            batch_dict = m2b_cls(name="map_to_bev", **kwargs)(batch_dict, training=training)

        if cfg.get("BACKBONE_2D", None) is not None:
            batch_dict = bev_backbones[cfg["BACKBONE_2D"]["NAME"]](
                model_cfg=cfg["BACKBONE_2D"],
                input_channels=batch_dict["spatial_features"].shape[-1],
                name="backbone_2d",
            )(batch_dict, training=training)

        if cfg.get("DENSE_HEAD", None) is not None:
            head_name = cfg["DENSE_HEAD"]["NAME"]
            head_cls = dense_heads[head_name]
            if head_name == "AnchorHeadSingle":
                head = head_cls(
                    model_cfg=cfg["DENSE_HEAD"],
                    input_channels=batch_dict["spatial_features_2d"].shape[-1],
                    num_class=self.num_class,
                    num_anchors_per_location=self.num_anchors_per_location,
                    code_size=self.code_size,
                    feature_map_size=self.feature_map_size,
                    name="dense_head",
                )
            elif head_name == "AnchorHeadMulti":
                mh = dict(self.multihead_kwargs)
                head = head_cls(
                    model_cfg=cfg["DENSE_HEAD"],
                    input_channels=batch_dict["spatial_features_2d"].shape[-1],
                    head_num_classes=mh["head_num_classes"],
                    head_num_anchors=mh["head_num_anchors"],
                    code_size=self.code_size,
                    name="dense_head",
                )
            else:  # CenterHead
                head = head_cls(
                    model_cfg=cfg["DENSE_HEAD"],
                    input_channels=batch_dict["spatial_features_2d"].shape[-1],
                    num_class=self.num_class,
                    class_names=self.meta.class_names,
                    grid_size=self.meta.grid_size,
                    point_cloud_range=self.meta.point_cloud_range,
                    voxel_size=self.meta.voxel_size,
                    name="dense_head",
                )
            batch_dict = head(batch_dict, training=training)

        if (
            cfg.get("PFE", None) is not None
            and cfg["PFE"].get("SAMPLE_METHOD") == "SPC"
            and cfg.get("ROI_HEAD", None) is not None
        ):
            batch_dict = self._proposals_and_targets(batch_dict, cfg, training)

        if cfg.get("PFE", None) is not None:
            from ..backbones_3d.pfe import __all__ as pfe_modules

            batch_dict = pfe_modules[cfg["PFE"]["NAME"]](
                model_cfg=cfg["PFE"],
                voxel_size=self.meta.voxel_size,
                point_cloud_range=self.meta.point_cloud_range,
                grid_size=self.meta.grid_size,
                num_rawpoint_features=self.meta.num_point_features,
                name="pfe",
            )(batch_dict, training=training)

        if cfg.get("POINT_HEAD", None) is not None:
            ph_name = cfg["POINT_HEAD"].get("NAME", "PointHeadSimple")
            if ph_name == "PointHeadBox":
                from ..dense_heads.point_head_box import PointHeadBox as ph_cls
            elif ph_name == "PointHeadIntraPart":
                from ..dense_heads.point_head_intra_part import PointHeadIntraPart as ph_cls
            else:
                from ..dense_heads.point_head_simple import PointHeadSimple as ph_cls

            batch_dict = ph_cls(
                model_cfg=cfg["POINT_HEAD"], num_class=self.num_class, name="point_head"
            )(batch_dict, training=training)

        if cfg.get("ROI_HEAD", None) is not None:
            batch_dict = self._roi_stage(batch_dict, cfg, training)
        return batch_dict

    def _roi_stage(self, batch_dict, cfg, training):
        """Proposal layer + (training) RoI target sampling + RoI head.

        Reference: RoIHeadTemplate.proposal_layer (roi_head_template.py:46-103)
        and assign_targets (:106-138). Proposals use per-frame NMS when the head
        config carries NMS_CONFIG; otherwise the static top-N fast path (the
        SECOND-IoU rescoring head is insensitive to duplicate proposals —
        pinned by tests/test_model_voxel.py).
        """
        from ..dense_heads.anchor_head_single import generate_predicted_boxes
        from ..roi_heads import __all__ as roi_heads
        from ..roi_heads.roi_utils import assign_targets, proposal_layer

        batch_dict = self._proposals_and_targets(batch_dict, cfg, training)
        return self._apply_roi_head(batch_dict, cfg, training)

    def _proposals_and_targets(self, batch_dict, cfg, training):
        """Proposal NMS + (training) RoI target sampling. Idempotent: skipped
        when an earlier stage (PV-RCNN++ SPC pre-pass) already produced them
        (reference detectors/pv_rcnn_plusplus.py:16-27 runs both before the
        PFE)."""
        from ..roi_heads.roi_utils import assign_targets

        roi_cfg = cfg["ROI_HEAD"]
        if "rois" not in batch_dict:
            batch_dict = self._make_proposals(batch_dict, cfg, training)
            # The reference proposal layer runs under @torch.no_grad()
            # (roi_head_template.py:46): second-stage losses must not
            # backprop into the RPN through proposal geometry — especially
            # not through the gt_of_rois target encoding, which is a
            # function of the rois and would otherwise let the optimizer
            # satisfy the rcnn reg loss by moving the proposals.
            for k in ("rois", "roi_scores", "roi_labels", "roi_mask"):
                if k in batch_dict:
                    batch_dict[k] = jax.lax.stop_gradient(batch_dict[k])

        if (
            training
            and roi_cfg.get("TARGET_CONFIG") is not None
            and "gt_boxes" in batch_dict
            and "rcnn_cls_labels" not in batch_dict
        ):
            rng = (
                self.make_rng("sampling")
                if self.has_rng("sampling")
                else jax.random.PRNGKey(0)
            )
            targets = assign_targets(rng, batch_dict, roi_cfg["TARGET_CONFIG"])
            batch_dict["rois"] = targets["rois"][..., :7]
            batch_dict["roi_scores"] = targets["roi_scores"]
            batch_dict["roi_labels"] = targets["roi_labels"]
            batch_dict["roi_mask"] = jnp.ones(targets["roi_scores"].shape, dtype=bool)
            for k in ("gt_of_rois", "gt_of_rois_src", "gt_iou_of_rois",
                      "reg_valid_mask", "rcnn_cls_labels"):
                batch_dict[k] = targets[k]
        return batch_dict

    def _make_proposals(self, batch_dict, cfg, training):
        """First-stage box decode + NMS proposal selection (no target sampling)."""
        from ..dense_heads.anchor_head_single import generate_predicted_boxes
        from ..roi_heads.roi_utils import proposal_layer

        roi_cfg = cfg["ROI_HEAD"]
        dense_name = (
            self.model_cfg["DENSE_HEAD"]["NAME"] if self.model_cfg.get("DENSE_HEAD") else None
        )
        if dense_name == "CenterHead":
            # CenterHead RPN (waymo pv_rcnn_with_centerhead_rpn /
            # voxel_rcnn_with_centerhead_dyn_voxel): the top-K heatmap decode IS
            # the proposal ranking; optional NMS below prunes duplicates.
            return self._centerhead_proposals(batch_dict, cfg, training)
        if dense_name == "AnchorHeadSingle":
            cls_logits, box_preds = generate_predicted_boxes(
                batch_dict, jnp.asarray(self.anchors), cfg["DENSE_HEAD"], self.box_coder_ref
            )
        elif "batch_box_preds" in batch_dict:
            # point-wise proposals (PointRCNN: PointHeadBox decoded boxes)
            cls_logits = batch_dict["batch_cls_preds"]
            box_preds = batch_dict["batch_box_preds"]
        else:
            raise NotImplementedError(f"ROI head over {dense_name} not wired yet")

        nms_cfg_all = roi_cfg.get("NMS_CONFIG", None)
        if nms_cfg_all is not None:
            nms_cfg = nms_cfg_all.get("TRAIN" if training else "TEST", nms_cfg_all)
            rois, roi_scores, roi_labels, roi_mask = proposal_layer(
                box_preds, cls_logits, nms_cfg, normalized=False
            )
            batch_dict["rois"] = rois[..., :7]
            batch_dict["roi_scores"] = roi_scores
            batch_dict["roi_labels"] = roi_labels
            batch_dict["roi_mask"] = roi_mask
        else:
            probs = jax.nn.sigmoid(cls_logits)
            scores = probs.max(axis=-1)
            labels = probs.argmax(axis=-1) + 1
            n_rois = int(roi_cfg.get("NUM_ROIS", 128))
            top_scores, idx = jax.lax.top_k(scores, n_rois)
            batch_dict["rois"] = jnp.take_along_axis(box_preds, idx[..., None], axis=1)[..., :7]
            batch_dict["roi_scores"] = top_scores
            batch_dict["roi_labels"] = jnp.take_along_axis(labels, idx, axis=1)
            batch_dict["roi_mask"] = jnp.ones(top_scores.shape, dtype=bool)

        return batch_dict

    def _centerhead_proposals(self, batch_dict, cfg, training):
        """CenterHead first-stage proposals: top-K decode (+ optional NMS).

        Reference: CenterHead.generate_predicted_boxes feeding
        RoIHeadTemplate.proposal_layer in pv_rcnn_with_centerhead_rpn."""
        from ...ops.nms import class_agnostic_nms
        from ..dense_heads.center_head import CenterHead

        roi_cfg = cfg["ROI_HEAD"]
        helper = CenterHead(
            model_cfg=cfg["DENSE_HEAD"],
            input_channels=0,
            num_class=self.num_class,
            class_names=self.meta.class_names,
            grid_size=self.meta.grid_size,
            point_cloud_range=self.meta.point_cloud_range,
            voxel_size=self.meta.voxel_size,
        )
        nms_cfg_all = roi_cfg.get("NMS_CONFIG", None)
        if nms_cfg_all is not None:
            nms_cfg = nms_cfg_all.get("TRAIN" if training else "TEST", nms_cfg_all)
            pre_max = int(nms_cfg.get("NMS_PRE_MAXSIZE", 512))
            post_max = int(nms_cfg.get("NMS_POST_MAXSIZE", 128))
            thresh = float(nms_cfg.get("NMS_THRESH", 0.7))
            boxes, scores, labels = helper.generate_predicted_boxes(
                batch_dict, max_obj=min(pre_max, 512)
            )

            def one(bx, sc, lb):
                idx, mask = class_agnostic_nms(
                    sc, bx[:, :7], score_thresh=None, nms_thresh=thresh,
                    pre_maxsize=bx.shape[0], post_maxsize=post_max,
                )
                return bx[idx], sc[idx] * mask, lb[idx] * mask, mask

            rois, roi_scores, roi_labels, roi_mask = jax.vmap(one)(boxes, scores, labels)
        else:
            n_rois = int(roi_cfg.get("NUM_ROIS", 128))
            rois, roi_scores, roi_labels = helper.generate_predicted_boxes(
                batch_dict, max_obj=n_rois
            )
            roi_mask = jnp.ones(roi_scores.shape, dtype=bool)
        batch_dict["rois"] = rois[..., :7]
        batch_dict["roi_scores"] = roi_scores
        batch_dict["roi_labels"] = roi_labels
        batch_dict["roi_mask"] = roi_mask
        return batch_dict

    def _apply_roi_head(self, batch_dict, cfg, training):
        from ..roi_heads import __all__ as roi_heads

        roi_cfg = cfg["ROI_HEAD"]
        head_name = roi_cfg["NAME"]
        if head_name == "SECONDHead":
            head = roi_heads[head_name](
                model_cfg=roi_cfg,
                input_channels=batch_dict["spatial_features_2d"].shape[-1],
                point_cloud_range=self.meta.point_cloud_range,
                voxel_size=self.meta.voxel_size,
                bev_stride=int(roi_cfg.get("BEV_STRIDE", 8)),
                name="roi_head",
            )
        elif head_name == "VoxelRCNNHead":
            head = roi_heads[head_name](
                model_cfg=roi_cfg,
                voxel_size=self.meta.voxel_size,
                point_cloud_range=self.meta.point_cloud_range,
                grid_size=self.meta.grid_size,
                num_class=self.num_class,
                name="roi_head",
            )
        else:
            head = roi_heads[head_name](
                model_cfg=roi_cfg, num_class=self.num_class, name="roi_head"
            )
        return head(batch_dict, training=training)


class DetectorBundle:
    """Functional surface over a Detector3D: init / loss / predict.

    The analog of the reference's built network object + model_fn_decorator
    (pcdet/models/__init__.py:16-125), reorganized as pure functions suitable for
    jax.jit / jax.grad.
    """

    def __init__(self, model_cfg, num_class, dataset):
        self.model_cfg = model_cfg
        self.num_class = num_class
        self.meta = DatasetMeta.from_dataset(dataset)
        self.dense_head_name = (
            model_cfg["DENSE_HEAD"]["NAME"] if model_cfg.get("DENSE_HEAD") else None
        )

        self.anchors = None
        self.assigner = None
        self.head_groups = None
        num_anchors_per_loc, fmap = 1, (0, 0)
        code_size = 7
        extra_module_kwargs = {}
        if self.dense_head_name == "AnchorHeadSingle":
            gen = AnchorGenerator(
                model_cfg["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"],
                self.meta.point_cloud_range,
                self.meta.grid_size,
            )
            anchors, anchor_cls, m_thr, u_thr, fmap, num_anchors_per_loc = gen.generate()
            ta_cfg = model_cfg["DENSE_HEAD"].get("TARGET_ASSIGNER_CONFIG", {})
            bc_cfg = ta_cfg.get("BOX_CODER_CONFIG", {})
            self.box_coder = ResidualCoder(
                code_size=int(bc_cfg.get("code_size", 7)),
                encode_angle_by_sincos=bool(bc_cfg.get("encode_angle_by_sincos", False)),
            )
            code_size = self.box_coder.code_size
            self.anchors = jnp.asarray(anchors)
            if ta_cfg.get("NAME") == "ATSSTargetAssigner":
                from ..dense_heads.target_assigner.atss_target_assigner import (
                    ATSSTargetAssigner,
                )

                self.assigner = ATSSTargetAssigner(
                    ta_cfg.get("TOPK", 9), self.box_coder, anchors,
                    match_height=ta_cfg.get("MATCH_HEIGHT", False),
                )
            else:
                self.assigner = AxisAlignedTargetAssigner(
                    anchors, anchor_cls, m_thr, u_thr, self.box_coder
                )
        elif self.dense_head_name == "AnchorHeadMulti":
            # one independent anchor set + assigner per RPN_HEAD_CFGS group
            # (reference anchor_head_multi.make_multihead)
            bc_cfg = model_cfg["DENSE_HEAD"].get(
                "TARGET_ASSIGNER_CONFIG", {}
            ).get("BOX_CODER_CONFIG", {})
            self.box_coder = ResidualCoder(
                code_size=int(bc_cfg.get("code_size", 7)),
                encode_angle_by_sincos=bool(bc_cfg.get("encode_angle_by_sincos", False)),
            )
            code_size = self.box_coder.code_size
            all_gen_cfgs = model_cfg["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"]
            self.head_groups = [
                list(h["HEAD_CLS_NAME"]) for h in model_cfg["DENSE_HEAD"]["RPN_HEAD_CFGS"]
            ]
            self.head_anchors, self.head_assigners = [], []
            self.head_label_indices = []
            head_num_anchors = []
            for group in self.head_groups:
                cfgs = [c for c in all_gen_cfgs if c["class_name"] in group]
                # remap thresholds/classes into the LOCAL 1..nc_h space
                gen = AnchorGenerator(cfgs, self.meta.point_cloud_range, self.meta.grid_size)
                anchors, anchor_cls, m_thr, u_thr, fmap, napl = gen.generate()
                self.head_anchors.append(jnp.asarray(anchors))
                self.head_assigners.append(
                    AxisAlignedTargetAssigner(anchors, anchor_cls, m_thr, u_thr, self.box_coder)
                )
                self.head_label_indices.append(
                    np.asarray([self.meta.class_names.index(c) + 1 for c in group])
                )
                head_num_anchors.append(napl)
            extra_module_kwargs = dict(
                head_num_classes=tuple(len(g) for g in self.head_groups),
                head_num_anchors=tuple(head_num_anchors),
            )
        else:
            self.box_coder = None
        self._extra_module_kwargs = extra_module_kwargs

        self.module = Detector3D(
            model_cfg=model_cfg,
            num_class=num_class,
            meta=self.meta,
            num_anchors_per_location=num_anchors_per_loc,
            code_size=code_size,
            feature_map_size=tuple(fmap),
            anchors=np.asarray(self.anchors) if self.anchors is not None else None,
            box_coder_ref=self.box_coder,
            multihead_kwargs=tuple(sorted(extra_module_kwargs.items())),
        )
        self.post_cfg = model_cfg.get("POST_PROCESSING", {})
        self.has_roi_head = model_cfg.get("ROI_HEAD", None) is not None
        self.roi_box_coder = None
        if self.has_roi_head and model_cfg["ROI_HEAD"].get("TARGET_CONFIG"):
            self.roi_box_coder = ResidualCoder(code_size=7)

    # -- lifecycle -----------------------------------------------------------
    def init(self, rng, example_batch):
        # jit the whole init: un-jitted tracing executes each op individually on
        # device (catastrophically slow over a remote-compile TPU tunnel)
        def _init(rng, batch):
            k1, k2, k3 = jax.random.split(rng, 3)
            return self.module.init(
                {"params": k1, "sampling": k2, "dropout": k3}, batch, training=True
            )

        return jax.jit(_init)(rng, example_batch)

    # -- training ------------------------------------------------------------
    def head_loss(self, out, gt_boxes, batch_size):
        """Detection loss given forward outputs (pure, jittable)."""
        out = dict(out)
        out["batch_size"] = batch_size
        if self.dense_head_name == "AnchorHeadSingle":
            targets = self.assigner.assign(gt_boxes)
            total, tb = anchor_head_loss(
                out, targets, self.anchors, self.model_cfg["DENSE_HEAD"],
                self.num_class, self.box_coder,
            )
        elif self.dense_head_name == "AnchorHeadMulti":
            from ..dense_heads.anchor_head_multi import multi_head_loss

            head_targets = [
                a.assign(self._remap_gt_for_head(gt_boxes, gi))
                for gi, a in enumerate(self.head_assigners)
            ]
            total, tb = multi_head_loss(
                out, head_targets, self.head_anchors, self.model_cfg["DENSE_HEAD"],
                [len(g) for g in self.head_groups], self.box_coder,
            )
        elif self.dense_head_name == "CenterHead":
            total, tb = self._center_head_helper().get_loss(out, gt_boxes)
        elif self.dense_head_name is None:
            total, tb = 0.0, {}  # point-based detectors: losses come from heads
        else:
            raise NotImplementedError(self.dense_head_name)
        return self._add_roi_loss(out, gt_boxes, total, tb)

    def _remap_gt_for_head(self, gt_boxes, gi):
        """Remap global gt class ids (LAST column) to the head group's local
        1..nc_h space; other classes become 0 (invalid)."""
        group_ids = jnp.asarray(
            [self.meta.class_names.index(c) + 1 for c in self.head_groups[gi]],
            dtype=jnp.int32,
        )
        gcls = gt_boxes[..., -1].astype(jnp.int32)
        eq = gcls[..., None] == group_ids
        local = jnp.where(eq.any(-1), eq.argmax(-1) + 1, 0).astype(gt_boxes.dtype)
        return jnp.concatenate([gt_boxes[..., :-1], local[..., None]], axis=-1)

    def _add_roi_loss(self, out, gt_boxes, total, tb):
        if self.model_cfg.get("POINT_HEAD") and "point_cls_preds" in out:
            ph_name = self.model_cfg["POINT_HEAD"].get("NAME")
            if ph_name == "PointHeadBox":
                from ..dense_heads.point_head_box import point_head_box_loss as ph_loss
            elif ph_name == "PointHeadIntraPart":
                from ..dense_heads.point_head_intra_part import (
                    point_head_intra_part_loss as ph_loss,
                )
            else:
                from ..dense_heads.point_head_simple import point_head_loss as ph_loss

            p_loss, p_tb = ph_loss(
                out, gt_boxes, self.model_cfg["POINT_HEAD"], self.num_class
            )
            total = total + p_loss
            tb = {**tb, **p_tb}
        if self.has_roi_head and "roi_ious" in out:
            from ..roi_heads.second_head import second_head_loss

            iou_loss, iou_tb = second_head_loss(out, gt_boxes)
            w = float(self.model_cfg["ROI_HEAD"].get("IOU_LOSS_WEIGHT", 1.0))
            total = total + w * iou_loss
            tb = {**tb, **iou_tb}
        if self.roi_box_coder is not None and "rcnn_reg" in out and "rcnn_cls_labels" in out:
            from ..roi_heads.roi_utils import roi_losses

            rcnn_loss, rcnn_tb = roi_losses(
                out, self.model_cfg["ROI_HEAD"]["LOSS_CONFIG"], self.roi_box_coder
            )
            total = total + rcnn_loss
            tb = {**tb, **rcnn_tb}
        tb = {**tb, "rpn_loss": total}
        return total, tb

    def loss(self, variables, batch_dict, training=True, mutable=("batch_stats",), rng=None):
        """Returns (loss, (tb_dict, new_model_state)) — pure function."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        out, new_state = self.module.apply(
            variables, batch_dict, training=training, mutable=list(mutable),
            rngs={"sampling": k1, "dropout": k2},
        )
        total, tb = self.head_loss(
            out, batch_dict["gt_boxes"], batch_dict.get("batch_size", batch_dict["points"].shape[0])
        )
        if "depth_logits" in out and "depth_maps" in out:
            # CaDDN depth distribution loss (ImageVFE; reference ddn_loss)
            from ..backbones_3d.vfe.image_vfe import ddn_depth_loss

            vfe_cfg = self.model_cfg.get("VFE", {})
            disc = vfe_cfg.get("FFN", {}).get("DDN", {}).get(
                "disc_cfg", vfe_cfg.get("DISC_CFG", {})
            )
            lcfg = vfe_cfg.get("LOSS", {}).get("ARGS", {})
            d_loss = ddn_depth_loss(
                out["depth_logits"], out["depth_maps"], disc,
                weight=float(lcfg.get("weight", 3.0)),
                alpha=float(lcfg.get("alpha", 0.25)),
                gamma=float(lcfg.get("gamma", 2.0)),
            )
            total = total + d_loss
            tb = dict(tb, depth_loss=d_loss)
        return total, (tb, new_state)

    def decode_topk(self, out, k=32):
        """(B, k) best decoded boxes + sigmoid scores, no NMS — for the stage-2
        consistency matching (jittable)."""
        if self.dense_head_name == "AnchorHeadSingle":
            cls_logits, box_preds = generate_predicted_boxes(
                out, self.anchors, self.model_cfg["DENSE_HEAD"], self.box_coder
            )
            scores = jax.nn.sigmoid(cls_logits).max(axis=-1)
        else:
            box_preds, scores, _ = self._center_decode(out)
        top_scores, idx = jax.lax.top_k(scores, min(k, scores.shape[-1]))
        top_boxes = jnp.take_along_axis(box_preds, idx[..., None], axis=1)
        return top_boxes[..., :7], top_scores

    # -- inference -----------------------------------------------------------
    def predict(self, variables, batch_dict):
        """Forward + decode + NMS -> dict of (B, K) final detections."""
        out = self.module.apply(variables, batch_dict, training=False)
        return self.post_processing(out)

    def post_processing(self, out):
        """Reference detector3d_template.post_processing (:178-328), static-K."""
        cfg = self.post_cfg
        nms_cfg = cfg.get("NMS_CONFIG", {})
        score_thresh = cfg.get("SCORE_THRESH", 0.1)
        pre_max = int(nms_cfg.get("NMS_PRE_MAXSIZE", 1024))
        post_max = int(nms_cfg.get("NMS_POST_MAXSIZE", 128))
        nms_thresh = float(nms_cfg.get("NMS_THRESH", 0.2))

        if self.roi_box_coder is not None and "rcnn_reg" in out:
            # two-stage refinement path (PV-RCNN family): decode RoI-relative
            # regression, score with the rcnn cls branch
            from ..roi_heads.roi_utils import generate_predicted_boxes_roi

            rcnn_cls, box_preds = generate_predicted_boxes_roi(
                out["rois"], out["rcnn_cls"], out["rcnn_reg"], self.roi_box_coder
            )
            scores = jax.nn.sigmoid(rcnn_cls[..., 0]) * out["roi_mask"]
            labels = out["roi_labels"]
        elif self.has_roi_head and "roi_ious" in out:
            # SECOND-IoU rescoring path (reference second_net_iou post-processing)
            from ..roi_heads.second_head import rescore_detections

            score_type = self.post_cfg.get("SCORE_TYPE", "weighted_iou_cls")
            num_pts = None
            if score_type == "num_pts_iou_cls" and "points" in out:
                from ...ops.points_in_boxes import points_in_boxes

                def count_one(pts, mask, rois):
                    member = points_in_boxes(pts, rois) & mask[None, :]
                    return member.sum(axis=1)

                num_pts = jax.vmap(count_one)(out["points"], out["points_mask"], out["rois"])
            box_preds = out["rois"]
            labels = out["roi_labels"]
            scores = rescore_detections(
                out["roi_scores"], out["roi_ious"], num_pts=num_pts,
                score_type=score_type,
                iou_weight=float(self.post_cfg.get("IOU_WEIGHT", 0.68)),
            )
        elif self.dense_head_name == "AnchorHeadSingle":
            cls_logits, box_preds = generate_predicted_boxes(
                out, self.anchors, self.model_cfg["DENSE_HEAD"], self.box_coder
            )
            scores_all = jax.nn.sigmoid(cls_logits)  # (B, N, nc)
            scores = scores_all.max(axis=-1)
            labels = scores_all.argmax(axis=-1) + 1
        elif self.dense_head_name == "AnchorHeadMulti":
            from ..dense_heads.anchor_head_multi import multi_head_predicted_boxes

            box_preds, scores, labels = multi_head_predicted_boxes(
                out, self.head_anchors, self.head_label_indices,
                self.model_cfg["DENSE_HEAD"], self.box_coder,
            )
        else:  # CenterHead
            box_preds, scores, labels = self._center_decode(out)

        def one(boxes, sc, lb):
            idx, mask = class_agnostic_nms(
                sc, boxes[:, :7], score_thresh=score_thresh, nms_thresh=nms_thresh,
                pre_maxsize=pre_max, post_maxsize=post_max,
            )
            return {
                "pred_boxes": boxes[idx],
                "pred_scores": sc[idx] * mask,
                "pred_labels": lb[idx] * mask,
                "pred_mask": mask,
            }

        dets = jax.vmap(one)(box_preds, scores, labels)
        if "rois" in out:
            # expose first-stage proposals so eval can track recall_roi_* next
            # to final-box recall (reference detector3d_template.py:286-328)
            dets["rois"] = out["rois"]
            dets["roi_mask"] = out.get(
                "roi_mask", jnp.ones(out["rois"].shape[:2], out["rois"].dtype)
            )
        return dets

    def _center_head_helper(self):
        """A detached CenterHead: target assignment and decode are pure functions
        of the forward outputs + static cfg — no flax params involved."""
        from ..dense_heads.center_head import CenterHead

        return CenterHead(
            model_cfg=self.model_cfg["DENSE_HEAD"],
            input_channels=0,
            num_class=self.num_class,
            class_names=self.meta.class_names,
            grid_size=self.meta.grid_size,
            point_cloud_range=self.meta.point_cloud_range,
            voxel_size=self.meta.voxel_size,
        )

    def _center_decode(self, out):
        max_obj = int(self.post_cfg.get("MAX_OBJ_PER_SAMPLE", 128))
        return self._center_head_helper().generate_predicted_boxes(out, max_obj=max_obj)


def build_detector(model_cfg, num_class, dataset):
    return DetectorBundle(model_cfg=model_cfg, num_class=num_class, dataset=dataset)

"""PointHeadIntraPart — per-voxel segmentation + intra-object part regression
(PartA2 stage 1).

Reference: pcdet/models/dense_heads/point_intra_part_head.py (PointIntraPartOffsetHead):
cls branch (fg segmentation) + part branch regressing each fg point's relative
(x, y, z) position INSIDE its gt box (sigmoid targets in [0, 1]); optional box
branch (REG_FC + PointResidualCoder, reference :31-37,101-122) used by the
anchor-free PartA2_free config to emit per-point proposals.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.points_in_boxes import points_box_id
from ...utils import loss_utils
from ..model_utils.masked_norm import MaskedBatchNorm
from .point_head_simple import assign_point_targets


class PointHeadIntraPart(nn.Module):
    model_cfg: dict
    num_class: int

    @nn.compact
    def __call__(self, batch_dict, training=False):
        feats = batch_dict["point_features"]
        mask = batch_dict["point_mask"]
        nc = 1 if self.model_cfg.get("CLASS_AGNOSTIC", True) else self.num_class

        def branch(x, fcs, out_ch, tag):
            for i, ch in enumerate(fcs):
                x = nn.Dense(int(ch), use_bias=False, name=f"{tag}_fc{i}")(x)
                x = MaskedBatchNorm(name=f"{tag}_bn{i}")(x, mask, training=training)
                x = nn.relu(x)
            return nn.Dense(out_ch, name=f"{tag}_out")(x)

        logits = branch(feats, self.model_cfg["CLS_FC"], nc, "cls")
        part = branch(feats, self.model_cfg["PART_FC"], 3, "part")
        batch_dict["point_cls_preds"] = logits
        batch_dict["point_part_preds"] = part
        batch_dict["point_cls_scores"] = jax.nn.sigmoid(logits).max(axis=-1)
        batch_dict["point_part_offset"] = jax.nn.sigmoid(part)

        if self.model_cfg.get("REG_FC"):
            # anchor-free box branch (PartA2_free): per-point proposals decoded
            # against the point coords, same contract as PointHeadBox
            from .point_head_box import build_point_box_coder

            coder = build_point_box_coder(self.model_cfg)
            box_preds = branch(feats, self.model_cfg["REG_FC"], coder.code_size, "box")
            batch_dict["point_box_preds_raw"] = box_preds
            pred_cls = logits.argmax(axis=-1) + 1
            batch_dict["batch_box_preds"] = coder.decode(
                box_preds, batch_dict["point_coords"], pred_cls
            )
            batch_dict["batch_cls_preds"] = logits
        return batch_dict


def part_targets(point_coords, gt_boxes):
    """Per-point intra-part offsets in [0, 1]^3 of the containing gt box
    (reference assign_stack_targets ret_part_labels branch)."""

    def one(kp, gt):
        valid_gt = gt[:, -1] > 0
        boxes = jnp.where(valid_gt[:, None], gt[:, :7], 0.0)
        bid = points_box_id(kp, boxes)
        g = gt[jnp.clip(bid, 0, None)]
        rel = kp - g[:, :3]
        c, s = jnp.cos(-g[:, 6]), jnp.sin(-g[:, 6])
        lx = rel[:, 0] * c - rel[:, 1] * s
        ly = rel[:, 0] * s + rel[:, 1] * c
        local = jnp.stack([lx, ly, rel[:, 2]], axis=1)
        part = jnp.clip(local / jnp.clip(g[:, 3:6], 1e-4, None) + 0.5, 0.0, 1.0)
        return jnp.where((bid >= 0)[:, None], part, 0.0)

    return jax.vmap(one)(point_coords, gt_boxes)


def point_head_intra_part_loss(batch_dict, gt_boxes, model_cfg, num_class):
    """Focal seg loss + BCE part loss on fg points."""
    logits = batch_dict["point_cls_preds"]
    nc = logits.shape[-1]
    labels = assign_point_targets(
        batch_dict["point_coords"], batch_dict["point_mask"], gt_boxes,
        model_cfg["TARGET_CONFIG"].get("GT_EXTRA_WIDTH", (0.2, 0.2, 0.2)), nc,
    )
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (positives + negatives).astype(logits.dtype)
    pos_norm = jnp.clip(positives.sum(), 1.0, None)
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None), nc + 1)[..., 1:]
    lw = model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
    cls_loss = (
        loss_utils.sigmoid_focal_cls_loss(logits, one_hot, cls_weights / pos_norm).sum()
        * float(lw.get("point_cls_weight", 1.0))
    )

    targets = part_targets(batch_dict["point_coords"], gt_boxes)
    p = jax.nn.sigmoid(batch_dict["point_part_preds"])
    bce = -(
        targets * jnp.log(jnp.clip(p, 1e-7, 1.0))
        + (1 - targets) * jnp.log(jnp.clip(1 - p, 1e-7, 1.0))
    ).sum(-1)
    part_loss = (
        (bce * positives).sum() / pos_norm * float(lw.get("point_part_weight", 1.0))
    )
    total = cls_loss + part_loss
    tb = {"point_loss_cls": cls_loss, "point_loss_part": part_loss}

    if "point_box_preds_raw" in batch_dict:
        # PartA2_free box branch: smooth-L1 on fg points, same targets as
        # PointHeadBox (reference get_box_layer_loss)
        from .point_head_box import build_point_box_coder

        coder = build_point_box_coder(model_cfg)

        def one(kp, gt):
            boxes = jnp.where((gt[:, -1] > 0)[:, None], gt[:, :7], 0.0)
            bid = points_box_id(kp, boxes)
            g = gt[jnp.clip(bid, 0, None)]
            return coder.encode(g[:, :7], kp, g[:, -1].astype(jnp.int32))

        box_targets = jax.vmap(one)(batch_dict["point_coords"], gt_boxes)
        box_preds = batch_dict["point_box_preds_raw"]
        reg = loss_utils.weighted_smooth_l1_loss(
            box_preds, box_targets, code_weights=lw.get("code_weights", None)
        )
        fg = positives.astype(box_preds.dtype)
        box_loss = (
            (reg * fg[..., None]).sum() / pos_norm
            * float(lw.get("point_box_weight", 1.0))
        )
        total = total + box_loss
        tb["point_loss_box"] = box_loss
    return total, tb

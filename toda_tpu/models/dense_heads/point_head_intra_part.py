"""PointHeadIntraPart — per-voxel segmentation + intra-object part regression
(PartA2 stage 1).

Reference: pcdet/models/dense_heads/point_intra_part_head.py (PointIntraPartOffsetHead):
cls branch (fg segmentation) + part branch regressing each fg point's relative
(x, y, z) position INSIDE its gt box (sigmoid targets in [0, 1]); optional box
branch unused in the PartA2 default config.
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
    return total, {"point_loss_cls": cls_loss, "point_loss_part": part_loss}

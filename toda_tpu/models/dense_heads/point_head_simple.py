"""PointHeadSimple — keypoint foreground segmentation head (PV-RCNN).

Reference: pcdet/models/dense_heads/point_head_simple.py:1-100 +
point_head_template.assign_stack_targets (:49-120, set_ignore_flag branch) and
get_cls_layer_loss (:130-160). JAX redesign: points are (B, K, 3) dense with a
validity mask instead of stacked rows; target assignment is a vmapped pure
function of (keypoints, gt_boxes).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.points_in_boxes import points_box_id
from ...utils import loss_utils
from ..model_utils.masked_norm import MaskedBatchNorm


class PointHeadSimple(nn.Module):
    model_cfg: dict
    num_class: int

    @nn.compact
    def __call__(self, batch_dict, training=False):
        if self.model_cfg.get("USE_POINT_FEATURES_BEFORE_FUSION", False):
            feats = batch_dict["point_features_before_fusion"]
        else:
            feats = batch_dict["point_features"]
        mask = batch_dict["point_mask"]
        nc = 1 if self.model_cfg.get("CLASS_AGNOSTIC", True) else self.num_class
        h = feats
        for i, ch in enumerate(self.model_cfg["CLS_FC"]):
            h = nn.Dense(int(ch), use_bias=False, name=f"cls_fc{i}")(h)
            h = MaskedBatchNorm(name=f"cls_bn{i}")(h, mask, training=training)
            h = nn.relu(h)
        logits = nn.Dense(nc, name="cls_out")(h)  # (B, K, nc)
        batch_dict["point_cls_preds"] = logits
        batch_dict["point_cls_scores"] = jax.nn.sigmoid(logits).max(axis=-1)  # (B, K)
        return batch_dict


def assign_point_targets(point_coords, point_mask, gt_boxes, extra_width, num_class):
    """(B, K, 3) keypoints + (B, M, 8+) gt -> (B, K) int32 labels
    (0 bg, -1 ignore [in enlarged box only], >0 class).

    Reference: point_head_template.assign_stack_targets with set_ignore_flag.
    """
    ew = jnp.asarray(extra_width, dtype=gt_boxes.dtype)

    def one(kp, kp_mask, gt):
        valid_gt = gt[:, -1] > 0
        boxes = jnp.where(valid_gt[:, None], gt[:, :7], 0.0)
        big = boxes.at[:, 3:6].add(ew[None, :])
        big = jnp.where(valid_gt[:, None], big, 0.0)
        box_id = points_box_id(kp, boxes)
        ext_id = points_box_id(kp, big)
        fg = box_id >= 0
        ignore = (~fg) & (ext_id >= 0)
        if num_class == 1:
            cls_of = jnp.ones_like(box_id)
        else:
            cls_of = gt[jnp.clip(box_id, 0, None), -1].astype(jnp.int32)
        labels = jnp.where(fg, cls_of, jnp.where(ignore, -1, 0))
        return jnp.where(kp_mask, labels, -1)

    return jax.vmap(one)(point_coords, point_mask, gt_boxes)


def point_head_loss(batch_dict, gt_boxes, model_cfg, num_class):
    """Sigmoid-focal keypoint segmentation loss
    (reference point_head_template.get_cls_layer_loss)."""
    logits = batch_dict["point_cls_preds"]  # (B, K, nc)
    nc = logits.shape[-1]
    labels = assign_point_targets(
        batch_dict["point_coords"],
        batch_dict["point_mask"],
        gt_boxes,
        model_cfg["TARGET_CONFIG"].get("GT_EXTRA_WIDTH", (0.2, 0.2, 0.2)),
        1 if model_cfg.get("CLASS_AGNOSTIC", True) else num_class,
    )
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (positives + negatives).astype(logits.dtype)
    pos_norm = jnp.clip(positives.sum(), 1.0, None)
    cls_weights = cls_weights / pos_norm
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None), nc + 1)[..., 1:]
    loss = loss_utils.sigmoid_focal_cls_loss(logits, one_hot, cls_weights).sum()
    w = float(model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"].get("point_cls_weight", 1.0))
    loss = loss * w
    return loss, {"point_loss_cls": loss}

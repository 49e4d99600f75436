"""Single-scale anchor head (SECOND / PointPillars).

Reference: pcdet/models/dense_heads/anchor_head_single.py (75 LoC) over
anchor_head_template.py:11-275 (anchor gen, assignment dispatch, focal +
smooth-L1(sin-diff) + direction losses, decode). Merged into one flax module +
helper functions; anchors/assigner are numpy/static companions built by the
detector, passed in as module constants.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import loss_utils
from ...utils.common_utils import limit_period_jnp


def add_sin_difference(boxes1, boxes2, dim=6):
    """Encode heading residual via sin(a-b) = sin a cos b - cos a sin b
    (reference anchor_head_template.add_sin_difference)."""
    rad_pred = jnp.sin(boxes1[..., dim : dim + 1]) * jnp.cos(boxes2[..., dim : dim + 1])
    rad_tg = jnp.cos(boxes1[..., dim : dim + 1]) * jnp.sin(boxes2[..., dim : dim + 1])
    b1 = jnp.concatenate([boxes1[..., :dim], rad_pred, boxes1[..., dim + 1 :]], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :dim], rad_tg, boxes2[..., dim + 1 :]], axis=-1)
    return b1, b2


def get_direction_target(gt_heading, dir_offset, num_bins):
    """Heading -> direction bin (reference anchor_head_template.get_direction_target
    :150-157 — bins the absolute gt heading, rot_gt = reg_target + anchor_rot)."""
    offset_rot = limit_period_jnp(gt_heading - dir_offset, 0.0, 2 * np.pi)
    dir_cls = jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32)
    return jnp.clip(dir_cls, 0, num_bins - 1)


class AnchorHeadSingle(nn.Module):
    model_cfg: dict
    input_channels: int
    num_class: int
    num_anchors_per_location: int
    code_size: int
    feature_map_size: tuple  # (H, W)

    @nn.compact
    def __call__(self, batch_dict, training=False):
        x = batch_dict["spatial_features_2d"]  # (B, H, W, C)
        a = self.num_anchors_per_location
        b = x.shape[0]

        cls_preds = nn.Conv(a * self.num_class, (1, 1), name="conv_cls",
                            bias_init=nn.initializers.constant(-float(np.log((1 - 0.01) / 0.01))))(x)
        box_preds = nn.Conv(a * self.code_size, (1, 1), name="conv_box")(x)

        batch_dict["cls_preds"] = cls_preds.reshape(b, -1, self.num_class)  # (B, N, nc)
        batch_dict["box_preds"] = box_preds.reshape(b, -1, self.code_size)  # (B, N, cs)

        if self.model_cfg.get("USE_DIRECTION_CLASSIFIER", False):
            num_bins = self.model_cfg.get("NUM_DIR_BINS", 2)
            dir_preds = nn.Conv(a * num_bins, (1, 1), name="conv_dir_cls")(x)
            batch_dict["dir_cls_preds"] = dir_preds.reshape(b, -1, num_bins)
        return batch_dict


def anchor_head_loss(batch_dict, targets, anchors, model_cfg, num_class, box_coder):
    """Classification + box-regression + direction losses.

    Reference: anchor_head_template.get_cls_layer_loss / get_box_reg_layer_loss.
    """
    lw = model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
    cls_preds = batch_dict["cls_preds"]  # (B, N, nc)
    box_preds = batch_dict["box_preds"]
    labels = targets["box_cls_labels"]  # (B, N)
    reg_targets = targets["box_reg_targets"]
    reg_weights = targets["reg_weights"]

    positives = labels > 0
    negatives = labels == 0
    cls_weights = (negatives + positives).astype(cls_preds.dtype)
    pos_norm = jnp.maximum(positives.sum(axis=1, keepdims=True), 1.0)
    cls_weights = cls_weights / pos_norm

    one_hot = jax.nn.one_hot(jnp.clip(labels, 0, None), num_class + 1)[..., 1:]
    cls_loss = loss_utils.sigmoid_focal_cls_loss(cls_preds, one_hot, cls_weights)
    cls_loss = cls_loss.sum() / batch_dict["batch_size"] * lw["cls_weight"]

    pred_sin, tg_sin = add_sin_difference(box_preds, reg_targets)
    loc_loss = loss_utils.weighted_smooth_l1_loss(
        pred_sin, tg_sin, reg_weights, code_weights=lw.get("code_weights", None)
    )
    loc_loss = loc_loss.sum() / batch_dict["batch_size"] * lw["loc_weight"]

    tb_dict = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
    total = cls_loss + loc_loss

    if "dir_cls_preds" in batch_dict:
        num_bins = model_cfg.get("NUM_DIR_BINS", 2)
        dir_offset = model_cfg.get("DIR_OFFSET", 0.78539)
        dir_targets = get_direction_target(
            targets["matched_gt_heading"], dir_offset, num_bins
        )
        dir_one_hot = jax.nn.one_hot(dir_targets, num_bins)
        dir_loss = loss_utils.weighted_cross_entropy_loss(
            batch_dict["dir_cls_preds"], dir_one_hot, reg_weights
        )
        dir_loss = dir_loss.sum() / batch_dict["batch_size"] * lw["dir_weight"]
        total = total + dir_loss
        tb_dict["rpn_loss_dir"] = dir_loss

    tb_dict["rpn_loss"] = total
    return total, tb_dict


def generate_predicted_boxes(batch_dict, anchors, model_cfg, box_coder):
    """Decode per-anchor predictions to world boxes (+ direction correction).

    Reference: anchor_head_template.generate_predicted_boxes (:236-275).
    Returns (batch_cls_preds (B, N, nc) logits, batch_box_preds (B, N, 7)).
    """
    box_preds = batch_dict["box_preds"]
    batch_box_preds = box_coder.decode(box_preds, anchors[None])
    if "dir_cls_preds" in batch_dict:
        num_bins = model_cfg.get("NUM_DIR_BINS", 2)
        dir_offset = model_cfg.get("DIR_OFFSET", 0.78539)
        dir_limit_offset = model_cfg.get("DIR_LIMIT_OFFSET", 0.0)
        dir_labels = batch_dict["dir_cls_preds"].argmax(axis=-1)
        period = 2 * np.pi / num_bins
        dir_rot = limit_period_jnp(batch_box_preds[..., 6] - dir_offset, dir_limit_offset, period)
        heading = dir_rot + dir_offset + period * dir_labels.astype(batch_box_preds.dtype)
        batch_box_preds = batch_box_preds.at[..., 6].set(heading)
    return batch_dict["cls_preds"], batch_box_preds

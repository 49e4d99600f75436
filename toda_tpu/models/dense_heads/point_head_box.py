"""PointHeadBox — per-point classification + box regression (PointRCNN stage 1).

Reference: pcdet/models/dense_heads/point_head_box.py:1-115 +
point_head_template.assign_stack_targets (ret_box_labels branch) and
get_box_layer_loss. Targets: points inside a gt box get its class and a
PointResidualCoder encoding against the point; extended-box points are ignored
for classification.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.points_in_boxes import points_box_id
from ...utils import loss_utils
from ...utils.box_coder_utils import PointResidualCoder
from ..model_utils.masked_norm import MaskedBatchNorm
from .point_head_simple import assign_point_targets


def build_point_box_coder(model_cfg):
    tc = model_cfg["TARGET_CONFIG"]
    cfg = tc.get("BOX_CODER_CONFIG", {})
    return PointResidualCoder(
        code_size=8,
        use_mean_size=bool(cfg.get("use_mean_size", True)),
        mean_size=cfg.get("mean_size", [[3.9, 1.6, 1.56]]),
    )


class PointHeadBox(nn.Module):
    model_cfg: dict
    num_class: int

    @nn.compact
    def __call__(self, batch_dict, training=False):
        feats = batch_dict["point_features"]
        mask = batch_dict["point_mask"]
        nc = self.num_class if not self.model_cfg.get("CLASS_AGNOSTIC", False) else 1
        coder = build_point_box_coder(self.model_cfg)

        def branch(x, fcs, out_ch, tag):
            for i, ch in enumerate(fcs):
                x = nn.Dense(int(ch), use_bias=False, name=f"{tag}_fc{i}")(x)
                x = MaskedBatchNorm(name=f"{tag}_bn{i}")(x, mask, training=training)
                x = nn.relu(x)
            return nn.Dense(out_ch, name=f"{tag}_out")(x)

        cls_preds = branch(feats, self.model_cfg["CLS_FC"], nc, "cls")  # (B, N, nc)
        box_preds = branch(feats, self.model_cfg["REG_FC"], coder.code_size, "box")
        batch_dict["point_cls_preds"] = cls_preds
        batch_dict["point_box_preds_raw"] = box_preds
        batch_dict["point_cls_scores"] = jax.nn.sigmoid(cls_preds).max(axis=-1)

        # decoded per-point proposals (feed the RoI proposal layer)
        pred_cls = cls_preds.argmax(axis=-1) + 1
        boxes = coder.decode(box_preds, batch_dict["point_coords"], pred_cls)
        batch_dict["batch_box_preds"] = boxes  # (B, N, 7+)
        batch_dict["batch_cls_preds"] = cls_preds
        return batch_dict


def point_head_box_loss(batch_dict, gt_boxes, model_cfg, num_class):
    """Focal cls + smooth-L1 box regression on foreground points
    (reference point_head_template.get_cls_layer_loss / get_box_layer_loss)."""
    logits = batch_dict["point_cls_preds"]
    nc = logits.shape[-1]
    coder = build_point_box_coder(model_cfg)
    labels = assign_point_targets(
        batch_dict["point_coords"],
        batch_dict["point_mask"],
        gt_boxes,
        model_cfg["TARGET_CONFIG"].get("GT_EXTRA_WIDTH", (0.2, 0.2, 0.2)),
        nc,
    )  # (B, N) in {-1, 0, 1..nc}

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

    # box targets: encode the containing gt box against each fg point
    def one(kp, gt):
        valid_gt = gt[:, -1] > 0
        boxes = jnp.where(valid_gt[:, None], gt[:, :7], 0.0)
        bid = points_box_id(kp, boxes)
        safe = jnp.clip(bid, 0, None)
        g = gt[safe]
        return coder.encode(g[:, :7], kp, g[:, -1].astype(jnp.int32))

    box_targets = jax.vmap(one)(batch_dict["point_coords"], gt_boxes)
    box_preds = batch_dict["point_box_preds_raw"]
    fg = positives.astype(box_preds.dtype)
    reg = loss_utils.weighted_smooth_l1_loss(
        box_preds, box_targets, code_weights=lw.get("code_weights", None)
    )
    box_loss = (
        (reg * fg[..., None]).sum() / pos_norm * float(lw.get("point_box_weight", 1.0))
    )
    total = cls_loss + box_loss
    return total, {"point_loss_cls": cls_loss, "point_loss_box": box_loss}

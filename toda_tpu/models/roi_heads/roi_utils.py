"""Shared two-stage RoI machinery: proposal NMS layer, RoI target sampling,
RCNN losses, box decode.

Reference surface (re-derived, not ported):
  * RoIHeadTemplate.proposal_layer          pcdet/models/roi_heads/roi_head_template.py:46-103
  * RoIHeadTemplate.assign_targets          roi_head_template.py:106-138 (canonical transform)
  * ProposalTargetLayer                     roi_heads/target_assigner/proposal_target_layer.py:1-228
  * get_box_cls/reg_layer_loss              roi_head_template.py:139-225
  * generate_predicted_boxes (RoI decode)   roi_head_template.py:236-261

JAX redesign: everything is static-shape / per-frame pure functions vmapped over
the batch; torch's nonzero()-based subsampling becomes shuffled-rank selection
with modulo replacement (same fg/bg quota semantics, no dynamic shapes).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.nms import class_agnostic_nms
from ...ops.rotated_iou import boxes_iou3d
from ...utils import loss_utils
from ...utils.common_utils import rotate_points_along_z_jnp


def proposal_layer(batch_box_preds, batch_cls_preds, nms_cfg, normalized=False):
    """Decoded first-stage boxes -> NMS-selected proposals (static post_max).

    Args:
        batch_box_preds: (B, N, 7+)
        batch_cls_preds: (B, N, nc) logits (or probabilities if normalized)
        nms_cfg: dict with NMS_PRE_MAXSIZE / NMS_POST_MAXSIZE / NMS_THRESH
    Returns:
        rois (B, R, 7+), roi_scores (B, R), roi_labels (B, R), roi_mask (B, R)
    """
    pre_max = int(nms_cfg.get("NMS_PRE_MAXSIZE", 1024))
    post_max = int(nms_cfg.get("NMS_POST_MAXSIZE", 128))
    thresh = float(nms_cfg.get("NMS_THRESH", 0.7))
    probs = batch_cls_preds if normalized else jax.nn.sigmoid(batch_cls_preds)
    scores = probs.max(axis=-1)
    labels = probs.argmax(axis=-1) + 1

    def one(boxes, sc, lb):
        idx, mask = class_agnostic_nms(
            sc, boxes[:, :7], score_thresh=None, nms_thresh=thresh,
            pre_maxsize=min(pre_max, boxes.shape[0]), post_maxsize=post_max,
        )
        return boxes[idx], sc[idx] * mask, lb[idx] * mask, mask

    return jax.vmap(one)(batch_box_preds, scores, labels)


def _shuffled_candidates(rng, cand_mask):
    """Indices of True entries in random order (invalids pushed to the end),
    plus the candidate count. Static-shape analog of nonzero()+permutation."""
    n = cand_mask.shape[0]
    noise = jax.random.uniform(rng, (n,))
    key = jnp.where(cand_mask, noise, 2.0)
    order = jnp.argsort(key)
    return order.astype(jnp.int32), cand_mask.sum().astype(jnp.int32)


def sample_rois_for_rcnn(rng, rois, roi_scores, roi_labels, roi_mask, gt_boxes, cfg):
    """Per-frame RoI subsampling (ProposalTargetLayer.sample_rois_for_rcnn).

    Args:
        rois (N, 7+), roi_scores (N,), roi_labels (N,), roi_mask (N,)
        gt_boxes: (M, 8+) padded, class id LAST column
        cfg: TARGET_CONFIG dict
    Returns dict of (R, ...) sampled targets.
    """
    R = int(cfg["ROI_PER_IMAGE"])
    fg_quota = int(np.round(float(cfg["FG_RATIO"]) * R))
    fg_thresh = min(float(cfg["REG_FG_THRESH"]), float(cfg["CLS_FG_THRESH"]))
    bg_lo = float(cfg["CLS_BG_THRESH_LO"])
    hard_ratio = float(cfg["HARD_BG_RATIO"])

    gt_valid = gt_boxes[:, -1] > 0
    iou = boxes_iou3d(rois[:, :7], gt_boxes[:, :7])  # (N, M)
    if cfg.get("SAMPLE_ROI_BY_EACH_CLASS", False):
        same = roi_labels[:, None] == gt_boxes[None, :, -1].astype(roi_labels.dtype)
        iou = jnp.where(same, iou, 0.0)
    iou = jnp.where(gt_valid[None, :] & roi_mask[:, None], iou, 0.0)
    max_overlaps = iou.max(axis=1)
    gt_assignment = iou.argmax(axis=1)

    fg_mask = (max_overlaps >= fg_thresh) & roi_mask
    easy_bg = (max_overlaps < bg_lo) & roi_mask
    hard_bg = (max_overlaps >= bg_lo) & (max_overlaps < float(cfg["REG_FG_THRESH"])) & roi_mask

    r_fg, r_hard, r_easy, r_pick = jax.random.split(rng, 4)
    fg_order, n_fg = _shuffled_candidates(r_fg, fg_mask)
    hard_order, n_hard = _shuffled_candidates(r_hard, hard_bg)
    easy_order, n_easy = _shuffled_candidates(r_easy, easy_bg)
    n_bg = n_hard + n_easy

    # quota resolution (reference subsample_rois case analysis)
    fg_this = jnp.where(
        (n_fg > 0) & (n_bg > 0), jnp.minimum(fg_quota, n_fg),
        jnp.where(n_fg > 0, R, 0),
    )
    bg_this = R - fg_this
    hard_this = jnp.where(
        (n_hard > 0) & (n_easy > 0),
        jnp.minimum((bg_this * hard_ratio).astype(jnp.int32), n_hard),
        jnp.where(n_hard > 0, bg_this, 0),
    )

    slot = jnp.arange(R, dtype=jnp.int32)
    is_fg_slot = slot < fg_this
    bg_slot = slot - fg_this
    is_hard_slot = (~is_fg_slot) & (bg_slot < hard_this)

    # fg: shuffled without replacement up to n_fg, then wrap (reference repeats)
    pick = jax.random.randint(r_pick, (R,), 0, 1 << 30)
    fg_idx = fg_order[slot % jnp.maximum(n_fg, 1)]
    hard_idx = hard_order[pick % jnp.maximum(n_hard, 1)]
    easy_idx = easy_order[pick % jnp.maximum(n_easy, 1)]
    sampled = jnp.where(is_fg_slot, fg_idx, jnp.where(is_hard_slot, hard_idx, easy_idx))
    # degenerate frame (no valid rois at all): keep slot 0
    sampled = jnp.where((n_fg + n_bg) > 0, sampled, 0)

    s_rois = rois[sampled]
    s_ious = max_overlaps[sampled]
    s_gt = gt_boxes[gt_assignment[sampled]]

    reg_valid_mask = (s_ious > float(cfg["REG_FG_THRESH"])).astype(jnp.int32)
    if cfg.get("CLS_SCORE_TYPE", "roi_iou") == "roi_iou":
        iou_fg, iou_bg = float(cfg["CLS_FG_THRESH"]), float(cfg["CLS_BG_THRESH"])
        cls_labels = jnp.clip((s_ious - iou_bg) / (iou_fg - iou_bg), 0.0, 1.0)
    else:  # 'cls'
        cls_labels = jnp.where(
            s_ious > float(cfg["CLS_FG_THRESH"]), 1.0,
            jnp.where(s_ious > float(cfg["CLS_BG_THRESH"]), -1.0, 0.0),
        )

    return {
        "rois": s_rois,
        "gt_of_rois_src": s_gt,
        "gt_iou_of_rois": s_ious,
        "roi_scores": roi_scores[sampled],
        "roi_labels": roi_labels[sampled],
        "reg_valid_mask": reg_valid_mask,
        "rcnn_cls_labels": cls_labels,
    }


def canonical_gt_of_rois(rois, gt_of_rois_src):
    """RoI-frame gt boxes with heading folded into [-pi/2, pi/2]
    (reference assign_targets canonical transformation, roi_head_template.py:115-137)."""
    roi_center = rois[..., 0:3]
    roi_ry = rois[..., 6] % (2 * np.pi)
    ct = gt_of_rois_src[..., :7]
    xyz = ct[..., 0:3] - roi_center
    xyz = rotate_points_along_z_jnp(xyz[..., None, :], -roi_ry).squeeze(-2)
    heading = (ct[..., 6] - roi_ry) % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)
    return jnp.concatenate(
        [xyz, ct[..., 3:6], heading[..., None]], axis=-1
    )


def assign_targets(rng, batch_dict, target_cfg):
    """Batched ProposalTargetLayer + canonical transform. Returns targets dict
    with (B, R, ...) entries."""
    b = batch_dict["rois"].shape[0]
    rngs = jax.random.split(rng, b)
    targets = jax.vmap(
        lambda r, rois, sc, lb, m, gt: sample_rois_for_rcnn(r, rois, sc, lb, m, gt, target_cfg)
    )(
        rngs,
        batch_dict["rois"],
        batch_dict["roi_scores"],
        batch_dict["roi_labels"],
        batch_dict.get(
            "roi_mask", jnp.ones(batch_dict["rois"].shape[:2], dtype=bool)
        ),
        batch_dict["gt_boxes"],
    )
    targets["gt_of_rois"] = canonical_gt_of_rois(targets["rois"], targets["gt_of_rois_src"])
    return targets


def roi_losses(forward_ret, loss_cfg, box_coder):
    """rcnn cls (BCE on iou-soft labels) + reg smooth-L1 + corner regularization.

    Reference: roi_head_template.get_box_cls_layer_loss / get_box_reg_layer_loss.
    forward_ret needs: rcnn_cls (B, R, 1), rcnn_reg (B, R, C), rois, gt_of_rois,
    gt_of_rois_src, reg_valid_mask, rcnn_cls_labels.
    """
    lw = loss_cfg["LOSS_WEIGHTS"]
    code_size = box_coder.code_size
    rcnn_cls = forward_ret["rcnn_cls"].reshape(-1)
    cls_labels = forward_ret["rcnn_cls_labels"].reshape(-1)
    cls_valid = (cls_labels >= 0).astype(rcnn_cls.dtype)
    p = jax.nn.sigmoid(rcnn_cls)
    bce = -(
        jnp.clip(cls_labels, 0, 1) * jnp.log(jnp.clip(p, 1e-7, 1.0))
        + (1 - jnp.clip(cls_labels, 0, 1)) * jnp.log(jnp.clip(1 - p, 1e-7, 1.0))
    )
    rcnn_loss_cls = (bce * cls_valid).sum() / jnp.clip(cls_valid.sum(), 1.0, None)
    rcnn_loss_cls = rcnn_loss_cls * float(lw["rcnn_cls_weight"])

    rois = forward_ret["rois"].reshape(-1, forward_ret["rois"].shape[-1])[:, :code_size]
    gt_ct = forward_ret["gt_of_rois"].reshape(-1, code_size)
    rcnn_reg = forward_ret["rcnn_reg"].reshape(-1, code_size)
    fg_mask = forward_ret["reg_valid_mask"].reshape(-1) > 0
    fg_sum = jnp.clip(fg_mask.sum(), 1, None).astype(rcnn_reg.dtype)

    rois_anchor = rois.at[:, 0:3].set(0.0).at[:, 6].set(0.0)
    reg_targets = box_coder.encode(gt_ct, rois_anchor)
    l1 = loss_utils.weighted_smooth_l1_loss(
        rcnn_reg[None], reg_targets[None], code_weights=lw.get("code_weights", None)
    )[0]
    rcnn_loss_reg = (l1 * fg_mask[:, None]).sum() / fg_sum * float(lw["rcnn_reg_weight"])

    tb = {"rcnn_loss_cls": rcnn_loss_cls, "rcnn_loss_reg": rcnn_loss_reg}
    total = rcnn_loss_cls + rcnn_loss_reg

    if loss_cfg.get("CORNER_LOSS_REGULARIZATION", False):
        # decode fg predictions back to world frame, corner-L1 vs source gt
        local_anchor = rois_anchor
        boxes_local = box_coder.decode(rcnn_reg, local_anchor)
        roi_ry = rois[:, 6]
        xyz = rotate_points_along_z_jnp(boxes_local[:, None, 0:3], roi_ry).squeeze(-2)
        boxes_world = jnp.concatenate(
            [xyz + rois[:, 0:3], boxes_local[:, 3:6], (boxes_local[:, 6] + roi_ry)[:, None]],
            axis=-1,
        )
        gt_src = forward_ret["gt_of_rois_src"].reshape(-1, forward_ret["gt_of_rois_src"].shape[-1])
        corner = loss_utils.get_corner_loss_lidar(boxes_world[:, :7], gt_src[:, :7])
        loss_corner = (corner * fg_mask).sum() / fg_sum * float(lw["rcnn_corner_weight"])
        total = total + loss_corner
        tb["rcnn_loss_corner"] = loss_corner

    tb["rcnn_loss"] = total
    return total, tb


def generate_predicted_boxes_roi(rois, rcnn_cls, rcnn_reg, box_coder):
    """Decode RoI-relative regression to world boxes
    (reference roi_head_template.generate_predicted_boxes :236-261).

    Args: rois (B, R, 7+), rcnn_cls (B, R, nc), rcnn_reg (B, R, code_size)
    Returns: (batch_cls_preds (B, R, nc), batch_box_preds (B, R, 7))
    """
    code_size = box_coder.code_size
    rois7 = rois[..., :code_size]
    local_rois = rois7.at[..., 0:3].set(0.0)
    boxes_local = box_coder.decode(rcnn_reg, local_rois)
    roi_ry = rois7[..., 6]
    xyz = rotate_points_along_z_jnp(
        boxes_local[..., None, 0:3].reshape(-1, 1, 3), roi_ry.reshape(-1)
    ).reshape(rois7.shape[:-1] + (3,))
    boxes = jnp.concatenate(
        [xyz + rois7[..., 0:3], boxes_local[..., 3:6], boxes_local[..., 6:7]], axis=-1
    )
    return rcnn_cls, boxes

"""Detection losses in JAX.

Reference surface: pcdet/utils/loss_utils.py:9-385 (SigmoidFocalClassificationLoss,
WeightedSmoothL1Loss, WeightedL1Loss, WeightedCrossEntropyLoss, corner loss,
FocalLossCenterNet, RegLossCenterNet). Stateless functions here — JAX losses carry
their hyperparameters as closure args, not module state.
"""

import jax
import jax.numpy as jnp
import numpy as np


def sigmoid_focal_cls_loss(logits, targets, weights, gamma=2.0, alpha=0.25):
    """Per-element sigmoid focal loss.

    Args:
        logits: (..., C) raw predictions
        targets: (..., C) one-hot {0, 1}
        weights: (...,) or (..., C) per-anchor weights
    Returns: (..., C) weighted loss
    """
    pred_sigmoid = jax.nn.sigmoid(logits)
    alpha_weight = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - pred_sigmoid) + (1.0 - targets) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    bce = jnp.clip(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = focal_weight * bce
    if weights.ndim == loss.ndim - 1:
        weights = weights[..., None]
    return loss * weights


def smooth_l1_loss(diff, beta=1.0 / 9.0):
    if beta < 1e-5:
        return jnp.abs(diff)
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n**2 / beta, n - 0.5 * beta)


def weighted_smooth_l1_loss(preds, targets, weights=None, beta=1.0 / 9.0, code_weights=None):
    """(..., D) box-regression smooth-L1 with optional per-dim code weights."""
    targets = jnp.where(jnp.isnan(targets), preds, targets)
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    loss = smooth_l1_loss(diff, beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_l1_loss(preds, targets, weights=None, code_weights=None):
    targets = jnp.where(jnp.isnan(targets), preds, targets)
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    loss = jnp.abs(diff)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_cross_entropy_loss(logits, targets, weights):
    """(..., C) logits vs (..., C) one-hot; weights (...,). Used for direction cls."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -(targets * logp).sum(axis=-1)
    return loss * weights


def get_corner_loss_lidar(pred_boxes, gt_boxes, beta=1.0):
    """Corner-alignment loss between (N, 7) boxes, min over gt flip.

    Reference: loss_utils.get_corner_loss_lidar.
    """
    from .common_utils import rotate_points_along_z_jnp

    def corners(boxes):
        template = (
            jnp.array(
                [
                    [1, -1, -1], [1, 1, -1], [-1, 1, -1], [-1, -1, -1],
                    [1, -1, 1], [1, 1, 1], [-1, 1, 1], [-1, -1, 1],
                ],
                dtype=boxes.dtype,
            )
            / 2.0
        )
        c = boxes[:, None, 3:6] * template[None]
        c = rotate_points_along_z_jnp(c, boxes[:, 6])
        return c + boxes[:, None, 0:3]

    pred_c = corners(pred_boxes)
    gt_c = corners(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(np.pi)
    gt_c_flip = corners(gt_flip)
    d = jnp.minimum(
        jnp.linalg.norm(pred_c - gt_c, axis=-1),
        jnp.linalg.norm(pred_c - gt_c_flip, axis=-1),
    )
    return smooth_l1_loss(d, beta).mean(axis=1)


def focal_loss_centernet(pred, gt, mask=None):
    """Penalty-reduced pixelwise focal loss for CenterPoint heatmaps.

    Args:
        pred: (B, H, W, C) sigmoid probabilities (clipped outside)
        gt: (B, H, W, C) gaussian-splatted targets in [0, 1]
    Reference: loss_utils.FocalLossCenterNet / neg_loss_cornernet.
    """
    pos_inds = (gt == 1.0).astype(pred.dtype)
    neg_inds = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1 - gt, 4)
    pred = jnp.clip(pred, 1e-4, 1 - 1e-4)
    pos_loss = jnp.log(pred) * jnp.power(1 - pred, 2) * pos_inds
    neg_loss = jnp.log(1 - pred) * jnp.power(pred, 2) * neg_weights * neg_inds
    if mask is not None:
        pos_loss = pos_loss * mask
        neg_loss = neg_loss * mask
    num_pos = pos_inds.sum()
    pos_loss = pos_loss.sum()
    neg_loss = neg_loss.sum()
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def reg_loss_centernet(pred_feat, target, ind, mask):
    """L1 regression at sparse target locations.

    Args:
        pred_feat: (B, H*W, D) flattened prediction map
        target: (B, K, D) regression targets
        ind: (B, K) int flat spatial indices
        mask: (B, K) validity
    Reference: loss_utils.RegLossCenterNet (_transpose_and_gather_feat + _reg_loss).
    """
    gathered = jnp.take_along_axis(pred_feat, ind[..., None], axis=1)  # (B, K, D)
    target = jnp.where(jnp.isnan(target), gathered, target)
    loss = jnp.abs(gathered - target) * mask[..., None].astype(pred_feat.dtype)
    return loss.sum() / jnp.maximum(mask.sum(), 1.0)

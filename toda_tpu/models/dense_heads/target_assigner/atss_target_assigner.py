"""ATSS target assignment (Adaptive Training Sample Selection).

Reference: pcdet/models/dense_heads/target_assigner/atss_target_assigner.py:1-137
(per gt: top-k nearest anchors by center distance, positives = candidates with
IoU >= mean+std of the candidate IoUs AND center inside the gt's BEV box;
conflicts resolved by max IoU; each gt force-matches its best-IoU anchor).

Static-shape redesign: the per-gt python loops become masked (N, M) tensor ops
under vmap; padding gts (class 0) are masked out of every reduction.
"""

import jax
import jax.numpy as jnp

from ....ops.rotated_iou import boxes_iou_bev
from ....utils.common_utils import rotate_points_along_z_jnp


class ATSSTargetAssigner:
    def __init__(self, topk, box_coder, anchors, match_height=False):
        self.topk = int(topk)
        self.box_coder = box_coder
        self.anchors = jnp.asarray(anchors)  # (N, 7)
        self.match_height = match_height

    def assign(self, gt_boxes_batch):
        """gt_boxes_batch (B, M, 8) padded, class id in the LAST column.

        Returns box_cls_labels (B, N) [-1 ignore / 0 bg / >0 class],
        box_reg_targets (B, N, code), reg_weights (B, N)."""
        return jax.vmap(self._assign_one)(gt_boxes_batch)

    def _assign_one(self, gt_boxes):
        anchors = self.anchors
        n = anchors.shape[0]
        gt_cls = gt_boxes[:, -1].astype(jnp.int32)
        gt_valid = gt_cls > 0
        gt7 = gt_boxes[:, :7]
        m = gt7.shape[0]

        ious = boxes_iou_bev(anchors, gt7)  # (N, M); BEV like the ref default
        ious = jnp.where(gt_valid[None, :], ious, 0.0)

        # top-k CLOSEST anchors per gt (ref :92-94)
        dist = jnp.linalg.norm(
            anchors[:, None, :3] - gt7[None, :, :3], axis=-1
        )  # (N, M)
        negd, topk_idxs = jax.lax.top_k(-dist.T, self.topk)  # (M, K)
        cand_ious = jnp.take_along_axis(ious.T, topk_idxs, axis=1)  # (M, K)
        iou_mean = cand_ious.mean(axis=1)
        iou_std = cand_ious.std(axis=1)
        thr = iou_mean + iou_std + 1e-6
        is_pos = cand_ious >= thr[:, None]  # (M, K)

        # candidate anchor center must lie inside the gt's BEV box (ref :101-111)
        cand_centers = anchors[topk_idxs.reshape(-1), :3].reshape(m, self.topk, 3)
        local = cand_centers - gt7[:, None, :3]
        local = rotate_points_along_z_jnp(local, -gt7[:, 6])
        # the reference compares (x, y) against (dy, dx)/2 — "bugfixed: w ==> y,
        # l ==> x" (atss_target_assigner.py:110); keep its exact behavior
        half = gt7[:, None, 4:2:-1] / 2
        in_gt = (jnp.abs(local[..., :2]) <= half).all(axis=-1)
        is_pos = is_pos & in_gt & gt_valid[:, None]

        # scatter candidate positivity back to (N, M): ious_inf[a, g] = iou if
        # (a, g) is a positive candidate else -inf (ref :115-121)
        posmask_nm = (
            jnp.zeros((m, n), bool)
            .at[jnp.arange(m)[:, None], topk_idxs]
            .max(is_pos)
        ).T  # (N, M)
        ious_inf = jnp.where(posmask_nm, ious, -jnp.inf)

        # each gt force-matches its best-iou anchor (ref :125-128)
        gt_best = ious.max(axis=0)  # (M,)
        force = (ious == gt_best[None, :]) & (gt_best[None, :] > 1e-6) & gt_valid[None, :]
        ious_inf = jnp.where(force, ious, ious_inf)

        best_val = ious_inf.max(axis=1)  # (N,)
        best_gt = ious_inf.argmax(axis=1)
        matched = best_val > -jnp.inf

        labels = jnp.where(matched, gt_cls[best_gt], 0)
        matched_gt = gt7[best_gt]
        reg_targets = self.box_coder.encode(matched_gt, anchors)
        reg_targets = jnp.where(matched[:, None], reg_targets, 0.0)
        num_pos = jnp.maximum(matched.sum(), 1).astype(anchors.dtype)
        reg_weights = jnp.where(matched, 1.0 / num_pos, 0.0)
        return {
            "box_cls_labels": labels.astype(jnp.int32),
            "box_reg_targets": reg_targets,
            "reg_weights": reg_weights,
            "matched_gt_heading": jnp.where(matched, matched_gt[:, 6], 0.0),
        }

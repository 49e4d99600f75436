"""Anchor-to-GT target assignment, jit-compatible, batched via vmap.

Reference: pcdet/models/dense_heads/target_assigner/axis_aligned_target_assigner.py
(210 LoC). Semantics kept: per-class max-IoU matching on nearest-axis-aligned BEV
IoU, force-matching each gt to its best anchor, matched/unmatched thresholds,
1/num_pos regression weights. Redesign: instead of per-class python loops over
variable-size subsets, one dense (N_anchors, M_gt) IoU matrix with a class-equality
mask — identical results, fully static shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np


def nearest_bev_iou_jnp(boxes_a, boxes_b):
    """Axis-aligned nearest BEV IoU (jnp). (N, 7) x (M, 7) -> (N, M).

    Mirrors box_utils.boxes3d_nearest_bev_iou (host version in
    toda_tpu/utils/box_utils.py).
    """

    def to_bev(b):
        rot = b[:, 6] - jnp.floor(b[:, 6] / jnp.pi + 0.5) * jnp.pi
        swap = jnp.abs(rot) > jnp.pi / 4
        dx = jnp.where(swap, b[:, 4], b[:, 3])
        dy = jnp.where(swap, b[:, 3], b[:, 4])
        return jnp.stack(
            [b[:, 0] - dx / 2, b[:, 1] - dy / 2, b[:, 0] + dx / 2, b[:, 1] + dy / 2],
            axis=-1,
        )

    a = to_bev(boxes_a)[:, None, :]
    b = to_bev(boxes_b)[None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / jnp.clip(area_a + area_b - inter, 1e-6, None)


class AxisAlignedTargetAssigner:
    def __init__(self, anchors, anchor_classes, matched_thr, unmatched_thr, box_coder):
        # static numpy constants, closed over by the jitted step
        self.anchors = jnp.asarray(anchors)  # (N, 7)
        self.anchor_classes = jnp.asarray(anchor_classes)  # (N,)
        self.matched_thr = jnp.asarray(matched_thr)  # (N,)
        self.unmatched_thr = jnp.asarray(unmatched_thr)  # (N,)
        self.box_coder = box_coder

    def assign(self, gt_boxes_batch):
        """gt_boxes_batch: (B, M, 8) padded (class id in col 7, 0 = padding).

        Returns dict of per-anchor targets:
            box_cls_labels: (B, N) int32 — -1 ignore, 0 bg, >0 class id
            box_reg_targets: (B, N, code_size)
            reg_weights: (B, N)
        """
        return jax.vmap(self._assign_one)(gt_boxes_batch)

    def _assign_one(self, gt_boxes):
        anchors = self.anchors
        n = anchors.shape[0]
        gt_cls = gt_boxes[:, -1].astype(jnp.int32)  # (M,) class id is the LAST column
        gt_valid = gt_cls > 0

        iou = nearest_bev_iou_jnp(anchors, gt_boxes[:, :7])  # (N, M)
        same_class = self.anchor_classes[:, None] == gt_cls[None, :]
        iou = jnp.where(same_class & gt_valid[None, :], iou, -1.0)

        anchor_best = iou.max(axis=1)  # (N,)
        anchor_best_gt = iou.argmax(axis=1)  # (N,)
        gt_best = iou.max(axis=0)  # (M,)

        # force match: anchors achieving a gt's best iou (ties included, as in ref)
        force = ((iou == gt_best[None, :]) & (gt_best[None, :] > 1e-6) & gt_valid[None, :]).any(
            axis=1
        )
        pos = (anchor_best >= self.matched_thr) | force
        neg = (anchor_best < self.unmatched_thr) & ~pos

        assigned_gt = jnp.where(
            force,
            # for force-matched anchors prefer the gt they are best for
            jnp.argmax(
                jnp.where((iou == gt_best[None, :]) & gt_valid[None, :], iou, -2.0), axis=1
            ),
            anchor_best_gt,
        )
        # gather the matched gt rows via one-hot matmul: the (N,) dynamic
        # row-gathers from the tiny gt table lowered to ~3 ms/step XLA
        # gather fusions each at bench scale; an (N, M) one-hot against
        # (M, 8) is a trivial MXU dot. The class id rides along as the
        # trailing column (exact in f32 — small ints).
        m = gt_boxes.shape[0]
        oh = (assigned_gt[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]
              ).astype(gt_boxes.dtype)
        gathered = oh @ gt_boxes  # (N, 8)
        cls_of = jnp.round(gathered[:, -1]).astype(jnp.int32)
        labels = jnp.where(pos, cls_of, jnp.where(neg, 0, -1))

        # regression targets encode against the anchor's own argmax gt — the
        # reference uses anchor_to_gt_argmax for fg boxes even when the class
        # label came from a force match (axis_aligned_target_assigner.py:193),
        # so a force-matched anchor can be labelled by gt A but regressed to
        # gt B. Pinned by tests/test_reference_parity_model.py.
        oh_reg = (anchor_best_gt[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]
                  ).astype(gt_boxes.dtype)
        gathered_reg = oh_reg @ gt_boxes  # (N, 8)
        # keep every box column except the trailing class id — velocity
        # channels (nuScenes 9-col boxes) ride into the residual encoding
        matched_gt = gathered_reg[:, :-1]
        reg_targets = self.box_coder.encode(matched_gt, anchors)
        reg_targets = jnp.where(pos[:, None], reg_targets, 0.0)

        num_pos = jnp.maximum(pos.sum(), 1).astype(anchors.dtype)
        reg_weights = jnp.where(pos, 1.0 / num_pos, 0.0)

        return {
            "box_cls_labels": labels.astype(jnp.int32),
            "box_reg_targets": reg_targets,
            "reg_weights": reg_weights,
            "matched_gt_heading": jnp.where(pos, matched_gt[:, 6], 0.0),
        }

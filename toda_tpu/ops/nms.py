"""Rotated BEV NMS in pure JAX (static shapes, mask-in/mask-out).

Replaces the reference's 64-box-bitmask CUDA NMS (``nms_gpu`` in
pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu) and the python wrappers
``class_agnostic_nms`` / ``multi_classes_nms`` (pcdet/models/model_utils/
model_nms_utils.py:6-67).

Design: top-K by score (static K), one dense KxK rotated-IoU matrix (the O(K^2)
work maps onto the VPU as a few dense ops), then a sequential greedy sweep as a
`fori_loop` carrying a suppression mask — K iterations of K-wide vector ops.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .rotated_iou import boxes_iou_bev

NEG_INF = -1e9


@partial(jax.jit, static_argnames=("pre_maxsize", "post_maxsize"))
def nms_bev(boxes, scores, thresh, pre_maxsize=1024, post_maxsize=512, valid_mask=None):
    """Greedy rotated-BEV NMS.

    Args:
        boxes: (N, 7) [x, y, z, dx, dy, dz, heading]
        scores: (N,) confidence; padding rows should carry -inf (or pass valid_mask)
        thresh: IoU suppression threshold
        valid_mask: optional (N,) bool
    Returns:
        keep_idx: (post_maxsize,) int32 indices into the input rows
        keep_mask: (post_maxsize,) bool — which of those slots are real detections
    """
    n = boxes.shape[0]
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, NEG_INF)
    k = min(pre_maxsize, n)
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]

    iou = boxes_iou_bev(top_boxes, top_boxes)  # (k, k)
    alive_score = top_scores > NEG_INF / 2

    # Exact greedy NMS as an iterative fixed point instead of a k-step
    # sequential loop (k=1024 tiny loop steps dominated eval: 1.4 s/example
    # measured, r4). The greedy result is the unique solution of
    #   keep[i] = alive[i] & ~any_{j<i}( sup[j, i] & keep[j] )
    # over the strictly-upper-triangular suppression matrix sup (row j
    # suppresses column i when iou > thresh and j outranks i). Iterating
    # that equation from keep=alive converges: rank 0 is correct
    # immediately, and once all ranks < r are stable rank r is correct on
    # the next sweep — so at most longest-suppression-chain iterations
    # (typically < 10), each ONE (k, k) masked matvec on the VPU. The
    # while_loop stops at the fixed point, so the result is exactly the
    # sequential greedy output for every input.
    ranks = jnp.arange(k)
    sup = (iou > thresh) & (ranks[:, None] < ranks[None, :])  # strictly upper

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(state):
        keep, _, it = state
        new = alive_score & ~jnp.any(sup & keep[:, None], axis=0)
        return new, keep, it + 1

    keep0 = alive_score
    keep, _, _ = jax.lax.while_loop(
        cond, body, (alive_score & ~jnp.any(sup & keep0[:, None], axis=0), keep0, 0)
    )

    # Compact kept rows (already score-ordered) into post_maxsize slots.
    sel_scores = jnp.where(keep, top_scores, NEG_INF)
    kk = min(post_maxsize, k)
    _, sel = jax.lax.top_k(sel_scores, kk)
    keep_idx = order[sel]
    keep_mask = keep[sel]
    if kk < post_maxsize:
        keep_idx = jnp.pad(keep_idx, (0, post_maxsize - kk))
        keep_mask = jnp.pad(keep_mask, (0, post_maxsize - kk))
    return keep_idx.astype(jnp.int32), keep_mask


@partial(jax.jit, static_argnames=("pre_maxsize", "post_maxsize"))
def class_agnostic_nms(
    box_scores,
    box_preds,
    score_thresh=None,
    nms_thresh=0.2,
    pre_maxsize=1024,
    post_maxsize=512,
    valid_mask=None,
):
    """Score-threshold + NMS, mirroring model_nms_utils.class_agnostic_nms
    (reference pcdet/models/model_utils/model_nms_utils.py:6-26).

    Returns (selected_idx, selected_mask) of static size post_maxsize.
    """
    mask = jnp.ones_like(box_scores, dtype=bool) if valid_mask is None else valid_mask
    if score_thresh is not None:
        mask = jnp.logical_and(mask, box_scores >= score_thresh)
    return nms_bev(
        box_preds,
        box_scores,
        nms_thresh,
        pre_maxsize=pre_maxsize,
        post_maxsize=post_maxsize,
        valid_mask=mask,
    )


@partial(jax.jit, static_argnames=("num_class", "pre_maxsize", "post_maxsize"))
def multi_classes_nms(cls_scores, box_preds, num_class, score_thresh=None,
                      nms_thresh=0.2, pre_maxsize=512, post_maxsize=128):
    """Per-class NMS (reference model_nms_utils.multi_classes_nms:28-67).

    cls_scores: (N, num_class) sigmoid scores; box_preds (N, 7).
    Returns (boxes (num_class*post, 7), scores, labels, mask) — per-class results
    concatenated, statically sized.
    """
    all_idx, all_mask, all_scores, all_labels = [], [], [], []
    for c in range(num_class):
        s = cls_scores[:, c]
        m = jnp.ones_like(s, dtype=bool)
        if score_thresh is not None:
            m = s >= score_thresh
        idx, keep = nms_bev(
            box_preds, s, nms_thresh, pre_maxsize=pre_maxsize,
            post_maxsize=post_maxsize, valid_mask=m,
        )
        all_idx.append(idx)
        all_mask.append(keep)
        all_scores.append(s[idx] * keep)
        all_labels.append(jnp.full_like(idx, c + 1) * keep)
    idx = jnp.concatenate(all_idx)
    return (
        box_preds[idx],
        jnp.concatenate(all_scores),
        jnp.concatenate(all_labels).astype(jnp.int32),
        jnp.concatenate(all_mask),
    )


@partial(jax.jit, static_argnames=("post_maxsize",))
def circle_nms(centers, scores, radius, post_maxsize=83, valid_mask=None):
    """CenterPoint circle-NMS: suppress detections whose center distance < radius.

    Reference: pcdet/models/model_utils/centernet_utils.py (numba circle_nms).
    centers (N, 2), scores (N,). Returns (keep_idx, keep_mask) sized post_maxsize.
    """
    n = centers.shape[0]
    s = scores if valid_mask is None else jnp.where(valid_mask, scores, NEG_INF)
    order = jnp.argsort(-s)
    c = centers[order]
    so = s[order]
    d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    close = d2 < radius**2
    alive_score = so > NEG_INF / 2

    # same iterative fixed-point closure as nms_bev (see comment there): the
    # greedy keep-set is the unique fixed point of
    # keep[i] = alive[i] & ~any_{j<i}(close[j,i] & keep[j]); a handful of
    # (n, n) masked sweeps replace n sequential latency-bound steps.
    ranks = jnp.arange(n)
    sup = close & (ranks[:, None] < ranks[None, :])

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < n)

    def body(state):
        keep, _, it = state
        new = alive_score & ~jnp.any(sup & keep[:, None], axis=0)
        return new, keep, it + 1

    keep0 = alive_score
    keep, _, _ = jax.lax.while_loop(
        cond, body, (alive_score & ~jnp.any(sup & keep0[:, None], axis=0), keep0, 0)
    )
    sel_scores = jnp.where(keep, so, NEG_INF)
    kk = min(post_maxsize, n)
    _, sel = jax.lax.top_k(sel_scores, kk)
    keep_idx = order[sel]
    keep_mask = keep[sel]
    if kk < post_maxsize:
        keep_idx = jnp.pad(keep_idx, (0, post_maxsize - kk))
        keep_mask = jnp.pad(keep_mask, (0, post_maxsize - kk))
    return keep_idx.astype(jnp.int32), keep_mask

"""Rotated BEV IoU / overlap in pure JAX (TPU-friendly, fully vectorized).

Replaces the reference CUDA kernels ``boxes_iou_bev_gpu`` / ``boxes_overlap_bev_gpu``
(pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu). Instead of sequential
Sutherland–Hodgman clipping (branchy, serial — a poor fit for the VPU), we use the
vertex-enumeration form of convex polygon intersection:

  the intersection of two convex quads is a convex polygon whose vertices are a
  subset of {A's corners inside B} ∪ {B's corners inside A} ∪ {edge-edge
  intersection points}  — at most 4 + 4 + 16 = 24 candidates.

We gather all 24 candidates with validity masks, sort them by angle around the
valid-centroid, and take the shoelace area. All ops are dense, fixed-shape, and
batch over the full (N, M) pair grid at once.
"""

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _box_corners_bev(boxes):
    """(..., 7) -> (..., 4, 2) CCW corners."""
    template = jnp.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], dtype=boxes.dtype) / 2.0
    dxy = boxes[..., None, 3:5] * template  # (..., 4, 2)
    cosa = jnp.cos(boxes[..., 6])[..., None]
    sina = jnp.sin(boxes[..., 6])[..., None]
    x = dxy[..., 0] * cosa - dxy[..., 1] * sina + boxes[..., None, 0]
    y = dxy[..., 0] * sina + dxy[..., 1] * cosa + boxes[..., None, 1]
    return jnp.stack([x, y], axis=-1)


def _pairwise_intersection_area(corners_a, corners_b):
    """Area of intersection of convex quads. corners_*: (..., 4, 2) -> (...,)."""
    # center each pair at its mean corner: f32 cross products at raw scene
    # coordinates (|xy| ~ 50 m) carry ~1e-5 absolute rounding, which a fixed
    # 1e-8 epsilon misreads — identical far-from-origin boxes came back with
    # IoU 0 (caught by test_ops_geometry far-origin regression)
    mid = (corners_a.mean(axis=-2, keepdims=True) + corners_b.mean(axis=-2, keepdims=True)) / 2
    corners_a = corners_a - mid
    corners_b = corners_b - mid
    _EPS_IN = 1e-4  # boundary tolerance for the (now box-scale) coordinates

    # --- corners of A inside B (and vice versa) ----------------------------
    def points_in_quad(pts, quad):
        # pts (..., P, 2), quad (..., 4, 2) CCW -> (..., P) bool
        a = quad  # (..., 4, 2)
        b = jnp.roll(quad, -1, axis=-2)
        edge = b - a  # (..., 4, 2)
        rel = pts[..., :, None, :] - a[..., None, :, :]  # (..., P, 4, 2)
        cross = edge[..., None, :, 0] * rel[..., 1] - edge[..., None, :, 1] * rel[..., 0]
        return (cross >= -_EPS_IN).all(axis=-1)

    in_b = points_in_quad(corners_a, corners_b)  # (..., 4)
    in_a = points_in_quad(corners_b, corners_a)  # (..., 4)

    # --- all 16 edge-edge intersections ------------------------------------
    a0 = corners_a  # (..., 4, 2)
    a1 = jnp.roll(corners_a, -1, axis=-2)
    b0 = corners_b
    b1 = jnp.roll(corners_b, -1, axis=-2)
    # expand to (..., 4, 4, 2): A-edge index i, B-edge index j
    p = a0[..., :, None, :]
    r = (a1 - a0)[..., :, None, :]
    q = b0[..., None, :, :]
    s = (b1 - b0)[..., None, :, :]
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]  # (..., 4, 4)
    qp = q - p
    t = (qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom
    )
    u = (qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom
    )
    inter_valid = (
        (jnp.abs(denom) >= _EPS) & (t >= -_EPS) & (t <= 1 + _EPS) & (u >= -_EPS) & (u <= 1 + _EPS)
    )
    inter_pts = p + t[..., None] * r  # (..., 4, 4, 2)

    # --- gather 24 candidates ----------------------------------------------
    sh = corners_a.shape[:-2]
    cand = jnp.concatenate(
        [corners_a, corners_b, inter_pts.reshape(sh + (16, 2))], axis=-2
    )  # (..., 24, 2)
    valid = jnp.concatenate(
        [in_b, in_a, inter_valid.reshape(sh + (16,))], axis=-1
    )  # (..., 24)

    num_valid = valid.sum(axis=-1)
    any_valid = num_valid >= 3

    # centroid of valid candidates
    w = valid.astype(cand.dtype)[..., None]
    center = (cand * w).sum(axis=-2) / jnp.maximum(num_valid[..., None], 1).astype(cand.dtype)

    # sort by polar angle; invalid pushed to the end (angle = +large)
    rel = cand - center[..., None, :]
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(valid, ang, 1e4)
    order = jnp.argsort(ang, axis=-1)
    sorted_pts = jnp.take_along_axis(cand, order[..., None], axis=-2)
    sorted_valid = jnp.take_along_axis(valid, order, axis=-1)

    # shoelace over the valid prefix: close the polygon by wrapping each valid
    # vertex to the *next valid* (which, with the prefix layout, is just the next
    # slot, except the last valid wraps to slot 0).
    idx = jax.lax.broadcasted_iota(jnp.int32, sorted_valid.shape, len(sorted_valid.shape) - 1)
    nxt = jnp.where(idx + 1 >= num_valid[..., None], 0, idx + 1)
    nxt_pts = jnp.take_along_axis(sorted_pts, nxt[..., None], axis=-2)
    cross = (
        sorted_pts[..., 0] * nxt_pts[..., 1] - nxt_pts[..., 0] * sorted_pts[..., 1]
    )
    area = jnp.abs((cross * sorted_valid.astype(cross.dtype)).sum(axis=-1)) / 2.0
    return jnp.where(any_valid, area, 0.0)


@partial(jax.jit, static_argnames=())
def boxes_overlap_bev(boxes_a, boxes_b):
    """Pairwise rotated-BEV intersection area. (N, 7) x (M, 7) -> (N, M)."""
    ca = _box_corners_bev(boxes_a)[:, None]  # (N, 1, 4, 2)
    cb = _box_corners_bev(boxes_b)[None, :]  # (1, M, 4, 2)
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    ca = jnp.broadcast_to(ca, (n, m, 4, 2))
    cb = jnp.broadcast_to(cb, (n, m, 4, 2))
    return _pairwise_intersection_area(ca, cb)


@jax.jit
def boxes_iou_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV IoU. (N, 7) x (M, 7) -> (N, M).

    Mirrors iou3d_nms_utils.boxes_iou_bev (reference pcdet/utils/iou3d_nms_utils.py).
    """
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.clip(area_a + area_b - inter, _EPS, None)


@jax.jit
def boxes_iou3d(boxes_a, boxes_b):
    """Pairwise 3D IoU (BEV overlap x z-overlap). (N, 7) x (M, 7) -> (N, M)."""
    inter_bev = boxes_overlap_bev(boxes_a, boxes_b)
    za1 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za2 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    overlap_z = jnp.clip(
        jnp.minimum(za2[:, None], zb2[None, :]) - jnp.maximum(za1[:, None], zb1[None, :]),
        0,
        None,
    )
    inter = inter_bev * overlap_z
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.clip(vol_a + vol_b - inter, _EPS, None)

"""RoI-aware voxel pooling and per-RoI point pooling in pure JAX.

Replaces the reference CUDA extensions roiaware_pool3d_cuda (RoI-aware voxel
max/avg pool, points-in-boxes — pcdet/ops/roiaware_pool3d, used by PartA2 and
the SECOND-IoU point-count scoring) and roipoint_pool3d_cuda (per-RoI point
sampling — pcdet/ops/roipoint_pool3d, used by the PointRCNN head).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _to_box_frame(points, box):
    """points (P, 3), box (7,) -> local coords (P, 3) in the box frame."""
    rel = points[:, :3] - box[:3]
    c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
    x = rel[:, 0] * c - rel[:, 1] * s
    y = rel[:, 0] * s + rel[:, 1] * c
    return jnp.stack([x, y, rel[:, 2]], axis=1)


@partial(jax.jit, static_argnames=("out_size", "pool"))
def roiaware_pool3d(points, point_features, points_mask, rois, out_size=6, pool="max"):
    """RoI-aware voxel pooling.

    Args:
        points: (P, 3+), point_features: (P, C), points_mask: (P,)
        rois: (N, 7)
        out_size: G (output GxGxG grid per roi)
        pool: 'max' | 'avg'
    Returns: pooled (N, G, G, G, C), occupancy (N, G, G, G) int32
    """
    g = out_size
    p, c = point_features.shape

    def one(box):
        local = _to_box_frame(points, box)
        frac = local / jnp.maximum(box[3:6], 1e-4) + 0.5  # [0,1) inside
        cell = jnp.floor(frac * g).astype(jnp.int32)
        inside = (
            points_mask
            & (cell >= 0).all(axis=1)
            & (cell < g).all(axis=1)
        )
        flat = jnp.where(inside, (cell[:, 0] * g + cell[:, 1]) * g + cell[:, 2], g**3)
        if pool == "max":
            pooled = jnp.full((g**3 + 1, c), -jnp.inf).at[flat].max(point_features)
            pooled = jnp.where(jnp.isinf(pooled), 0.0, pooled)[: g**3]
        else:
            ssum = jnp.zeros((g**3 + 1, c)).at[flat].add(point_features)
            cnt = jnp.zeros((g**3 + 1,)).at[flat].add(1.0)
            pooled = (ssum / jnp.maximum(cnt[:, None], 1.0))[: g**3]
        occ = jnp.zeros((g**3 + 1,), jnp.int32).at[flat].add(1)[: g**3]
        return pooled.reshape(g, g, g, c), occ.reshape(g, g, g)

    return jax.vmap(one)(rois)


@partial(jax.jit, static_argnames=("num_sampled_points",))
def roipoint_pool3d(points, point_features, points_mask, rois, num_sampled_points=512):
    """Per-RoI point pooling: the first K points inside each (enlarged) roi.

    Returns: pooled (N, K, 3 + C) [xyz + features], empty_flag (N,) bool.
    Matches the CUDA kernel convention: slots beyond the in-box count repeat the
    first in-box point; rois with zero points are flagged empty.
    """
    k = num_sampled_points
    p = points.shape[0]

    def one(box):
        local = _to_box_frame(points, box)
        inside = (
            points_mask
            & (jnp.abs(local[:, 0]) <= box[3] / 2)
            & (jnp.abs(local[:, 1]) <= box[4] / 2)
            & (jnp.abs(local[:, 2]) <= box[5] / 2)
        )
        pos = jnp.arange(p, dtype=jnp.int32)
        key = jnp.where(inside, pos, p)
        order = jnp.argsort(key)[:k]
        valid = jnp.take(key, order) < p
        first = order[:1]
        idx = jnp.where(valid, order, first)
        feat = jnp.concatenate([points[:, :3], point_features], axis=1)[idx]
        empty = ~inside.any()
        return jnp.where(empty, 0.0, feat), empty

    return jax.vmap(one)(rois)

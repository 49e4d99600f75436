"""On-device, jittable point-cloud voxelization with static capacities.

Replaces the reference's CPU spconv ``VoxelGeneratorWrapper``
(pcdet/datasets/processor/data_processor.py:15-60) — there it runs in numpy inside
DataLoader workers; here it is a fused XLA program on device (sort + segmented
scatter), so the host never touches voxels at all.

Contract: points are padded to a static P with a validity mask; outputs are padded
to static MAX_VOXELS / MAX_POINTS_PER_VOXEL (the same caps the reference already
imposes via MAX_NUMBER_OF_VOXELS / MAX_POINTS_PER_VOXEL — its concession that the
workload is fundamentally capacity-bounded, which is exactly XLA's shape contract).

Algorithm: quantize -> linearize voxel key -> stable sort points by key ->
run-length segment (head flags + cummax slot index) -> scatter into (V, T, C).
"""

from functools import partial

import jax
import jax.numpy as jnp

INT_SENTINEL = jnp.iinfo(jnp.int32).max


@partial(jax.jit, static_argnames=("grid_size",))
def _quantize(points, points_mask, voxel_size, pc_range, grid_size):
    """Per-point integer voxel coords + linear key. grid_size: (gx, gy, gz)."""
    gx, gy, gz = grid_size
    vsize = jnp.asarray(voxel_size, dtype=points.dtype)
    origin = jnp.asarray(pc_range[:3], dtype=points.dtype)
    ijk = jnp.floor((points[:, :3] - origin) / vsize).astype(jnp.int32)  # (P, 3) xyz
    in_grid = (
        (ijk[:, 0] >= 0) & (ijk[:, 0] < gx)
        & (ijk[:, 1] >= 0) & (ijk[:, 1] < gy)
        & (ijk[:, 2] >= 0) & (ijk[:, 2] < gz)
    )
    valid = points_mask & in_grid
    key = (ijk[:, 2] * gy + ijk[:, 1]) * gx + ijk[:, 0]
    key = jnp.where(valid, key, INT_SENTINEL)
    return ijk, key, valid


@partial(jax.jit, static_argnames=("grid_size", "max_voxels", "max_points_per_voxel"))
def voxelize(points, points_mask, voxel_size, pc_range, grid_size, max_voxels, max_points_per_voxel):
    """Hard voxelization.

    Args:
        points: (P, C) float, first 3 channels are xyz
        points_mask: (P,) bool validity
        voxel_size: (3,) metric sizes (x, y, z)
        pc_range: (6,) [x0, y0, z0, x1, y1, z1]
        grid_size: static (gx, gy, gz)
        max_voxels: static V
        max_points_per_voxel: static T
    Returns dict:
        voxels: (V, T, C) — zero-padded
        voxel_coords: (V, 3) int32 (z, y, x), -1 padding   [reference coord order]
        voxel_num_points: (V,) int32
        voxel_mask: (V,) bool
        point_voxel_idx: (P,) int32 — voxel slot of each input point (-1 if dropped)
    """
    p, c = points.shape
    v, t = max_voxels, max_points_per_voxel
    ijk, key, valid = _quantize(points, points_mask, voxel_size, pc_range, grid_size)

    order = jnp.argsort(key, stable=True)
    skey = key[order]
    svalid = valid[order]
    spoints = points[order]
    sijk = ijk[order]

    prev = jnp.concatenate([jnp.array([-1], dtype=skey.dtype), skey[:-1]])
    head = (skey != prev) & svalid
    voxel_idx = jnp.cumsum(head.astype(jnp.int32)) - 1  # (P,) id per sorted point
    pos = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0]
    run_start = jax.lax.cummax(jnp.where(head, pos, 0))
    slot = pos - run_start

    ok = svalid & (voxel_idx < v) & (slot < t)
    flat = jnp.where(ok, voxel_idx * t + slot, v * t)  # out-of-range -> dropped

    voxels = (
        jnp.zeros((v * t, c), dtype=points.dtype)
        .at[flat]
        .set(spoints, mode="drop")
        .reshape(v, t, c)
    )
    coords_zyx = sijk[:, ::-1]  # xyz -> zyx
    coord_rows = jnp.where(head & (voxel_idx < v), voxel_idx, v)
    voxel_coords = (
        jnp.full((v, 3), -1, dtype=jnp.int32).at[coord_rows].set(coords_zyx, mode="drop")
    )
    voxel_num_points = (
        jnp.zeros((v,), dtype=jnp.int32)
        .at[jnp.where(ok, voxel_idx, v)]
        .add(1, mode="drop")
    )
    voxel_mask = voxel_num_points > 0

    # map voxel slot back to original point order
    pvi_sorted = jnp.where(ok, voxel_idx, -1)
    point_voxel_idx = jnp.zeros((p,), dtype=jnp.int32).at[order].set(pvi_sorted)
    return {
        "voxels": voxels,
        "voxel_coords": voxel_coords,
        "voxel_num_points": voxel_num_points,
        "voxel_mask": voxel_mask,
        "point_voxel_idx": point_voxel_idx,
    }


@partial(jax.jit, static_argnames=("grid_size", "max_voxels"))
def dynamic_voxelize(points, points_mask, voxel_size, pc_range, grid_size, max_voxels):
    """Dynamic voxelization: no (V, T, C) buffer — returns per-point voxel ids so a
    VFE can segment-reduce features directly (the TPU-native analog of the
    reference's DynamicMeanVFE / torch_scatter path, pcdet/models/backbones_3d/vfe/
    dynamic_mean_vfe.py).

    Returns dict with voxel_coords (V, 3) zyx, voxel_num_points, voxel_mask,
    point_voxel_idx (P,) (-1 for dropped points).
    """
    p, _ = points.shape
    v = max_voxels
    ijk, key, valid = _quantize(points, points_mask, voxel_size, pc_range, grid_size)

    order = jnp.argsort(key, stable=True)
    skey = key[order]
    svalid = valid[order]
    sijk = ijk[order]

    prev = jnp.concatenate([jnp.array([-1], dtype=skey.dtype), skey[:-1]])
    head = (skey != prev) & svalid
    voxel_idx = jnp.cumsum(head.astype(jnp.int32)) - 1

    ok = svalid & (voxel_idx < v)
    coord_rows = jnp.where(head & (voxel_idx < v), voxel_idx, v)
    voxel_coords = (
        jnp.full((v, 3), -1, dtype=jnp.int32).at[coord_rows].set(sijk[:, ::-1], mode="drop")
    )
    voxel_num_points = (
        jnp.zeros((v,), dtype=jnp.int32).at[jnp.where(ok, voxel_idx, v)].add(1, mode="drop")
    )
    point_voxel_idx = (
        jnp.zeros((p,), dtype=jnp.int32).at[order].set(jnp.where(ok, voxel_idx, -1))
    )
    return {
        "voxel_coords": voxel_coords,
        "voxel_num_points": voxel_num_points,
        "voxel_mask": voxel_num_points > 0,
        "point_voxel_idx": point_voxel_idx,
    }

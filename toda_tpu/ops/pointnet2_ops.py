"""PointNet++-family point ops in pure JAX (static shapes, mask-aware).

Replaces the reference CUDA extensions pointnet2_batch_cuda / pointnet2_stack_cuda
(pcdet/ops/pointnet2/*: ball_query, group_points, gather_points,
farthest_point_sampling, three_nn, three_interpolate — ~3k LoC CUDA). The
"stacked" variants exist upstream because torch batches ragged point sets by
concatenation; here everything is dense (B, N, ...) with validity masks, so one
set of batched ops covers both.

Consumers: PointNet2MSG/Backbone, PV-RCNN VoxelSetAbstraction, PointRCNN head.
"""

from functools import partial

import jax
import jax.numpy as jnp

BIG = 1e9


@partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sampling(points, mask, num_samples):
    """Iterative FPS. points (N, 3), mask (N,) -> (num_samples,) int32 indices.

    Invalid points are never selected (distance forced to -inf). If fewer valid
    points than num_samples exist, indices repeat (standard padding behavior).
    """
    n = points.shape[0]
    start = jnp.argmax(mask.astype(jnp.int32))  # first valid point

    def body(i, state):
        dists, selected = state
        last = points[selected[i - 1]]
        d = ((points - last) ** 2).sum(-1)
        dists = jnp.minimum(dists, d)
        dists = jnp.where(mask, dists, -BIG)
        nxt = jnp.argmax(dists)
        selected = selected.at[i].set(nxt)
        return dists, selected

    selected = jnp.zeros((num_samples,), jnp.int32).at[0].set(start.astype(jnp.int32))
    dists = jnp.full((n,), BIG)
    _, selected = jax.lax.fori_loop(1, num_samples, body, (dists, selected))
    return selected


@partial(jax.jit, static_argnames=("nsample",))
def ball_query(radius, nsample, xyz, xyz_mask, new_xyz, new_xyz_mask):
    """For each query, up to nsample neighbor indices within radius.

    xyz (N, 3) + mask, new_xyz (M, 3) + mask -> idx (M, nsample) int32, cnt (M,).
    Slots beyond cnt repeat the first neighbor (CUDA ball_query convention).
    """
    d2 = ((new_xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)  # (M, N)
    in_ball = (d2 < radius**2) & xyz_mask[None, :] & new_xyz_mask[:, None]
    # take the first nsample in-ball indices per query: rank in-ball points by
    # position, out-of-ball pushed to the end
    n = xyz.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)[None, :]
    key = jnp.where(in_ball, pos, n)
    order = jnp.argsort(key, axis=1)[:, :nsample]  # (M, nsample)
    picked_valid = jnp.take_along_axis(key, order, axis=1) < n
    cnt = picked_valid.sum(axis=1).astype(jnp.int32)
    first = order[:, :1]
    idx = jnp.where(picked_valid, order, first)
    return idx.astype(jnp.int32), cnt


@jax.jit
def gather_points(points, idx):
    """points (N, C), idx (...,) -> (..., C)."""
    return points[idx]


@jax.jit
def group_points(points, idx):
    """points (N, C), idx (M, K) -> (M, K, C) (CUDA group_points analog)."""
    return points[idx]


@jax.jit
def three_nn(unknown, known, known_mask):
    """3 nearest known points for each unknown. (N, 3) x (M, 3) ->
    (dists (N, 3), idx (N, 3))."""
    d2 = ((unknown[:, None, :] - known[None, :, :]) ** 2).sum(-1)
    d2 = jnp.where(known_mask[None, :], d2, BIG)
    neg_top, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.clip(-neg_top, 0, None)), idx.astype(jnp.int32)


@jax.jit
def three_interpolate(features, idx, weight):
    """features (M, C), idx (N, 3), weight (N, 3) -> (N, C) weighted sum."""
    gathered = features[idx]  # (N, 3, C)
    return (gathered * weight[..., None]).sum(axis=1)


def interpolation_weights(dists, eps=1e-8):
    """Inverse-distance weights from three_nn dists (N, 3) -> (N, 3)."""
    recip = 1.0 / jnp.clip(dists, eps, None) ** 2
    return recip / recip.sum(axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("nsample",))
def query_and_group(radius, nsample, xyz, xyz_mask, new_xyz, new_xyz_mask, features=None):
    """Ball query + relative-coordinate grouping (QueryAndGroup module).

    Returns grouped (M, nsample, 3 + C) with xyz made query-relative, and the
    per-slot validity mask (M, nsample).
    """
    idx, cnt = ball_query(radius, nsample, xyz, xyz_mask, new_xyz, new_xyz_mask)
    grouped_xyz = xyz[idx] - new_xyz[:, None, :]
    slot_valid = (jnp.arange(nsample)[None, :] < cnt[:, None]) & new_xyz_mask[:, None]
    if features is not None:
        grouped = jnp.concatenate([grouped_xyz, features[idx]], axis=-1)
    else:
        grouped = grouped_xyz
    return jnp.where(slot_valid[..., None], grouped, 0.0), slot_valid


@partial(jax.jit, static_argnames=("nsample", "chunk"))
def query_and_group_chunked(
    radius, nsample, xyz, xyz_mask, new_xyz, new_xyz_mask, features=None, chunk=512
):
    """query_and_group with the (M, N) distance matrix bounded to (chunk, N).

    The CUDA ball_query is O(M*N) compute but O(1) memory per thread; the naive
    JAX version materializes (M, N), which at VSA scale (M=4k keypoints,
    N=131k points) is GBs. Chunking the queries through lax.map bounds peak
    memory while keeping each chunk a large vectorized op.
    """
    m = new_xyz.shape[0]
    pad = (-m) % chunk
    q = jnp.pad(new_xyz, ((0, pad), (0, 0)))
    qm = jnp.pad(new_xyz_mask, (0, pad))
    qs = q.reshape(-1, chunk, 3)
    qms = qm.reshape(-1, chunk)

    def one(args):
        cq, cqm = args
        return query_and_group(radius, nsample, xyz, xyz_mask, cq, cqm, features)

    grouped, slot_valid = jax.lax.map(one, (qs, qms))
    c = grouped.shape[-1]
    grouped = grouped.reshape(-1, nsample, c)[:m]
    slot_valid = slot_valid.reshape(-1, nsample)[:m]
    return grouped, slot_valid

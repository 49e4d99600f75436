"""Points-in-rotated-boxes membership in pure JAX.

Replaces the reference roiaware_pool3d CUDA kernels ``points_in_boxes_gpu`` /
``points_in_boxes_cpu`` (pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu).
"""

import jax
import jax.numpy as jnp


@jax.jit
def points_in_boxes(points, boxes):
    """(P, 3+) x (M, 7+) -> (M, P) bool membership matrix.

    A point belongs to a box if, in the box frame, |x|<=dx/2, |y|<=dy/2, |z|<=dz/2.
    Padding boxes (all-zero rows) match nothing (zero-size extent).
    """
    pts = points[None, :, :3] - boxes[:, None, 0:3]  # (M, P, 3)
    cosa = jnp.cos(-boxes[:, 6])[:, None]
    sina = jnp.sin(-boxes[:, 6])[:, None]
    local_x = pts[..., 0] * cosa - pts[..., 1] * sina
    local_y = pts[..., 0] * sina + pts[..., 1] * cosa
    nonzero = (boxes[:, 3] * boxes[:, 4] * boxes[:, 5] > 0)[:, None]
    return (
        (jnp.abs(local_x) <= boxes[:, None, 3] / 2)
        & (jnp.abs(local_y) <= boxes[:, None, 4] / 2)
        & (jnp.abs(pts[..., 2]) <= boxes[:, None, 5] / 2)
        & nonzero
    )


@jax.jit
def points_box_id(points, boxes):
    """(P, 3+) x (M, 7+) -> (P,) int32 index of first containing box, -1 if none.

    Mirrors the semantics of points_in_boxes_gpu's per-point box id output.
    """
    member = points_in_boxes(points, boxes)  # (M, P)
    any_box = member.any(axis=0)
    first = jnp.argmax(member, axis=0).astype(jnp.int32)
    return jnp.where(any_box, first, -1)

"""Two-view consistency loss for stage-2 adversarial MixUp training (jit-native).

Reference: pcdet/models/__init__.py model_fn_decorator_cl (:88-125 plus helpers
:194-260): forward both views, filter boxes by score, reverse the recorded world
augmentations so both views live in the canonical frame, match predictions by
nearest center, and penalize center/size disagreement (weight 0.1).

Here the recorded augmentations travel as fixed (B, 7) vectors
[flip_x, flip_y, rot, scale, tx, ty, tz] (DatasetTemplate.aug_vector), so the
reverse transform is a few vectorized ops under jit instead of host python.
"""

import jax
import jax.numpy as jnp


def reverse_boxes_jnp(boxes, aug_vec):
    """Undo world augs on predicted boxes. boxes (B, K, 7+), aug_vec (B, 7).

    Forward order is flip -> rotate -> scale -> translate (DataAugmentor queue);
    we invert in reverse.
    """
    flip_x = aug_vec[:, 0][:, None]
    flip_y = aug_vec[:, 1][:, None]
    rot = aug_vec[:, 2][:, None]
    scale = jnp.clip(aug_vec[:, 3], 1e-3, None)[:, None]
    t = aug_vec[:, 4:7][:, None, :]

    xyz = boxes[..., 0:3] - t
    dims = boxes[..., 3:6]
    heading = boxes[..., 6]

    xyz = xyz / scale[..., None]
    dims = dims / scale[..., None]

    cos, sin = jnp.cos(-rot), jnp.sin(-rot)
    x = xyz[..., 0] * cos - xyz[..., 1] * sin
    y = xyz[..., 0] * sin + xyz[..., 1] * cos
    heading = heading - rot

    y = jnp.where(flip_x > 0.5, -y, y)
    heading = jnp.where(flip_x > 0.5, -heading, heading)
    x = jnp.where(flip_y > 0.5, -x, x)
    heading = jnp.where(flip_y > 0.5, -(heading + jnp.pi), heading)

    return jnp.concatenate(
        [x[..., None], y[..., None], xyz[..., 2:3], dims, heading[..., None]], axis=-1
    )


def consistency_loss(boxes_a, scores_a, boxes_b, scores_b, score_thresh=0.3,
                     match_radius=2.0):
    """Center + size consistency between two box sets in a common frame.

    boxes_*: (B, K, 7), scores_*: (B, K). For each confident box in A, match the
    nearest confident B center; matched pairs within match_radius contribute
    smooth-L1 center distance and L1 size difference.
    Returns (center_loss, size_loss) scalars.
    """
    va = scores_a > score_thresh  # (B, K)
    vb = scores_b > score_thresh
    ca, cb = boxes_a[..., :3], boxes_b[..., :3]
    d2 = ((ca[:, :, None, :] - cb[:, None, :, :]) ** 2).sum(-1)  # (B, K, K)
    d2 = jnp.where(vb[:, None, :], d2, 1e9)
    j = jnp.argmin(d2, axis=-1)  # (B, K)
    min_d2 = jnp.take_along_axis(d2, j[..., None], axis=-1)[..., 0]
    matched = va & (min_d2 < match_radius**2)

    nb = jnp.take_along_axis(boxes_b, j[..., None], axis=1)  # (B, K, 7)
    diff_c = ca - nb[..., :3]
    abs_c = jnp.abs(diff_c)
    center = jnp.where(abs_c < 1.0, 0.5 * abs_c**2, abs_c - 0.5).sum(-1)
    size = jnp.abs(boxes_a[..., 3:6] - nb[..., 3:6]).sum(-1)

    w = matched.astype(boxes_a.dtype)
    denom = jnp.maximum(w.sum(), 1.0)
    return (center * w).sum() / denom, (size * w).sum() / denom

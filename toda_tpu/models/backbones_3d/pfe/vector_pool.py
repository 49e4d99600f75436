"""VectorPool aggregation — PV-RCNN++'s local-grid feature aggregation.

Reference: pcdet/ops/pointnet2/pointnet2_stack/pointnet2_modules.py:160-545
(VectorPoolLocalInterpolateModule + VectorPoolAggregationModule(MSG)) backed by
the vector_pool CUDA kernels (vector_pool_gpu.cu, ~485 LoC). Semantics: each
query spans a small dense local voxel grid (NUM_LOCAL_VOXEL per axis over
±MAX_NEIGHBOR_DISTANCE); support features are interpolated onto the cell
centers (3-NN inverse-distance, 'local_interpolation' mode); the flattened
(cells x channels [+ relative cell position]) vector feeds a position-specific
linear + POST_MLPS; MSG groups concatenate into MSG_POST_MLPS.

JAX redesign: dense (B, N, ...) with masks; the CUDA voxel-hash neighbor walk
becomes a chunked masked 3-NN (same interpolation weights). The reference's
FILTER_NEIGHBOR_WITH_ROI pre-filter is a kernel-side perf trick with no effect
on which neighbors interpolate (distances gate them) and is omitted.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ....ops.pointnet2_ops import three_nn, interpolation_weights
from ...model_utils.masked_norm import MaskedBatchNorm


def _cell_centers(num_voxel, max_dist, dtype=jnp.float32):
    """(V^3, 3) local cell centers covering [-d, d]^3."""
    vx, vy, vz = (int(v) for v in num_voxel)
    ax = (jnp.arange(vx, dtype=dtype) + 0.5) / vx * 2 * max_dist - max_dist
    ay = (jnp.arange(vy, dtype=dtype) + 0.5) / vy * 2 * max_dist - max_dist
    az = (jnp.arange(vz, dtype=dtype) + 0.5) / vz * 2 * max_dist - max_dist
    gx, gy, gz = jnp.meshgrid(ax, ay, az, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def _interpolate_at(points, mask, feats, targets, max_dist, chunk=2048):
    """3-NN inverse-distance interpolation of feats onto targets, neighbors
    beyond max_dist excluded. points (N, 3), targets (T, 3) -> (T, C)."""
    t = targets.shape[0]
    pad = (-t) % chunk
    q = jnp.pad(targets, ((0, pad), (0, 0)))

    def one(chunk_q):
        d, idx = three_nn(chunk_q, points, mask)
        w = interpolation_weights(d)
        w = jnp.where(d <= max_dist, w, 0.0)
        return (feats[idx] * w[..., None]).sum(axis=1)

    out = jax.lax.map(one, q.reshape(-1, chunk, 3))
    return out.reshape(-1, out.shape[-1])[:t]


class VectorPoolAggregationMSG(nn.Module):
    """Multi-group vector pool (VectorPoolAggregationModuleMSG)."""

    model_cfg: dict

    @nn.compact
    def __call__(self, xyz, xyz_mask, feats, new_xyz, new_mask, training=False):
        cfg = self.model_cfg
        num_groups = int(cfg["NUM_GROUPS"])
        c_red = int(cfg["NUM_REDUCED_CHANNELS"])
        if feats is None:
            feats = xyz * 0.0  # degenerate: positions only
        if feats.shape[-1] != c_red:
            feats = nn.Dense(c_red, use_bias=False, name="reduce_fc")(feats)

        outs = []
        for g in range(num_groups):
            gcfg = cfg[f"GROUP_CFG_{g}"]
            nvox = gcfg["NUM_LOCAL_VOXEL"]
            d = float(gcfg["MAX_NEIGHBOR_DISTANCE"])
            cells = _cell_centers(nvox, d, dtype=new_xyz.dtype)  # (V3, 3)
            v3 = cells.shape[0]
            b, m = new_xyz.shape[:2]
            targets = (new_xyz[:, :, None, :] + cells[None, None]).reshape(b, m * v3, 3)

            interp = jax.vmap(
                lambda p, pm, f, t: _interpolate_at(p, pm, f, t, max_dist=2 * d)
            )(xyz, xyz_mask, feats, targets)  # (B, M*V3, C_red)
            interp = interp.reshape(b, m, v3, c_red)
            rel = jnp.broadcast_to(cells[None, None], (b, m, v3, 3))
            h = jnp.concatenate([rel, interp], axis=-1).reshape(b, m, v3 * (c_red + 3))
            # position-specific linear over the flattened local grid
            h = nn.Dense(v3 * c_red, use_bias=False, name=f"g{g}_pos_fc")(h)
            h = MaskedBatchNorm(name=f"g{g}_pos_bn")(h, new_mask, training=training)
            h = nn.relu(h)
            for li, ch in enumerate(gcfg["POST_MLPS"]):
                h = nn.Dense(int(ch), use_bias=False, name=f"g{g}_post{li}")(h)
                h = MaskedBatchNorm(name=f"g{g}_post{li}_bn")(h, new_mask, training=training)
                h = nn.relu(h)
            outs.append(h)

        h = jnp.concatenate(outs, axis=-1)
        for li, ch in enumerate(cfg.get("MSG_POST_MLPS", [])):
            h = nn.Dense(int(ch), use_bias=False, name=f"msg_post{li}")(h)
            h = MaskedBatchNorm(name=f"msg_post{li}_bn")(h, new_mask, training=training)
            h = nn.relu(h)
        return jnp.where(new_mask[..., None], h, 0.0)

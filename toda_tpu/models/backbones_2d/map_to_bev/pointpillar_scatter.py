"""Scatter pillar features into a dense BEV grid (NHWC).

Reference: pcdet/models/backbones_2d/map_to_bev/pointpillar_scatter.py:5-38. The
reference loops per batch element with index_put; here a single batched scatter
over a static (ny*nx) canvas per frame. Invalid pillars (coords == -1) are dropped
via out-of-range indices + scatter mode='drop'.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class PointPillarScatter(nn.Module):
    model_cfg: dict
    grid_size: tuple  # (nx, ny, nz)

    @nn.compact
    def __call__(self, batch_dict, training=False):
        features = batch_dict["pillar_features"]  # (B, V, C)
        coords = batch_dict["voxel_coords"]  # (B, V, 3) zyx
        nx, ny, nz = self.grid_size
        assert nz == 1, "PointPillarScatter requires a single z layer"
        b, v, c = features.shape
        flat = coords[..., 1] * nx + coords[..., 2]  # (B, V)
        invalid = (coords[..., 0] < 0)
        flat = jnp.where(invalid, ny * nx, flat)

        def scatter_one(feat, idx):
            canvas = jnp.zeros((ny * nx, c), dtype=feat.dtype)
            return canvas.at[idx].set(feat, mode="drop")

        canvas = jax.vmap(scatter_one)(features, flat)  # (B, ny*nx, C)
        batch_dict["spatial_features"] = canvas.reshape(b, ny, nx, c)
        return batch_dict

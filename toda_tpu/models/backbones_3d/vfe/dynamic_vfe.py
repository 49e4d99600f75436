"""Dynamic (bufferless) voxel feature encoders.

Reference: pcdet/models/backbones_3d/vfe/dynamic_mean_vfe.py (torch_scatter) and
dynamic_pillar_vfe.py. Instead of the (B, V, T, C) hard-voxel buffer, per-point
voxel ids from ops.dynamic_voxelize drive segment means/maxes directly — no
points-per-voxel cap, lower memory.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....ops import dynamic_voxelize


class DynamicMeanVFE(nn.Module):
    model_cfg: dict
    num_point_features: int
    voxel_size: tuple
    point_cloud_range: tuple
    grid_size: tuple  # (nx, ny, nz)
    max_voxels: int

    def get_output_feature_dim(self):
        return self.num_point_features

    @nn.compact
    def __call__(self, batch_dict, training=False):
        points = batch_dict["points"]  # (B, P, C)
        mask = batch_dict["points_mask"]
        v = self.max_voxels

        def one(pts, m):
            out = dynamic_voxelize(
                pts, m, self.voxel_size, self.point_cloud_range,
                grid_size=tuple(int(g) for g in self.grid_size), max_voxels=v,
            )
            pvi = out["point_voxel_idx"]
            rows = jnp.where(pvi >= 0, pvi, v)
            ssum = jnp.zeros((v + 1, pts.shape[-1])).at[rows].add(
                jnp.where((pvi >= 0)[:, None], pts, 0.0)
            )[:v]
            cnt = jnp.maximum(out["voxel_num_points"], 1)[:, None].astype(pts.dtype)
            return ssum / cnt, out["voxel_coords"], out["voxel_num_points"], out["voxel_mask"]

        feats, coords, nums, vmask = jax.vmap(one)(points, mask)
        batch_dict.update(
            voxel_features=feats, voxel_coords=coords,
            voxel_num_points=nums, voxel_mask=vmask,
        )
        return batch_dict

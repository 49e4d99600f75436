"""Mean voxel feature encoder.

Reference: pcdet/models/backbones_3d/vfe/mean_vfe.py (31 LoC). Batched over dense
(B, V, T, C) voxel tensors with masks.
"""

import flax.linen as nn
import jax.numpy as jnp


class MeanVFE(nn.Module):
    model_cfg: dict
    num_point_features: int

    def get_output_feature_dim(self):
        return self.num_point_features

    @nn.compact
    def __call__(self, batch_dict, training=False):
        voxels = batch_dict["voxels"]  # (B, V, T, C)
        num_points = batch_dict["voxel_num_points"]  # (B, V)
        points_mean = voxels.sum(axis=2)
        normalizer = jnp.clip(num_points[..., None], 1.0, None).astype(voxels.dtype)
        batch_dict["voxel_features"] = points_mean / normalizer  # (B, V, C)
        return batch_dict

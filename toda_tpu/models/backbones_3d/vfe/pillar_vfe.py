"""Pillar feature network (PointPillars VFE).

Reference: pcdet/models/backbones_3d/vfe/pillar_vfe.py (123 LoC): per-pillar point
features augmented with cluster-mean offsets and pillar-center offsets, then
Linear+BN+ReLU and masked max-pool over the points in each pillar.

TPU notes: the (B, V, T, C) tensor feeds a single big matmul (MXU) after reshaping
to (B*V*T, C); BatchNorm runs over the flattened valid points.
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class PFNLayer(nn.Module):
    out_channels: int
    use_norm: bool = True
    last_layer: bool = False

    @nn.compact
    def __call__(self, inputs, mask, training=False):
        # inputs: (B, V, T, C), mask: (B, V, T)
        out_c = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(out_c, use_bias=not self.use_norm, name="linear")(inputs)
        if self.use_norm:
            x = nn.BatchNorm(
                use_running_average=not training, momentum=0.99, epsilon=1e-3, name="norm"
            )(x)
        x = nn.relu(x)
        x = jnp.where(mask[..., None], x, -1e9)
        x_max = x.max(axis=2, keepdims=True)  # (B, V, 1, C')
        x_max = jnp.where(x_max <= -1e8, 0.0, x_max)
        if self.last_layer:
            return x_max.squeeze(2)
        x_repeat = jnp.broadcast_to(x_max, x.shape)
        return jnp.concatenate([jnp.where(mask[..., None], x, 0.0), x_repeat], axis=-1)


class PillarVFE(nn.Module):
    model_cfg: dict
    num_point_features: int
    voxel_size: tuple
    point_cloud_range: tuple

    def get_output_feature_dim(self):
        return list(self.model_cfg["NUM_FILTERS"])[-1]

    @nn.compact
    def __call__(self, batch_dict, training=False):
        voxels = batch_dict["voxels"]  # (B, V, T, C)
        num_points = batch_dict["voxel_num_points"]  # (B, V)
        coords = batch_dict["voxel_coords"]  # (B, V, 3) zyx
        b, v, t, c = voxels.shape

        use_abs_xyz = self.model_cfg.get("USE_ABSLOTE_XYZ", True)  # [sic] reference key
        with_dist = self.model_cfg.get("WITH_DISTANCE", False)

        idx = jnp.arange(t)[None, None, :]
        mask = idx < num_points[..., None]  # (B, V, T)

        points_mean = voxels[..., :3].sum(axis=2, keepdims=True) / jnp.clip(
            num_points[..., None, None], 1.0, None
        ).astype(voxels.dtype)
        f_cluster = voxels[..., :3] - points_mean

        vx, vy, vz = self.voxel_size
        x0, y0, z0 = self.point_cloud_range[0:3]
        # coords are (z, y, x)
        cx = (coords[..., 2:3].astype(voxels.dtype) + 0.5) * vx + x0
        cy = (coords[..., 1:2].astype(voxels.dtype) + 0.5) * vy + y0
        cz = (coords[..., 0:1].astype(voxels.dtype) + 0.5) * vz + z0
        center = jnp.concatenate([cx, cy, cz], axis=-1)[:, :, None, :]  # (B, V, 1, 3)
        f_center = voxels[..., :3] - center

        feats = [voxels if use_abs_xyz else voxels[..., 3:], f_cluster, f_center]
        if with_dist:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        features = jnp.concatenate(feats, axis=-1)
        features = jnp.where(mask[..., None], features, 0.0)

        num_filters = [features.shape[-1]] + list(self.model_cfg["NUM_FILTERS"])
        for i in range(len(num_filters) - 1):
            features = PFNLayer(
                out_channels=num_filters[i + 1],
                use_norm=self.model_cfg.get("USE_NORM", True),
                last_layer=(i == len(num_filters) - 2),
                name=f"pfn_{i}",
            )(features, mask, training=training)

        batch_dict["pillar_features"] = features  # (B, V, C_out)
        return batch_dict

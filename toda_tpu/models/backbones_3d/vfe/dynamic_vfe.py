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


class PFNLayerV2(nn.Module):
    """Reference: pcdet/models/backbones_3d/vfe/dynamic_pillar_vfe.py:14-46
    (Linear + BN + ReLU, then torch_scatter.scatter_max over pillar ids;
    non-last layers concat the per-point features with their pillar max)."""

    out_channels: int
    use_norm: bool = True
    last_layer: bool = False

    @nn.compact
    def __call__(self, x, pvi, valid, max_voxels, training=False):
        # x (Np, C); pvi (Np,) pillar id (-1 invalid); valid (Np,)
        out_c = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(out_c, use_bias=not self.use_norm, name="linear")(x)
        if self.use_norm:
            x = nn.BatchNorm(
                use_running_average=not training, momentum=0.99, epsilon=1e-3,
                name="norm",
            )(x)
        x = nn.relu(x)
        x = jnp.where(valid[:, None], x, 0.0)
        rows = jnp.where(pvi >= 0, pvi, max_voxels)
        x_max = (
            jnp.full((max_voxels + 1, out_c), -1e9, x.dtype)
            .at[rows]
            .max(jnp.where(valid[:, None], x, -1e9))
        )
        x_max = jnp.where(x_max <= -1e8, 0.0, x_max)
        if self.last_layer:
            return None, x_max[:max_voxels]
        per_point_max = x_max[rows]
        return jnp.concatenate([x, per_point_max], axis=-1), x_max[:max_voxels]


class DynamicPillarVFE(nn.Module):
    """Bufferless PointPillars VFE: per-point pillar ids drive segment maxes
    (no points-per-pillar cap). Reference:
    pcdet/models/backbones_3d/vfe/dynamic_pillar_vfe.py:49-133."""

    model_cfg: dict
    num_point_features: int
    voxel_size: tuple
    point_cloud_range: tuple
    grid_size: tuple  # (nx, ny, nz); pillars use nz=1 semantics
    max_voxels: int

    def get_output_feature_dim(self):
        return list(self.model_cfg["NUM_FILTERS"])[-1]

    @nn.compact
    def __call__(self, batch_dict, training=False):
        points = batch_dict["points"]  # (B, P, C)
        mask = batch_dict["points_mask"]
        v = self.max_voxels
        gx, gy, _ = (int(g) for g in self.grid_size)
        vx, vy, vz = (float(s) for s in self.voxel_size)
        x0, y0, z0 = (float(s) for s in self.point_cloud_range[:3])
        use_abs_xyz = self.model_cfg.get("USE_ABSLOTE_XYZ", True)
        with_dist = self.model_cfg.get("WITH_DISTANCE", False)
        filters = list(self.model_cfg["NUM_FILTERS"])

        pillar_vsize = (vx, vy, float(self.point_cloud_range[5]) - z0)

        def vox_one(pts, m):
            out = dynamic_voxelize(
                pts, m, pillar_vsize, self.point_cloud_range,
                grid_size=(gx, gy, 1), max_voxels=v,
            )
            return out["point_voxel_idx"], out["voxel_coords"], out["voxel_mask"]

        pvi, vcoords, vmask = jax.vmap(vox_one)(points, mask)

        b, np_, c = points.shape
        # fold batch into the pillar-id space so ONE segment pass serves all
        offs = (jnp.arange(b, dtype=jnp.int32) * v)[:, None]
        pvi_f = jnp.where(pvi >= 0, pvi + offs, -1).reshape(b * np_)
        pts_f = points.reshape(b * np_, c)
        valid = (pvi_f >= 0) & mask.reshape(b * np_)

        # cluster-mean and pillar-center offsets (reference :104-116)
        rows = jnp.where(valid, pvi_f, b * v)
        psum = jnp.zeros((b * v + 1, 3)).at[rows].add(
            jnp.where(valid[:, None], pts_f[:, :3], 0.0)
        )
        pcnt = jnp.zeros((b * v + 1,)).at[rows].add(valid.astype(jnp.float32))
        pmean = psum / jnp.maximum(pcnt, 1.0)[:, None]
        f_cluster = pts_f[:, :3] - pmean[rows]

        # pillar centers from voxel coords (z, y, x) of each point's pillar
        vc = vcoords.reshape(b * v, 3)
        vc_of_point = jnp.pad(vc, ((0, 1), (0, 0)))[rows]
        cx = (vc_of_point[:, 2].astype(points.dtype) + 0.5) * vx + x0
        cy = (vc_of_point[:, 1].astype(points.dtype) + 0.5) * vy + y0
        f_center = jnp.stack(
            [pts_f[:, 0] - cx, pts_f[:, 1] - cy,
             pts_f[:, 2] - (z0 + pillar_vsize[2] / 2)], axis=-1
        )

        feats = [pts_f if use_abs_xyz else pts_f[:, 3:], f_cluster, f_center]
        if with_dist:
            feats.append(jnp.linalg.norm(pts_f[:, :3], axis=-1, keepdims=True))
        x = jnp.where(valid[:, None], jnp.concatenate(feats, axis=-1), 0.0)

        pillar_feats = None
        for i, nf in enumerate(filters):
            x, pillar_feats = PFNLayerV2(
                nf, self.model_cfg.get("USE_NORM", True),
                last_layer=(i == len(filters) - 1), name=f"pfn{i}",
            )(x, pvi_f, valid, b * v, training)

        batch_dict.update(
            pillar_features=pillar_feats.reshape(b, v, -1),
            voxel_features=pillar_feats.reshape(b, v, -1),
            voxel_coords=vcoords,
            voxel_mask=vmask,
        )
        return batch_dict

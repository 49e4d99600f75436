"""PointNet2MSG backbone — set-abstraction encoder + feature-propagation decoder.

Reference: pcdet/models/backbones_3d/pointnet2_backbone.py:1-110 (PointNet2MSG:
PointnetSAModuleMSG stack over SA_CONFIG {NPOINTS, RADIUS, NSAMPLE, MLPS}, then
PointnetFPModule stack over FP_MLPS interpolating back to full resolution).
JAX redesign: dense (B, N, ...) with validity masks; FPS / ball-query /
grouping / three-nn come from ops/pointnet2_ops.py instead of the CUDA
extensions.

Consumer: PointRCNN (sets point_features over ALL raw points).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.pointnet2_ops import (
    farthest_point_sampling,
    interpolation_weights,
    three_interpolate,
    three_nn,
)
from ..backbones_3d.pfe.voxel_set_abstraction import SAGroupMSG
from ..model_utils.masked_norm import MaskedBatchNorm


class PointNet2MSG(nn.Module):
    model_cfg: dict
    input_channels: int  # raw point feature count INCLUDING xyz
    # unused here; accepted because the generic assembly passes them to all
    # point-consuming 3D backbones
    grid_size: tuple = ()
    voxel_size: tuple = ()
    point_cloud_range: tuple = ()

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg["SA_CONFIG"]
        points = batch_dict["points"]  # (B, N, 3+C)
        mask = batch_dict["points_mask"]
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        l_xyz, l_feats, l_masks = [xyz], [feats], [mask]
        for k, npoint in enumerate(cfg["NPOINTS"]):
            idx = jax.vmap(
                lambda p, m: farthest_point_sampling(p, m, int(npoint))
            )(l_xyz[k], l_masks[k])
            new_xyz = jnp.take_along_axis(l_xyz[k], idx[..., None], axis=1)
            new_mask = jnp.take_along_axis(l_masks[k], idx, axis=1)
            sa = SAGroupMSG(
                mlps=tuple(tuple(m) for m in cfg["MLPS"][k]),
                radii=tuple(float(r) for r in cfg["RADIUS"][k]),
                nsamples=tuple(int(n) for n in cfg["NSAMPLE"][k]),
                name=f"sa{k}",
            )
            new_feats = sa(l_xyz[k], l_masks[k], l_feats[k], new_xyz, new_mask, training)
            l_xyz.append(new_xyz)
            l_feats.append(new_feats)
            l_masks.append(new_mask)

        # feature propagation back down: FP_MLPS[k] refines level k from k+1
        fp_mlps = self.model_cfg["FP_MLPS"]
        for k in range(len(fp_mlps) - 1, -1, -1):
            known_xyz, known_feats, known_mask = l_xyz[k + 1], l_feats[k + 1], l_masks[k + 1]
            unknown_xyz, unknown_mask = l_xyz[k], l_masks[k]

            def interp_one(u, kx, kf, km):
                dists, idx = three_nn(u, kx, km)
                w = interpolation_weights(dists)
                return three_interpolate(kf, idx, w)

            interp = jax.vmap(interp_one)(unknown_xyz, known_xyz, known_feats, known_mask)
            skip = l_feats[k]
            h = interp if skip is None else jnp.concatenate([skip, interp], axis=-1)
            for li, ch in enumerate(fp_mlps[k]):
                h = nn.Dense(int(ch), use_bias=False, name=f"fp{k}_fc{li}")(h)
                h = MaskedBatchNorm(name=f"fp{k}_bn{li}")(h, unknown_mask, training=training)
                h = nn.relu(h)
            l_feats[k] = jnp.where(unknown_mask[..., None], h, 0.0)

        batch_dict["point_features"] = l_feats[0]  # (B, N, C)
        batch_dict["point_coords"] = xyz
        batch_dict["point_mask"] = mask
        return batch_dict

"""VoxelRCNNHead — RoI grid pooling directly from multi-scale voxel features.

Reference: pcdet/models/roi_heads/voxelrcnn_head.py:8-262 (per-source
NeighborVoxelSAModuleMSG pooling at 6x6x6 RoI grid points with PRE_MLP,
shared FC + separate cls/reg linear layers). The CUDA voxel_query (grid-range
bounded neighbor search) is replaced by the masked radius ball query over
voxel centers — the same neighbors are captured since POOL_RADIUS matches the
QUERY_RANGES extent.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones_3d.pfe.voxel_set_abstraction import SAGroupMSG, _voxel_source_points
from ..model_utils.masked_norm import MaskedBatchNorm
from .pvrcnn_head import get_global_grid_points_of_roi


class VoxelRCNNHead(nn.Module):
    model_cfg: dict
    voxel_size: tuple
    point_cloud_range: tuple
    grid_size: tuple  # (nx, ny, nz)
    num_class: int = 1
    code_size: int = 7

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        pool_cfg = cfg["ROI_GRID_POOL"]
        rois = batch_dict["rois"]
        roi_mask = batch_dict.get("roi_mask", jnp.ones(rois.shape[:2], dtype=bool))
        b, r = rois.shape[:2]
        g = int(pool_cfg["GRID_SIZE"])
        g3 = g * g * g

        grid_pts = get_global_grid_points_of_roi(rois, g).reshape(b, r * g3, 3)
        grid_mask = jnp.broadcast_to(roi_mask[:, :, None], (b, r, g3)).reshape(b, r * g3)

        feats_list = []
        for src in pool_cfg["FEATURES_SOURCE"]:
            ms = batch_dict["multi_scale_3d_features"][src]
            xyz, f, m = _voxel_source_points(
                ms, self.voxel_size, self.point_cloud_range, int(self.grid_size[2])
            )
            f = f.astype(jnp.float32)
            lcfg = pool_cfg["POOL_LAYERS"][src]
            if pool_cfg.get("PRE_MLP", False):
                c0 = int(lcfg["MLPS"][0][0])
                f = nn.Dense(c0, use_bias=False, name=f"{src}_pre_fc")(f)
                f = MaskedBatchNorm(name=f"{src}_pre_bn")(f, m, training=training)
                f = nn.relu(f)
            sa = SAGroupMSG(
                mlps=tuple(tuple(mm) for mm in lcfg["MLPS"]),
                radii=tuple(float(x) for x in lcfg["POOL_RADIUS"]),
                nsamples=tuple(int(n) for n in lcfg["NSAMPLE"]),
                name=f"pool_{src}",
            )
            feats_list.append(sa(xyz, m, f, grid_pts, grid_mask, training))
        pooled = jnp.concatenate(feats_list, axis=-1)  # (B, R*G3, Cp)
        h = pooled.reshape(b, r, g3 * pooled.shape[-1])

        dp = float(cfg.get("DP_RATIO", 0.0))
        shared = [int(c) for c in cfg["SHARED_FC"]]
        for i, ch in enumerate(shared):
            h = nn.Dense(ch, use_bias=False, name=f"shared_fc{i}")(h)
            h = MaskedBatchNorm(name=f"shared_bn{i}")(h, roi_mask, training=training)
            h = nn.relu(h)
            if dp > 0 and i != len(shared) - 1:
                h = nn.Dropout(rate=dp, deterministic=not training, name=f"shared_dp{i}")(h)

        def branch(x, fcs, out_ch, tag):
            for i, ch in enumerate(fcs):
                x = nn.Dense(int(ch), use_bias=False, name=f"{tag}_fc{i}")(x)
                x = MaskedBatchNorm(name=f"{tag}_bn{i}")(x, roi_mask, training=training)
                x = nn.relu(x)
            return nn.Dense(
                out_ch, name=f"{tag}_out",
                kernel_init=nn.initializers.normal(stddev=0.001) if tag == "reg"
                else nn.initializers.xavier_normal(),
            )(x)

        nc = 1 if cfg.get("CLASS_AGNOSTIC", True) else self.num_class
        batch_dict["rcnn_cls"] = branch(h, cfg["CLS_FC"], nc, "cls")
        batch_dict["rcnn_reg"] = branch(h, cfg["REG_FC"], self.code_size * nc, "reg")
        return batch_dict

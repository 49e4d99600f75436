"""PVRCNNHead — RoI grid pooling over VSA keypoints + box refinement.

Reference: pcdet/models/roi_heads/pvrcnn_head.py:1-175 (roi_grid_pool via
StackSAModuleMSG over keypoint features weighted by point_cls_scores, dense
6x6x6 RoI grid points, shared FC -> cls/reg branches). Target assignment and
losses live in roi_utils (shared with the other two-stage heads).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.common_utils import rotate_points_along_z_jnp
from ..backbones_3d.pfe.voxel_set_abstraction import SAGroupMSG
from ..model_utils.masked_norm import MaskedBatchNorm


def get_dense_grid_points(rois, grid_size):
    """(..., 7) rois -> (..., G^3, 3) local grid points (reference
    pvrcnn_head.get_dense_grid_points: cell centers in box-local frame)."""
    g = grid_size
    gx, gy, gz = jnp.meshgrid(
        jnp.arange(g, dtype=rois.dtype),
        jnp.arange(g, dtype=rois.dtype),
        jnp.arange(g, dtype=rois.dtype),
        indexing="ij",
    )
    dense_idx = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # (G^3, 3)
    size = rois[..., None, 3:6]
    return (dense_idx + 0.5) / g * size - size / 2


def get_global_grid_points_of_roi(rois, grid_size):
    """(B, R, 7+) -> (B, R, G^3, 3) world-frame grid points."""
    local = get_dense_grid_points(rois[..., :7], grid_size)  # (B, R, G3, 3)
    b, r, g3, _ = local.shape
    rot = rotate_points_along_z_jnp(
        local.reshape(b * r, g3, 3), rois[..., 6].reshape(-1)
    ).reshape(b, r, g3, 3)
    return rot + rois[..., None, 0:3]


class PVRCNNHead(nn.Module):
    model_cfg: dict
    num_class: int = 1
    code_size: int = 7

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        rois = batch_dict["rois"]  # (B, R, 7+)
        roi_mask = batch_dict.get(
            "roi_mask", jnp.ones(rois.shape[:2], dtype=bool)
        )
        b, r = rois.shape[:2]
        g = int(cfg["ROI_GRID_POOL"]["GRID_SIZE"])
        g3 = g * g * g

        grid_pts = get_global_grid_points_of_roi(rois, g).reshape(b, r * g3, 3)
        grid_mask = jnp.broadcast_to(roi_mask[:, :, None], (b, r, g3)).reshape(b, r * g3)

        feats = batch_dict["point_features"] * batch_dict["point_cls_scores"][..., None]
        pool_cfg = cfg["ROI_GRID_POOL"]
        if pool_cfg.get("NAME") == "VectorPoolAggregationModuleMSG":
            from ..backbones_3d.pfe.vector_pool import VectorPoolAggregationMSG

            sa = VectorPoolAggregationMSG(model_cfg=pool_cfg, name="roi_grid_pool")
        else:
            sa = SAGroupMSG(
                mlps=tuple(tuple(m) for m in pool_cfg["MLPS"]),
                radii=tuple(float(x) for x in pool_cfg["POOL_RADIUS"]),
                nsamples=tuple(int(n) for n in pool_cfg["NSAMPLE"]),
                name="roi_grid_pool",
            )
        pooled = sa(
            batch_dict["point_coords"], batch_dict["point_mask"], feats,
            grid_pts, grid_mask, training,
        )  # (B, R*G3, Cp)
        pooled = pooled.reshape(b, r, g3 * pooled.shape[-1])

        h = pooled
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
                if dp > 0 and i == 0:
                    x = nn.Dropout(rate=dp, deterministic=not training, name=f"{tag}_dp")(x)
            return nn.Dense(
                out_ch,
                name=f"{tag}_out",
                kernel_init=nn.initializers.normal(stddev=0.001) if tag == "reg" else
                nn.initializers.xavier_normal(),
            )(x)

        nc = 1 if cfg.get("CLASS_AGNOSTIC", True) else self.num_class
        batch_dict["rcnn_cls"] = branch(h, cfg["CLS_FC"], nc, "cls")  # (B, R, nc)
        batch_dict["rcnn_reg"] = branch(h, cfg["REG_FC"], self.code_size * nc, "reg")
        return batch_dict

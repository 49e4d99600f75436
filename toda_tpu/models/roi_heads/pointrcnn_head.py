"""PointRCNNHead — canonical per-RoI point pooling + PointNet encoder.

Reference: pcdet/models/roi_heads/pointrcnn_head.py:1-179 (roipoint pooling
with [score, depth] prefix channels, canonical transform into the RoI frame,
xyz_up/merge 1x1 convs, a 3-level SA stack ending in group-all, cls/reg FCs).
Target assignment / losses / decode come from roi_utils (shared template).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_pool3d import roipoint_pool3d
from ...utils.common_utils import rotate_points_along_z_jnp
from ..backbones_3d.pfe.voxel_set_abstraction import SAGroupMSG
from ..model_utils.masked_norm import MaskedBatchNorm
from ...ops.pointnet2_ops import farthest_point_sampling


class PointRCNNHead(nn.Module):
    model_cfg: dict
    num_class: int = 1
    code_size: int = 7

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        rois = batch_dict["rois"]  # (B, R, 7)
        roi_mask = batch_dict.get("roi_mask", jnp.ones(rois.shape[:2], dtype=bool))
        b, r = rois.shape[:2]
        k = int(cfg["ROI_POINT_POOL"]["NUM_SAMPLED_POINTS"])
        depth_norm = float(cfg["ROI_POINT_POOL"].get("DEPTH_NORMALIZER", 70.0))
        use_bn = bool(cfg.get("USE_BN", False))

        pts = batch_dict["point_coords"]  # (B, N, 3)
        pmask = batch_dict["point_mask"]
        scores = jax.lax.stop_gradient(batch_dict["point_cls_scores"])
        depth = jnp.linalg.norm(pts, axis=-1) / depth_norm - 0.5
        feats = jnp.concatenate(
            [scores[..., None], depth[..., None], batch_dict["point_features"]], axis=-1
        )

        pooled, empty = jax.vmap(
            lambda p, f, m, rr: roipoint_pool3d(p, f, m, rr[:, :7], num_sampled_points=k)
        )(pts, feats, pmask, rois)  # (B, R, K, 3 + 2 + C), (B, R)
        # The reference pools under torch.no_grad() (pointrcnn_head.py:116):
        # the rcnn loss trains this head's layers only — the PointNet2 backbone
        # and point head see ZERO gradient through the pooled point features
        # (they are trained by the point-head losses alone). Pinned by
        # test_model_pointrcnn_multihead.py::
        # test_pointrcnn_rcnn_loss_does_not_backprop_into_backbone.
        pooled = jax.lax.stop_gradient(pooled)

        # canonical transform into each RoI's frame
        xyz = pooled[..., :3] - rois[:, :, None, :3]
        xyz = rotate_points_along_z_jnp(
            xyz.reshape(b * r, k, 3), -rois[..., 6].reshape(-1)
        ).reshape(b, r, k, 3)
        valid = (~empty)[..., None] & roi_mask[..., None]  # (B, R, K)
        valid = jnp.broadcast_to(valid, (b, r, k))

        def mlp(x, channels, tag):
            for i, ch in enumerate(channels):
                x = nn.Dense(int(ch), use_bias=not use_bn, name=f"{tag}_fc{i}")(x)
                if use_bn:
                    x = MaskedBatchNorm(name=f"{tag}_bn{i}")(x, valid, training=training)
                x = nn.relu(x)
            return x

        prefix = jnp.concatenate([xyz, pooled[..., 3:5]], axis=-1)  # xyz+score+depth
        xyz_feat = mlp(prefix, cfg["XYZ_UP_LAYER"], "xyz_up")
        merged = jnp.concatenate([xyz_feat, pooled[..., 5:]], axis=-1)
        h = mlp(merged, [int(cfg["XYZ_UP_LAYER"][-1])], "merge")
        h = jnp.where(valid[..., None], h, 0.0)

        # SA stack over the pooled points of each RoI (batch = B*R)
        sa_cfg = cfg["SA_CONFIG"]
        cur_xyz = xyz.reshape(b * r, k, 3)
        cur_feats = h.reshape(b * r, k, -1)
        cur_mask = valid.reshape(b * r, k)
        for si, npoint in enumerate(sa_cfg["NPOINTS"]):
            radius = float(sa_cfg["RADIUS"][si])
            ns = int(sa_cfg["NSAMPLE"][si])
            mlps = tuple(int(c) for c in sa_cfg["MLPS"][si])
            if int(npoint) == -1:  # group-all: masked max over remaining points
                g = jnp.concatenate([cur_xyz, cur_feats], axis=-1)
                for li, ch in enumerate(mlps):
                    g = nn.Dense(ch, use_bias=not use_bn, name=f"sa{si}_fc{li}")(g)
                    if use_bn:
                        g = MaskedBatchNorm(name=f"sa{si}_bn{li}")(g, cur_mask, training=training)
                    g = nn.relu(g)
                g = jnp.where(cur_mask[..., None], g, -jnp.inf)
                pooled_g = g.max(axis=1)  # (B*R, C)
                any_valid = cur_mask.any(axis=1)
                shared = jnp.where(any_valid[..., None], pooled_g, 0.0)
                cur_feats = shared[:, None, :]
                break
            idx = jax.vmap(
                lambda p, m: farthest_point_sampling(p, m, int(npoint))
            )(cur_xyz, cur_mask)
            new_xyz = jnp.take_along_axis(cur_xyz, idx[..., None], axis=1)
            new_mask = jnp.take_along_axis(cur_mask, idx, axis=1)
            sa = SAGroupMSG(mlps=(mlps,), radii=(radius,), nsamples=(ns,),
                            chunk=min(int(npoint), 512), name=f"sa{si}")
            cur_feats = sa(cur_xyz, cur_mask, cur_feats, new_xyz, new_mask, training)
            cur_xyz, cur_mask = new_xyz, new_mask

        shared = cur_feats.reshape(b, r, -1)

        def head(x, fcs, out_ch, tag):
            for i, ch in enumerate(fcs):
                x = nn.Dense(int(ch), use_bias=not use_bn, name=f"{tag}_fc{i}")(x)
                if use_bn:
                    x = MaskedBatchNorm(name=f"{tag}_bn{i}")(x, roi_mask, training=training)
                x = nn.relu(x)
            return nn.Dense(
                out_ch, name=f"{tag}_out",
                kernel_init=nn.initializers.normal(stddev=0.001) if tag == "reg"
                else nn.initializers.xavier_normal(),
            )(x)

        nc = 1 if cfg.get("CLASS_AGNOSTIC", True) else self.num_class
        batch_dict["rcnn_cls"] = head(shared, cfg["CLS_FC"], nc, "cls")
        batch_dict["rcnn_reg"] = head(shared, cfg["REG_FC"], self.code_size * nc, "reg")
        return batch_dict

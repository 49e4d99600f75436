"""PartA2FCHead — RoI-aware part/feature pooling + grid conv refinement.

Reference: pcdet/models/roi_heads/partA2_head.py:10-228 (roiaware avg-pool of
[part_offset, seg_score] features with SEG_MASK_SCORE_THRESH gating, max-pool
of rpn features, two sparse-conv stacks merged and fed to shared FC + cls/reg).
The tiny GxGxG per-RoI grids are processed with DENSE 3D convs here — at G=12
the dense grid is a few hundred cells, where sparse bookkeeping costs more
than it saves on TPU.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_pool3d import roiaware_pool3d
from ..model_utils.masked_norm import MaskedBatchNorm


class PartA2FCHead(nn.Module):
    model_cfg: dict
    num_class: int = 1
    code_size: int = 7

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        rois = batch_dict["rois"]
        roi_mask = batch_dict.get("roi_mask", jnp.ones(rois.shape[:2], dtype=bool))
        b, r = rois.shape[:2]
        g = int(cfg["ROI_AWARE_POOL"]["POOL_SIZE"])
        nf = int(cfg["ROI_AWARE_POOL"].get("NUM_FEATURES", 128))
        c0 = nf // 2
        thresh = float(cfg.get("SEG_MASK_SCORE_THRESH", 0.3))

        pts = batch_dict["point_coords"]  # (B, N, 3)
        pmask = batch_dict["point_mask"]
        seg = jax.lax.stop_gradient(batch_dict["point_cls_scores"])  # (B, N)
        if cfg.get("DISABLE_PART", False):
            # PartA2_free: pool raw coords instead of part offsets
            # (reference partA2_head.py:122)
            part = pts
        else:
            part = batch_dict.get(
                "point_part_offset", jnp.zeros(pts.shape, dtype=pts.dtype)
            )
        part = jnp.where((seg >= thresh)[..., None], part, 0.0)
        part_feats = jnp.concatenate([part, seg[..., None]], axis=-1)  # (B, N, 4)

        pooled_part, _ = jax.vmap(
            lambda p, f, m, rr: roiaware_pool3d(p, f, m, rr[:, :7], out_size=g, pool="avg")
        )(pts, part_feats, pmask, rois)  # (B, R, G, G, G, 4)
        pooled_rpn, _ = jax.vmap(
            lambda p, f, m, rr: roiaware_pool3d(p, f, m, rr[:, :7], out_size=g, pool="max")
        )(pts, batch_dict["point_features"], pmask, rois)

        def conv_stack(x, tag):
            for i, ch in enumerate((64, c0)):
                x = nn.Conv(ch, (3, 3, 3), padding="SAME", use_bias=False,
                            name=f"{tag}{i}")(x.reshape(b * r, g, g, g, -1)).reshape(
                    b, r, g, g, g, -1
                )
                zm = jnp.broadcast_to(
                    roi_mask[:, :, None, None, None], x.shape[:-1]
                )
                x = MaskedBatchNorm(name=f"{tag}{i}_bn")(x, zm, training=training)
                x = nn.relu(x)
            return x

        x_part = conv_stack(pooled_part, "conv_part")
        x_rpn = conv_stack(pooled_rpn, "conv_rpn")
        merged = jnp.concatenate([x_rpn, x_part], axis=-1)  # (B, R, G, G, G, NF)
        h = merged.reshape(b, r, -1)

        dp = float(cfg.get("DP_RATIO", 0.0))
        shared = [int(c) for c in cfg["SHARED_FC"]]
        for i, ch in enumerate(shared):
            h = nn.Dense(ch, use_bias=False, name=f"shared_fc{i}")(h)
            h = MaskedBatchNorm(name=f"shared_bn{i}")(h, roi_mask, training=training)
            h = nn.relu(h)
            if dp > 0 and i != len(shared) - 1:
                h = nn.Dropout(rate=dp, deterministic=not training, name=f"shared_dp{i}")(h)

        def head(x, fcs, out_ch, tag):
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
        batch_dict["rcnn_cls"] = head(h, cfg["CLS_FC"], nc, "cls")
        batch_dict["rcnn_reg"] = head(h, cfg["REG_FC"], self.code_size * nc, "reg")
        return batch_dict

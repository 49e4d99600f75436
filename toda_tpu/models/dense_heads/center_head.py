"""CenterPoint detection head (heatmap + regression), TPU-native formulation.

Reference: pcdet/models/dense_heads/center_head.py (355 LoC) +
model_utils/centernet_utils.py (gaussian radius/draw, top-K decode). Redesigns:
  * gaussian target "drawing" is a vectorized max-combine of per-object gaussians
    over the whole map (no serial canvas mutation) — identical values, one fused
    XLA op instead of K scatter windows;
  * decode is a single top-K over the flattened (H*W*C) score volume with static K;
  * NHWC layout throughout.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import loss_utils


def gaussian_radius(det_size, min_overlap=0.5):
    """Radius such that a shifted box still overlaps IoU >= min_overlap.

    Reference: centernet_utils.gaussian_radius (3-case formula).
    """
    height, width = det_size
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1**2 - 4 * a1 * c1, 0, None))
    r1 = (b1 + sq1) / 2
    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.clip(b2**2 - 4 * a2 * c2, 0, None))
    r2 = (b2 + sq2) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.clip(b3**2 - 4 * a3 * c3, 0, None))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


class SeparateHead(nn.Module):
    head_dict: dict  # name -> {out_channels, num_conv}
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x, training=False):
        out = {}
        for name, cfg in self.head_dict.items():
            h = x
            for k in range(cfg["num_conv"] - 1):
                h = nn.Conv(x.shape[-1], (3, 3), padding="SAME", use_bias=False,
                            name=f"{name}_conv{k}")(h)
                h = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                                 epsilon=1e-3, name=f"{name}_bn{k}")(h)
                h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "hm"
                else nn.initializers.zeros_init()
            )
            out[name] = nn.Conv(cfg["out_channels"], (3, 3), padding="SAME",
                                bias_init=bias_init, name=f"{name}_out")(h)
        return out


class CenterHead(nn.Module):
    model_cfg: dict
    input_channels: int
    num_class: int
    class_names: tuple
    grid_size: tuple  # (nx, ny, nz)
    point_cloud_range: tuple
    voxel_size: tuple

    def head_class_groups(self):
        groups = self.model_cfg.get("CLASS_NAMES_EACH_HEAD", None)
        if groups is None:
            groups = [list(self.class_names)]
        return [[c for c in g if c in self.class_names] for g in groups]

    @nn.compact
    def __call__(self, batch_dict, training=False):
        x = batch_dict["spatial_features_2d"]
        shared_ch = self.model_cfg.get("SHARED_CONV_CHANNEL", 64)
        x = nn.Conv(shared_ch, (3, 3), padding="SAME", use_bias=False, name="shared_conv")(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3, name="shared_bn")(x)
        x = nn.relu(x)

        head_order = self.model_cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"]
        head_dict_cfg = self.model_cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"]
        pred_dicts = []
        for gi, group in enumerate(self.head_class_groups()):
            hd = {"hm": {"out_channels": len(group), "num_conv": 2}}
            for name in head_order:
                hd[name] = dict(head_dict_cfg[name])
            pred_dicts.append(SeparateHead(head_dict=hd, name=f"head_{gi}")(x, training))
        batch_dict["center_pred_dicts"] = pred_dicts
        return batch_dict

    # ---- target assignment (static methods: pure functions of arrays) ---------

    def assign_targets(self, gt_boxes):
        """gt_boxes: (B, M, 8+) padded. Returns per-head-group target dicts with
        heatmaps (B, H, W, nc_g), inds (B, M), masks (B, M), box targets (B, M, D).

        Reference: center_head.assign_target_of_single_head (:103-220).
        """
        stride = self.model_cfg["TARGET_ASSIGNER_CONFIG"].get("FEATURE_MAP_STRIDE", 1)
        nx, ny = int(self.grid_size[0]) // stride, int(self.grid_size[1]) // stride
        vx, vy = self.voxel_size[0] * stride, self.voxel_size[1] * stride
        x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]
        cfg = self.model_cfg["TARGET_ASSIGNER_CONFIG"]
        min_radius = cfg.get("MIN_RADIUS", 2)
        gaussian_overlap = cfg.get("GAUSSIAN_OVERLAP", 0.1)

        groups = self.head_class_groups()
        all_targets = []
        for group in groups:
            cls_ids = jnp.asarray(
                [self.class_names.index(c) + 1 for c in group], dtype=jnp.int32
            )

            def one_frame(gt):
                gcls = gt[:, -1].astype(jnp.int32)  # (M,) class id is the LAST column
                # local class index within this head group, -1 if not in group
                eq = gcls[:, None] == cls_ids[None, :]
                in_group = eq.any(axis=1)
                local_cls = jnp.argmax(eq, axis=1)
                cx = (gt[:, 0] - x0) / vx
                cy = (gt[:, 1] - y0) / vy
                xi = jnp.floor(cx).astype(jnp.int32)
                yi = jnp.floor(cy).astype(jnp.int32)
                in_map = (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
                valid = in_group & in_map & (gcls > 0)

                dx = gt[:, 3] / vx
                dy = gt[:, 4] / vy
                radius = gaussian_radius(
                    (dy, dx), min_overlap=gaussian_overlap
                )
                radius = jnp.clip(jnp.floor(radius), min_radius, None)

                # vectorized gaussian splat: (M, ny, nx)
                ys = jnp.arange(ny, dtype=jnp.float32)[None, :, None]
                xs = jnp.arange(nx, dtype=jnp.float32)[None, None, :]
                d2 = (xs - xi[:, None, None]) ** 2 + (ys - yi[:, None, None]) ** 2
                sigma = (2 * radius + 1) / 6.0
                g = jnp.exp(-d2 / (2 * sigma[:, None, None] ** 2))
                window = (jnp.abs(xs - xi[:, None, None]) <= radius[:, None, None]) & (
                    jnp.abs(ys - yi[:, None, None]) <= radius[:, None, None]
                )
                g = jnp.where(window & valid[:, None, None], g, 0.0)
                # per-class max-combine -> (ny, nx, nc_g)
                cls_onehot = jax.nn.one_hot(local_cls, len(group), dtype=g.dtype)
                heatmap = jnp.max(
                    g[:, :, :, None] * cls_onehot[:, None, None, :], axis=0
                )

                ind = jnp.where(valid, yi * nx + xi, 0)
                # regression targets at centers
                tgt = jnp.stack(
                    [
                        cx - xi.astype(jnp.float32),
                        cy - yi.astype(jnp.float32),
                        gt[:, 2],
                        jnp.log(jnp.clip(gt[:, 3], 1e-3, None)),
                        jnp.log(jnp.clip(gt[:, 4], 1e-3, None)),
                        jnp.log(jnp.clip(gt[:, 5], 1e-3, None)),
                        jnp.cos(gt[:, 6]),
                        jnp.sin(gt[:, 6]),
                    ],
                    axis=-1,
                )
                if gt.shape[1] > 9:  # velocity channels present (nuScenes)
                    tgt = jnp.concatenate([tgt, gt[:, 7:9]], axis=-1)
                return {
                    "heatmap": heatmap,
                    "ind": ind.astype(jnp.int32),
                    "mask": valid,
                    "box_targets": tgt,
                    "local_cls": local_cls,
                }

            all_targets.append(jax.vmap(one_frame)(gt_boxes))
        return all_targets

    def get_loss(self, batch_dict, gt_boxes):
        """Total heatmap focal + reg L1 loss (reference center_head.get_loss)."""
        lw = self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
        head_order = self.model_cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"]
        targets = self.assign_targets(gt_boxes)
        pred_dicts = batch_dict["center_pred_dicts"]
        total, tb = 0.0, {}
        for gi, (pred, tgt) in enumerate(zip(pred_dicts, targets)):
            hm_pred = jax.nn.sigmoid(pred["hm"])
            hm_loss = loss_utils.focal_loss_centernet(hm_pred, tgt["heatmap"])
            # concat regression channels in HEAD_ORDER
            reg_pred = jnp.concatenate([pred[k] for k in head_order], axis=-1)
            b, h, w, d = reg_pred.shape
            reg_loss = loss_utils.reg_loss_centernet(
                reg_pred.reshape(b, h * w, d), tgt["box_targets"], tgt["ind"], tgt["mask"]
            )
            total = total + hm_loss * lw["cls_weight"] + reg_loss * lw["loc_weight"]
            tb[f"hm_loss_head_{gi}"] = hm_loss
            tb[f"loc_loss_head_{gi}"] = reg_loss
        tb["rpn_loss"] = total
        return total, tb

    def generate_predicted_boxes(self, batch_dict, max_obj=128):
        """Top-K decode over all head groups -> (B, K, 7[+2]) boxes, scores, labels.

        Reference: centernet_utils.decode_bbox_from_heatmap (:253-323).
        """
        stride = self.model_cfg["TARGET_ASSIGNER_CONFIG"].get("FEATURE_MAP_STRIDE", 1)
        nx, ny = int(self.grid_size[0]) // stride, int(self.grid_size[1]) // stride
        vx, vy = self.voxel_size[0] * stride, self.voxel_size[1] * stride
        x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]
        head_order = self.model_cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"]
        groups = self.head_class_groups()

        boxes_all, scores_all, labels_all = [], [], []
        for pred, group in zip(batch_dict["center_pred_dicts"], groups):
            scores = jax.nn.sigmoid(pred["hm"])  # (B, H, W, nc)
            b = scores.shape[0]
            flat = scores.reshape(b, -1)  # (B, H*W*nc)
            k = min(max_obj, flat.shape[1])
            top_scores, top_idx = jax.lax.top_k(flat, k)
            nc = len(group)
            spatial = top_idx // nc
            local_cls = top_idx % nc
            yi = spatial // nx
            xi = spatial % nx

            reg_pred = jnp.concatenate([pred[kk] for kk in head_order], axis=-1)
            d = reg_pred.shape[-1]
            reg_flat = reg_pred.reshape(b, -1, d)
            reg = jnp.take_along_axis(reg_flat, spatial[..., None], axis=1)  # (B, K, d)

            xs = (xi.astype(jnp.float32) + reg[..., 0]) * vx + x0
            ys_ = (yi.astype(jnp.float32) + reg[..., 1]) * vy + y0
            zs = reg[..., 2]
            dims = jnp.exp(jnp.clip(reg[..., 3:6], -5, 5))
            rot = jnp.arctan2(reg[..., 7], reg[..., 6])
            parts = [xs[..., None], ys_[..., None], zs[..., None], dims, rot[..., None]]
            if d > 8:
                parts.append(reg[..., 8:10])  # velocity
            boxes = jnp.concatenate(parts, axis=-1)

            global_cls = jnp.asarray(
                [self.class_names.index(c) + 1 for c in group], dtype=jnp.int32
            )[local_cls]
            boxes_all.append(boxes)
            scores_all.append(top_scores)
            labels_all.append(global_cls)

        return (
            jnp.concatenate(boxes_all, axis=1),
            jnp.concatenate(scores_all, axis=1),
            jnp.concatenate(labels_all, axis=1),
        )

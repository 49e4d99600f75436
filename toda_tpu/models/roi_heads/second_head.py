"""SECOND-IoU RoI head: rotated BEV RoI pooling + IoU-quality regression.

Reference: pcdet/models/roi_heads/second_head.py:53-178 — BEV-rotated
affine_grid/grid_sample RoI crop over the 2D feature map feeding an IoU
regression branch, used by SECONDNetIoU (detectors/second_net_iou.py) to
rescore detections (SCORE_TYPE ∈ {iou, cls, weighted_iou_cls, num_pts_iou_cls}).

JAX formulation: the rotated crop is an explicit GxG grid of box-frame sample
points transformed into map coordinates and bilinearly gathered — a dense
vectorized op over (B, N, G, G) with no torch grid_sample analog needed. The
head predicts sigmoid(IoU) in [0, 1]; training regresses the true 3D IoU of the
proposal against its best-matching gt (smooth-L1).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


def bilinear_sample(fmap, xy):
    """fmap (H, W, C); xy (..., 2) in continuous pixel coords -> (..., C)."""
    h, w, c = fmap.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx, dy = x - x0, y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def at(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        v = fmap[yy, xx]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    dxe, dye = dx[..., None], dy[..., None]
    return (
        v00 * (1 - dxe) * (1 - dye)
        + v01 * dxe * (1 - dye)
        + v10 * (1 - dxe) * dye
        + v11 * dxe * dye
    )


def rotated_roi_grid(rois, grid_size, pc_range, bev_stride, voxel_size):
    """rois (N, 7) -> (N, G, G, 2) continuous BEV pixel coordinates."""
    g = grid_size
    lin = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5  # [-0.5, 0.5)
    gx, gy = jnp.meshgrid(lin, lin, indexing="xy")  # (G, G)
    local = jnp.stack([gx, gy], axis=-1)  # (G, G, 2) box-frame fractions
    dxdy = rois[:, None, None, 3:5]
    pts = local[None] * dxdy  # (N, G, G, 2) metric box frame
    cos = jnp.cos(rois[:, 6])[:, None, None]
    sin = jnp.sin(rois[:, 6])[:, None, None]
    wx = pts[..., 0] * cos - pts[..., 1] * sin + rois[:, None, None, 0]
    wy = pts[..., 0] * sin + pts[..., 1] * cos + rois[:, None, None, 1]
    px = (wx - pc_range[0]) / (voxel_size[0] * bev_stride) - 0.5
    py = (wy - pc_range[1]) / (voxel_size[1] * bev_stride) - 0.5
    return jnp.stack([px, py], axis=-1)


class SECONDHead(nn.Module):
    model_cfg: dict
    input_channels: int
    point_cloud_range: tuple
    voxel_size: tuple
    bev_stride: int = 8

    @nn.compact
    def __call__(self, batch_dict, training=False):
        # The reference detaches the BEV feature map (second_head.py:65) in
        # addition to the rois: the IoU-rescoring loss trains ONLY this head's
        # FC stack, never the BEV/3D backbones (those are trained by the RPN
        # loss alone). Pinned by test_model_voxel.py::
        # test_second_iou_loss_does_not_backprop_into_backbone.
        fmap = jax.lax.stop_gradient(batch_dict["spatial_features_2d"])  # (B, H, W, C)
        rois = batch_dict["rois"]  # (B, N, 7)
        g = int(self.model_cfg.get("ROI_GRID_SIZE", 7))

        def pool_one(fm, r):
            grid = rotated_roi_grid(
                r, g, self.point_cloud_range, self.bev_stride, self.voxel_size
            )
            return bilinear_sample(fm, grid)  # (N, G, G, C)

        pooled = jax.vmap(pool_one)(fmap, rois)  # (B, N, G, G, C)
        b, n = pooled.shape[:2]
        x = pooled.reshape(b, n, -1)
        for i, ch in enumerate(self.model_cfg.get("SHARED_FC", [256, 256])):
            x = nn.Dense(ch, name=f"shared_fc_{i}")(x)
            x = nn.relu(x)
        iou_logit = nn.Dense(1, name="iou_head")(x)[..., 0]  # (B, N)
        batch_dict["roi_ious"] = jax.nn.sigmoid(iou_logit)
        batch_dict["roi_iou_logits"] = iou_logit
        return batch_dict


def second_head_loss(batch_dict, gt_boxes):
    """Smooth-L1 between predicted IoU and the true roi-vs-gt 3D IoU."""
    from ...ops.rotated_iou import boxes_iou3d
    from ...utils.loss_utils import smooth_l1_loss

    rois = batch_dict["rois"]  # (B, N, 7)
    pred = batch_dict["roi_ious"]

    def target_one(r, gt):
        iou = boxes_iou3d(r[:, :7], gt[:, :7])  # (N, M)
        iou = jnp.where((gt[:, -1] > 0)[None, :], iou, 0.0)  # class is LAST column
        return iou.max(axis=1)

    target = jax.vmap(target_one)(rois, gt_boxes)  # (B, N)
    loss = smooth_l1_loss(pred - target, beta=0.1).mean()
    return loss, {"rcnn_loss_iou": loss}


def rescore_detections(cls_scores, iou_scores, num_pts=None, score_type="weighted_iou_cls",
                       iou_weight=0.68):
    """Final-score mixing (reference second_net_iou.py SCORE_TYPE + the
    num_pts_iou_cls point-count schedule, cal_scores_by_npoints :139-143)."""
    if score_type == "cls":
        return cls_scores
    if score_type == "iou":
        return iou_scores
    if score_type == "weighted_iou_cls":
        return iou_weight * iou_scores + (1 - iou_weight) * cls_scores
    if score_type == "num_pts_iou_cls":
        assert num_pts is not None
        # few points -> trust cls; many points -> trust iou (reference schedule)
        w = jnp.clip(num_pts.astype(jnp.float32) / 100.0, 0.1, 0.9)
        return w * iou_scores + (1 - w) * cls_scores
    raise NotImplementedError(score_type)

"""VoxelSetAbstraction — PV-RCNN keypoint feature extraction.

Reference: pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py:1-411
(keypoint FPS sampling, multi-source set abstraction from raw points /
multi-scale voxel features / BEV bilinear interpolation, fusion MLP).

TPU redesign: the reference's "stacked" ragged batching (N1+N2+... point rows
with per-batch counts driving CUDA kernels) becomes dense (B, N, ...) tensors
with validity masks; ball-query grouping is the chunked O(chunk x N) masked
distance form (ops/pointnet2_ops.py). Both voxel substrates are supported as
SA sources: the BEV-sparse/z-dense pillar form (features (B,P,nz,C),
coords (B,P,2)) and the voxel rulebook form (features (B,V,C), coords (B,V,3)
zyx).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ....ops.pointnet2_ops import farthest_point_sampling, query_and_group_chunked
from ...model_utils.masked_norm import MaskedBatchNorm


def bilinear_interpolate(im, x, y):
    """im (H, W, C), x/y (K,) fractional pixel coords -> (K, C).

    Reference: voxel_set_abstraction.bilinear_interpolate_torch (:11-42).
    """
    h, w, c = im.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    flat = im.reshape(h * w, c)
    ia = flat[y0 * w + x0]
    ib = flat[y1 * w + x0]
    ic = flat[y0 * w + x1]
    id_ = flat[y1 * w + x1]
    wa = (x1.astype(x.dtype) - x) * (y1.astype(y.dtype) - y)
    wb = (x1.astype(x.dtype) - x) * (y - y0.astype(y.dtype))
    wc = (x - x0.astype(x.dtype)) * (y1.astype(y.dtype) - y)
    wd = (x - x0.astype(x.dtype)) * (y - y0.astype(y.dtype))
    return ia * wa[:, None] + ib * wb[:, None] + ic * wc[:, None] + id_ * wd[:, None]


class SAGroupMSG(nn.Module):
    """Multi-scale-grouping set abstraction (StackSAModuleMSG used surface:
    per-radius ball query + grouping + shared MLP + masked max-pool).

    Reference: pcdet/ops/pointnet2/pointnet2_stack/pointnet2_modules.py
    (StackSAModuleMSG.forward), config shape MLPS/POOL_RADIUS/NSAMPLE.
    """

    mlps: tuple  # tuple of per-group channel tuples
    radii: tuple
    nsamples: tuple
    chunk: int = 512

    @nn.compact
    def __call__(self, xyz, xyz_mask, feats, new_xyz, new_mask, training=False):
        # xyz (B, N, 3); feats (B, N, C) or None; new_xyz (B, M, 3)
        outs = []
        for g, (radius, ns, mlp) in enumerate(zip(self.radii, self.nsamples, self.mlps)):
            grouped, slot_valid = jax.vmap(
                lambda x, xm, q, qm, f: query_and_group_chunked(
                    radius, ns, x, xm, q, qm, f, chunk=self.chunk
                )
            )(xyz, xyz_mask, new_xyz, new_mask, feats)
            h = grouped  # (B, M, ns, 3 + C)
            for li, ch in enumerate(mlp):
                h = nn.Dense(ch, use_bias=False, name=f"g{g}_fc{li}")(h)
                h = MaskedBatchNorm(name=f"g{g}_bn{li}")(h, slot_valid, training=training)
                h = nn.relu(h)
            h = jnp.where(slot_valid[..., None], h, -jnp.inf)
            pooled = h.max(axis=2)  # (B, M, ch)
            any_valid = slot_valid.any(axis=2)
            outs.append(jnp.where(any_valid[..., None], pooled, 0.0))
        return jnp.concatenate(outs, axis=-1)


def _voxel_source_points(ms, voxel_size, pc_range, grid_nz):
    """multi_scale_3d_features entry -> (B, Nv, 3) centers, (B, Nv, C) features,
    (B, Nv) mask, for either substrate."""
    if "features_t" in ms:  # transposed pillar backbone storage
        from ..pillar_sparse_backbone import ms_features

        feats = ms_features(ms)
    else:
        feats = ms["features"]
    coords = ms["coords"]
    mask = ms["mask"]
    stride = int(ms["stride"])
    vx, vy, vz = (float(v) for v in voxel_size)
    x0, y0, z0 = (float(v) for v in pc_range[:3])
    if feats.ndim == 4:  # pillar substrate: (B, P, nzs, C), coords (B, P, 2) (y, x)
        b, p, nzs, c = feats.shape
        z_stride = max(grid_nz // nzs, 1)
        cx = (coords[..., 1].astype(feats.dtype) + 0.5) * (vx * stride) + x0
        cy = (coords[..., 0].astype(feats.dtype) + 0.5) * (vy * stride) + y0
        zc = (jnp.arange(nzs, dtype=feats.dtype) + 0.5) * (vz * z_stride) + z0
        xyz = jnp.stack(
            [
                jnp.broadcast_to(cx[..., None], (b, p, nzs)),
                jnp.broadcast_to(cy[..., None], (b, p, nzs)),
                jnp.broadcast_to(zc[None, None, :], (b, p, nzs)),
            ],
            axis=-1,
        ).reshape(b, p * nzs, 3)
        f = feats.reshape(b, p * nzs, c)
        m = jnp.broadcast_to(mask[..., None], (b, p, nzs)).reshape(b, p * nzs)
        return xyz, f, m
    # voxel substrate: (B, V, C), coords (B, V, 3) zyx
    cz = (coords[..., 0].astype(feats.dtype) + 0.5) * (vz * stride) + z0
    cy = (coords[..., 1].astype(feats.dtype) + 0.5) * (vy * stride) + y0
    cx = (coords[..., 2].astype(feats.dtype) + 0.5) * (vx * stride) + x0
    return jnp.stack([cx, cy, cz], axis=-1), feats, mask


class VoxelSetAbstraction(nn.Module):
    model_cfg: dict
    voxel_size: tuple
    point_cloud_range: tuple
    grid_size: tuple  # (nx, ny, nz)
    num_rawpoint_features: int = 4

    def _sa_cfg(self, name):
        cfg = self.model_cfg["SA_LAYER"][name]
        if cfg.get("NAME") == "VectorPoolAggregationModuleMSG":
            from .vector_pool import VectorPoolAggregationMSG

            return VectorPoolAggregationMSG(model_cfg=cfg, name=f"sa_{name}")
        mlps = tuple(tuple(m) for m in cfg["MLPS"])
        return SAGroupMSG(
            mlps=mlps,
            radii=tuple(float(r) for r in cfg["POOL_RADIUS"]),
            nsamples=tuple(int(n) for n in cfg["NSAMPLE"]),
            name=f"sa_{name}",
        )

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        num_kp = int(cfg["NUM_KEYPOINTS"])
        points = batch_dict["points"]  # (B, N, 3+C)
        points_mask = batch_dict["points_mask"]

        assert cfg.get("POINT_SOURCE", "raw_points") == "raw_points"
        sample_method = cfg.get("SAMPLE_METHOD", "FPS")
        fps_mask = points_mask
        if sample_method == "SPC":
            # sectorized proposal-centric sampling (reference
            # voxel_set_abstraction.sectorized_proposal_centric_sampling:
            # keep points within SAMPLE_RADIUS_WITH_ROI of a proposal, FPS the
            # survivors; the per-sector split is a CUDA parallelization detail)
            rois = batch_dict["rois"][..., :7]
            radius = float(cfg["SPC_SAMPLING"]["SAMPLE_RADIUS_WITH_ROI"])
            roi_mask = batch_dict.get(
                "roi_mask", jnp.ones(rois.shape[:2], dtype=bool)
            )

            def near_roi(pts, rr, rm):
                d = jnp.linalg.norm(pts[:, None, :3] - rr[None, :, :3], axis=-1)
                halfdiag = jnp.linalg.norm(rr[:, 3:6] / 2, axis=-1)
                near = d < (halfdiag + radius)[None, :]
                return (near & rm[None, :]).any(axis=1)

            fps_mask = points_mask & jax.vmap(near_roi)(points, rois, roi_mask)
            # degenerate frames (no rois): fall back to plain FPS
            fps_mask = jnp.where(
                fps_mask.any(axis=1, keepdims=True), fps_mask, points_mask
            )
        else:
            assert sample_method == "FPS", sample_method
        kp_idx = jax.vmap(lambda p, m: farthest_point_sampling(p[:, :3], m, num_kp))(
            points, fps_mask
        )  # (B, K)
        keypoints = jnp.take_along_axis(points[..., :3], kp_idx[..., None], axis=1)
        kp_mask = jnp.take_along_axis(fps_mask, kp_idx, axis=1)

        feats_list = []
        sources = list(cfg["FEATURES_SOURCE"])
        if "bev" in sources:
            bev = batch_dict["spatial_features"]  # (B, H, W, C) NHWC
            stride = float(batch_dict.get("spatial_features_stride", 8))
            x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]
            xi = (keypoints[..., 0] - x0) / self.voxel_size[0] / stride
            yi = (keypoints[..., 1] - y0) / self.voxel_size[1] / stride
            bev_feats = jax.vmap(bilinear_interpolate)(
                bev.astype(jnp.float32), xi.astype(jnp.float32), yi.astype(jnp.float32)
            )
            feats_list.append(bev_feats)

        if "raw_points" in sources:
            raw_feats = points[..., 3:] if points.shape[-1] > 3 else None
            sa = self._sa_cfg("raw_points")
            feats_list.append(
                sa(points[..., :3], points_mask, raw_feats, keypoints, kp_mask, training)
            )

        for src in sources:
            if not src.startswith("x_conv"):
                continue
            ms = batch_dict["multi_scale_3d_features"][src]
            xyz, f, m = _voxel_source_points(
                ms, self.voxel_size, self.point_cloud_range, int(self.grid_size[2])
            )
            sa = self._sa_cfg(src)
            feats_list.append(
                sa(xyz, m, f.astype(jnp.float32), keypoints, kp_mask, training)
            )

        pf = jnp.concatenate([f.astype(jnp.float32) for f in feats_list], axis=-1)
        batch_dict["point_features_before_fusion"] = pf
        h = nn.Dense(int(cfg["NUM_OUTPUT_FEATURES"]), use_bias=False, name="fusion_fc")(pf)
        h = MaskedBatchNorm(name="fusion_bn")(h, kp_mask, training=training)
        batch_dict["point_features"] = nn.relu(h)  # (B, K, C)
        batch_dict["point_coords"] = keypoints  # (B, K, 3)
        batch_dict["point_mask"] = kp_mask
        return batch_dict

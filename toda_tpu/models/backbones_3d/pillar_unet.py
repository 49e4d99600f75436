"""UNetV2 — sparse-conv encoder/decoder for point-wise features (PartA2).

Reference: pcdet/models/backbones_3d/spconv_unet.py:1-212 (UNetV2: the
VoxelBackBone8x encoder + UR decoder blocks with lateral SparseBasicBlocks,
concat-merge convs, channel-reduction residuals and SparseInverseConv3d
upsampling). Built on the BEV-sparse/z-dense pillar substrate: the inverse
sparse conv is ops/pillar_sparse.pillar_inv_conv3d over the transposed
neighbor table (active fine sites are the encoder's, as spconv's indice_key
mechanism guarantees upstream).

Outputs point_features / point_coords / point_mask over the stage-1 cells
(pillar x z-cell centers) plus the stride-8 encoded BEV tensor.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.pillar_sparse import (
    bev_downsample_sites,
    bev_inv_neighbor_idx_sorted_batched,
    bev_neighbor_idx_sorted_batched,
    pillar_conv3d,
    pillar_inv_conv3d,
    pillars_to_dense,
    voxelize_pillars,
)
from ..model_utils.masked_norm import MaskedBatchNorm
from .pillar_sparse_backbone import PillarConvLayer, PillarSubMBlock


class PillarInvConvLayer(nn.Module):
    out_channels: int
    nz_fine: int

    @nn.compact
    def __call__(self, features, inv_nbr, fine_mask, training=False):
        c = features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (3, 3, 3, c, self.out_channels),
        )
        out = pillar_inv_conv3d(
            features, inv_nbr, w.astype(features.dtype), fine_mask, self.nz_fine
        )
        zmask = jnp.broadcast_to(fine_mask[:, :, None], out.shape[:3])
        out = MaskedBatchNorm(name="bn")(out, zmask, training=training)
        return jnp.where(fine_mask[..., None, None], nn.relu(out), 0.0)


class UNetV2(nn.Module):
    model_cfg: dict
    input_channels: int
    grid_size: tuple  # (nx, ny, nz)
    voxel_size: tuple
    point_cloud_range: tuple

    @nn.compact
    def __call__(self, batch_dict, training=False):
        nx, ny, nz = (int(v) for v in self.grid_size)
        chans = list(self.model_cfg.get("CHANNELS", [16, 32, 64, 64]))
        p0 = int(self.model_cfg.get("MAX_PILLARS", 32768))
        caps = [p0, p0 // 2, p0 // 4, p0 // 8]

        vox = jax.vmap(
            lambda p, m: voxelize_pillars(
                p, m, self.voxel_size, self.point_cloud_range,
                grid_size=(nx, ny, nz), max_pillars=caps[0], nz=nz,
            )
        )(batch_dict["points"], batch_dict["points_mask"])
        x = vox["pillar_features"]
        if self.model_cfg.get("BF16", False):
            x = x.astype(jnp.bfloat16)
        coords, mask = vox["pillar_coords"], vox["pillar_mask"]
        bev_shape = (ny, nx)
        cur_nz = nz

        # ---- encoder (VoxelBackBone8x topology on the pillar substrate) ------
        stages = []  # (features, coords, mask, bev_shape, nz)
        x = PillarSubMBlock(chans[0], name="enc1")(x, coords, mask, bev_shape, training)
        stages.append((x, coords, mask, bev_shape, cur_nz))
        for si, ch in enumerate(chans[1:], start=2):
            new_coords, new_mask = jax.vmap(
                lambda c, m: bev_downsample_sites(c, m, 2, caps[si - 1], bev_shape)
            )(coords, mask)
            nbr = bev_neighbor_idx_sorted_batched(
                coords, mask, new_coords, new_mask, bev_shape, 2)
            x = PillarConvLayer(ch, z_stride=2, name=f"down{si}")(x, nbr, new_mask, training)
            coords, mask = new_coords, new_mask
            bev_shape = (-(-bev_shape[0] // 2), -(-bev_shape[1] // 2))
            cur_nz = -(-cur_nz // 2)
            x = PillarSubMBlock(ch, name=f"enc{si}")(x, coords, mask, bev_shape, training)
            stages.append((x, coords, mask, bev_shape, cur_nz))

        # ---- encoded tensor for the detection head (stride 8) ----------------
        dense = jax.vmap(lambda f, c, m: pillars_to_dense(f, c, m, bev_shape))(
            x, coords, mask
        )  # (B, ny8, nx8, nz8, C)
        out_ch = int(self.model_cfg.get("OUT_CHANNELS", 128))
        d = dense.transpose(0, 3, 1, 2, 4)  # (B, D, H, W, C)
        d = nn.Conv(out_ch, (3, 1, 1), strides=(2, 1, 1), use_bias=False,
                    name="conv_out")(d)
        d = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3, name="conv_out_bn")(d)
        batch_dict["encoded_spconv_tensor"] = nn.relu(d)
        batch_dict["encoded_spconv_tensor_stride"] = 8

        # ---- decoder: UR blocks back up to stage 1 ---------------------------
        up = stages[-1][0]
        for k in range(len(stages) - 1, 0, -1):
            lat_x, lat_coords, lat_mask, lat_shape, lat_nz = stages[k]
            fine_x, fine_coords, fine_mask, fine_shape, fine_nz = stages[k - 1]
            ch = lat_x.shape[-1]
            lateral = PillarSubMBlock(ch, residual=True, name=f"up_t{k}")(
                lat_x, lat_coords, lat_mask, lat_shape, training
            )
            merged = jnp.concatenate([up, lateral], axis=-1)
            merged = PillarSubMBlock(ch, num_layers=1, name=f"up_m{k}")(
                merged, lat_coords, lat_mask, lat_shape, training
            )
            # channel_reduction residual (reference UNetV2.channel_reduction)
            b, p, nzk, c2 = jnp.concatenate([up, lateral], axis=-1).shape
            red = jnp.concatenate([up, lateral], axis=-1).reshape(
                b, p, nzk, ch, c2 // ch
            ).sum(axis=-1)
            merged = merged + red
            inv_nbr = bev_inv_neighbor_idx_sorted_batched(
                lat_coords, lat_mask, fine_coords, fine_mask, lat_shape)
            up = PillarInvConvLayer(
                fine_x.shape[-1], nz_fine=fine_nz, name=f"up_inv{k}"
            )(merged, inv_nbr, fine_mask, training)

        # final subm at stage 1 (reference conv5 + point features)
        f_x, f_coords, f_mask, f_shape, f_nz = stages[0]
        up = jnp.concatenate([up, f_x], axis=-1)
        up = PillarSubMBlock(chans[0], num_layers=1, name="up_m0")(
            up, f_coords, f_mask, f_shape, training
        )

        # point features over stage-1 cells: (B, P*nz, C) + centers
        b, p, nz1, c1 = up.shape
        vx, vy, vz = (float(v) for v in self.voxel_size)
        x0, y0, z0 = (float(v) for v in self.point_cloud_range[:3])
        cx = (f_coords[..., 1].astype(jnp.float32) + 0.5) * vx + x0
        cy = (f_coords[..., 0].astype(jnp.float32) + 0.5) * vy + y0
        zc = (jnp.arange(nz1, dtype=jnp.float32) + 0.5) * vz + z0
        coords3 = jnp.stack(
            [
                jnp.broadcast_to(cx[..., None], (b, p, nz1)),
                jnp.broadcast_to(cy[..., None], (b, p, nz1)),
                jnp.broadcast_to(zc[None, None, :], (b, p, nz1)),
            ],
            axis=-1,
        )
        cell_mask = jnp.broadcast_to(f_mask[..., None], (b, p, nz1))
        batch_dict["point_features"] = up.reshape(b, p * nz1, c1).astype(jnp.float32)
        batch_dict["point_coords"] = coords3.reshape(b, p * nz1, 3)
        batch_dict["point_mask"] = cell_mask.reshape(b, p * nz1)
        batch_dict["pillar_coords"] = f_coords
        batch_dict["pillar_mask"] = f_mask
        return batch_dict

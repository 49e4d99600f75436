"""BEV-sparse / z-dense 3D backbones — the performance-default voxel backbones.

Same network topology as VoxelBackBone8x / VoxelResBackBone8x (reference
pcdet/models/backbones_3d/spconv_backbone.py:70-293: stem + three stride-2 stages,
channels [16, 32, 64, 64], 8x BEV stride) but on the pillar-sparse substrate
(toda_tpu/ops/pillar_sparse.py): nine wide-row BEV gathers + z-dense GEMMs per
conv instead of 27 voxel-granular gathers. See that module's docstring for the
measured rationale and semantics ("submanifold in BEV, regular in z").

These backbones consume raw points directly (the per-cell mean IS the MeanVFE of
this layout); the detector skips its generic voxelization path for them.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.pillar_sparse import (
    bev_downsample_sites,
    bev_inv_neighbor_idx_sorted,
    bev_neighbor_idx,
    build_bev_map,
    pillar_conv3d,
    pillars_to_dense,
    voxelize_pillars,
)
from ..model_utils.masked_norm import MaskedBatchNorm


class PillarConvLayer(nn.Module):
    out_channels: int
    z_stride: int = 1
    use_relu: bool = True
    identity_tap: int = -1  # 4 for stride-1 submanifold convs (center = self)

    @nn.compact
    def __call__(self, features, neighbor_idx, out_mask, training=False,
                 inv_neighbor_idx=None):
        # features (B, P_in, nz, C); neighbor_idx (B, P_out, 9); out_mask (B, P_out)
        c = features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (3, 3, 3, c, self.out_channels),
        )
        out = pillar_conv3d(
            features, neighbor_idx, w.astype(features.dtype), out_mask,
            self.z_stride, self.identity_tap if self.identity_tap >= 0 else None,
            inv_neighbor_idx,
        )
        zmask = jnp.broadcast_to(out_mask[:, :, None], out.shape[:3])
        out = MaskedBatchNorm(name="bn")(out, zmask, training=training)
        if self.use_relu:
            out = nn.relu(out)
        return jnp.where(out_mask[..., None, None], out, 0.0)


class PillarSubMBlock(nn.Module):
    out_channels: int
    num_layers: int = 2
    residual: bool = False

    @nn.compact
    def __call__(self, features, coords, mask, bev_shape, training=False):
        bmap = jax.vmap(lambda c, m: build_bev_map(c, m, bev_shape))(coords, mask)
        nbr = jax.vmap(lambda oc, om, bm: bev_neighbor_idx(oc, om, bm, bev_shape, 1))(
            coords, mask, bmap
        )
        # submanifold conv on the key-sorted set: inverse of tap t is the
        # mirrored tap 8-t on the same table (i's (8-t)-neighbor is j iff
        # j's t-neighbor is i)
        inv = nbr[..., ::-1]
        x = features
        if self.residual:
            identity = x
            x = PillarConvLayer(self.out_channels, identity_tap=4, name="conv1")(
                x, nbr, mask, training, inv
            )
            x = PillarConvLayer(
                self.out_channels, use_relu=False, identity_tap=4, name="conv2"
            )(x, nbr, mask, training, inv)
            if identity.shape[-1] != self.out_channels:
                identity = nn.Dense(self.out_channels, use_bias=False, name="proj")(identity)
            x = jnp.where(mask[..., None, None], nn.relu(x + identity), 0.0)
        else:
            for i in range(self.num_layers):
                x = PillarConvLayer(self.out_channels, identity_tap=4, name=f"subm{i}")(
                    x, nbr, mask, training, inv
                )
        return x


class _PillarBackboneBase(nn.Module):
    model_cfg: dict
    input_channels: int
    grid_size: tuple  # (nx, ny, nz)
    voxel_size: tuple
    point_cloud_range: tuple

    RESIDUAL = False

    @nn.compact
    def __call__(self, batch_dict, training=False):
        nx, ny, nz = (int(v) for v in self.grid_size)
        chans = list(self.model_cfg.get("CHANNELS", [16, 32, 64, 64]))
        p0 = int(self.model_cfg.get("MAX_PILLARS", 32768))
        caps = self.model_cfg.get("MAX_PILLARS_PER_STAGE", None)
        caps = (
            [int(v) for v in caps]
            if caps is not None
            else [p0, p0 // 2, p0 // 4, p0 // 8]
        )

        vox = jax.vmap(
            lambda p, m: voxelize_pillars(
                p, m, self.voxel_size, self.point_cloud_range,
                grid_size=(nx, ny, nz), max_pillars=caps[0], nz=nz,
            )
        )(batch_dict["points"], batch_dict["points_mask"])
        x = vox["pillar_features"]  # (B, P, nz, C)
        if self.model_cfg.get("BF16", True):
            # bf16 activations halve gather/GEMM bytes; norms accumulate in f32
            x = x.astype(jnp.bfloat16)
        coords, mask = vox["pillar_coords"], vox["pillar_mask"]
        bev_shape = (ny, nx)
        cur_nz = nz

        multi_scale = {}
        x = PillarSubMBlock(chans[0], residual=self.RESIDUAL, name="stage1")(
            x, coords, mask, bev_shape, training
        )
        multi_scale["x_conv1"] = {
            "features": x, "coords": coords, "mask": mask, "stride": 1, "nz": cur_nz,
        }

        stride = 1
        for si, ch in enumerate(chans[1:], start=2):
            new_coords, new_mask = jax.vmap(
                lambda c, m: bev_downsample_sites(c, m, 2, caps[si - 1], bev_shape)
            )(coords, mask)
            bmap = jax.vmap(lambda c, m: build_bev_map(c, m, bev_shape))(coords, mask)
            nbr = jax.vmap(
                lambda oc, om, bm: bev_neighbor_idx(oc, om, bm, bev_shape, 2)
            )(new_coords, new_mask, bmap)
            coarse_shape = (-(-bev_shape[0] // 2), -(-bev_shape[1] // 2))
            inv = jax.vmap(
                lambda cc, cm, fc, fm: bev_inv_neighbor_idx_sorted(
                    cc, cm, fc, fm, coarse_shape
                )
            )(new_coords, new_mask, coords, mask)
            x = PillarConvLayer(ch, z_stride=2, name=f"down{si}")(
                x, nbr, new_mask, training, inv
            )
            coords, mask = new_coords, new_mask
            bev_shape = (-(-bev_shape[0] // 2), -(-bev_shape[1] // 2))
            cur_nz = -(-cur_nz // 2)
            stride *= 2
            x = PillarSubMBlock(ch, residual=self.RESIDUAL, name=f"stage{si}")(
                x, coords, mask, bev_shape, training
            )
            multi_scale[f"x_conv{si}"] = {
                "features": x, "coords": coords, "mask": mask, "stride": stride, "nz": cur_nz,
            }

        dense = jax.vmap(lambda f, c, m: pillars_to_dense(f, c, m, bev_shape))(
            x, coords, mask
        )  # (B, ny8, nx8, nz8, C)
        # encoded tensor in (B, D, H, W, C) convention for HeightCompression
        batch_dict["encoded_spconv_tensor"] = dense.transpose(0, 3, 1, 2, 4).astype(
            jnp.float32 if not self.model_cfg.get("BF16", True) else jnp.bfloat16
        )
        batch_dict["encoded_spconv_tensor_stride"] = stride
        batch_dict["multi_scale_3d_features"] = multi_scale
        batch_dict["pillar_coords"] = coords
        batch_dict["pillar_mask"] = mask
        return batch_dict


class PillarBackBone8x(_PillarBackboneBase):
    RESIDUAL = False


class PillarResBackBone8x(_PillarBackboneBase):
    RESIDUAL = True

"""Sparse 3D voxel backbones (SECOND / CenterPoint) on the gather-GEMM rulebook.

Reference topology: pcdet/models/backbones_3d/spconv_backbone.py:70-293
(VoxelBackBone8x: subm stem -> three stride-2 sparse stages with subm blocks,
channels [16, 32, 64, 64] -> dense conv_out; VoxelResBackBone8x adds residual
subm blocks). Kernel design is NOT a spconv translation — see
toda_tpu/ops/sparse_ops.py for the rulebook/GEMM formulation.

Multi-scale sparse outputs (x_conv1..x_conv4) are stashed in
batch_dict['multi_scale_3d_features'] for PV-RCNN-style consumers.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.sparse_ops import (
    build_coord_map,
    gather_neighbor_idx,
    scatter_to_dense,
    sparse_downsample_sites,
    sparse_gather_conv,
)
from ..model_utils.masked_norm import MaskedBatchNorm


def _stage_grid(grid_zyx, stride):
    return tuple((g + stride - 1) // stride for g in grid_zyx)


class SparseConvLayer(nn.Module):
    """One sparse conv (subm if stride==1): gather -> GEMM -> masked BN -> ReLU."""

    out_channels: int
    kernel_size: int = 3
    use_relu: bool = True
    use_norm: bool = True

    @nn.compact
    def __call__(self, features, neighbor_idx, mask, training=False):
        k = neighbor_idx.shape[-1]
        cin = features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (k, cin, self.out_channels),
        )
        out = jax.vmap(sparse_gather_conv, in_axes=(0, 0, None))(features, neighbor_idx, w)
        if self.use_norm:
            out = MaskedBatchNorm(name="bn")(out, mask, training=training)
        if self.use_relu:
            out = nn.relu(out)
        return jnp.where(mask[..., None], out, 0.0)


class SubMBlock(nn.Module):
    """N submanifold convs on a fixed active set (rulebook computed once)."""

    out_channels: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, features, coords, mask, grid_zyx, training=False):
        cmap = jax.vmap(lambda c, m: build_coord_map(c, m, grid_zyx))(coords, mask)
        nbr = jax.vmap(
            lambda oc, om, cm: gather_neighbor_idx(oc, om, cm, grid_zyx, 3, 1)
        )(coords, mask, cmap)
        x = features
        for i in range(self.num_layers):
            x = SparseConvLayer(self.out_channels, name=f"subm{i}")(
                x, nbr, mask, training=training
            )
        return x


class SparseResBlock(nn.Module):
    """Residual submanifold block (VoxelResBackBone8x building block)."""

    out_channels: int

    @nn.compact
    def __call__(self, features, coords, mask, grid_zyx, training=False):
        cmap = jax.vmap(lambda c, m: build_coord_map(c, m, grid_zyx))(coords, mask)
        nbr = jax.vmap(
            lambda oc, om, cm: gather_neighbor_idx(oc, om, cm, grid_zyx, 3, 1)
        )(coords, mask, cmap)
        identity = features
        x = SparseConvLayer(self.out_channels, name="conv1")(
            features, nbr, mask, training=training
        )
        x = SparseConvLayer(self.out_channels, use_relu=False, name="conv2")(
            x, nbr, mask, training=training
        )
        if identity.shape[-1] != self.out_channels:
            identity = nn.Dense(self.out_channels, use_bias=False, name="proj")(identity)
        x = nn.relu(x + identity)
        return jnp.where(mask[..., None], x, 0.0)


class _SparseBackboneBase(nn.Module):
    model_cfg: dict
    input_channels: int
    grid_size: tuple  # (nx, ny, nz) dataset order

    RESIDUAL = False

    def _channels(self):
        return list(self.model_cfg.get("CHANNELS", [16, 32, 64, 64]))

    def _stage_caps(self, v):
        caps = self.model_cfg.get("MAX_VOXELS_PER_STAGE", None)
        if caps is not None:
            return [int(c) for c in caps]
        return [v, v, max(v // 2, 1), max(v // 4, 1)]

    def _block(self, ch, name):
        if self.RESIDUAL:
            return SparseResBlock(ch, name=name)
        return SubMBlock(ch, name=name)

    @nn.compact
    def __call__(self, batch_dict, training=False):
        feats = batch_dict["voxel_features"]  # (B, V, C)
        coords = batch_dict["voxel_coords"]  # (B, V, 3) zyx
        mask = batch_dict["voxel_mask"]
        nx, ny, nz = self.grid_size
        grid0 = (nz, ny, nx)
        chans = self._channels()
        caps = self._stage_caps(feats.shape[1])

        multi_scale = {}
        # stage 1: stem at stride 1
        x = self._block(chans[0], "stage1")(feats, coords, mask, grid0, training)
        multi_scale["x_conv1"] = {"features": x, "coords": coords, "mask": mask, "stride": 1}

        cur_coords, cur_mask, cur_grid = coords, mask, grid0
        stride = 1
        for si, ch in enumerate(chans[1:], start=2):
            cap = caps[si - 1]
            # downsample: new active set = occupied coarse cells
            new_coords, new_mask = jax.vmap(
                lambda c, m: sparse_downsample_sites(c, m, 2, cap, cur_grid)
            )(cur_coords, cur_mask)
            cmap = jax.vmap(lambda c, m: build_coord_map(c, m, cur_grid))(
                cur_coords, cur_mask
            )
            nbr = jax.vmap(
                lambda oc, om, cm: gather_neighbor_idx(oc, om, cm, cur_grid, 3, 2)
            )(new_coords, new_mask, cmap)
            x = SparseConvLayer(ch, name=f"down{si}")(x, nbr, new_mask, training=training)
            cur_coords, cur_mask = new_coords, new_mask
            cur_grid = _stage_grid(cur_grid, 2)
            stride *= 2
            x = self._block(ch, f"stage{si}")(x, cur_coords, cur_mask, cur_grid, training)
            multi_scale[f"x_conv{si}"] = {
                "features": x, "coords": cur_coords, "mask": cur_mask, "stride": stride,
            }

        # densify at stride 8 and collapse z with a small dense conv
        dense = jax.vmap(lambda f, c, m: scatter_to_dense(f, c, m, cur_grid))(
            x, cur_coords, cur_mask
        )  # (B, D, H, W, C)
        out_ch = self.model_cfg.get("OUT_CHANNELS", 128)
        dense = nn.Conv(
            out_ch, (3, 1, 1), strides=(2, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
            use_bias=False, name="conv_out",
        )(dense)
        dense = nn.BatchNorm(
            use_running_average=not training, momentum=0.99, epsilon=1e-3, name="bn_out"
        )(dense)
        dense = nn.relu(dense)

        batch_dict["encoded_spconv_tensor"] = dense  # (B, D', H/8, W/8, out_ch)
        batch_dict["encoded_spconv_tensor_stride"] = 8
        batch_dict["multi_scale_3d_features"] = multi_scale
        return batch_dict


class VoxelBackBone8x(_SparseBackboneBase):
    RESIDUAL = False


class VoxelResBackBone8x(_SparseBackboneBase):
    RESIDUAL = True

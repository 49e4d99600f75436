"""BEV-sparse / z-dense 3D backbones — the performance-default voxel backbones.

Same network topology as VoxelBackBone8x / VoxelResBackBone8x (reference
pcdet/models/backbones_3d/spconv_backbone.py:70-293: stem + three stride-2 stages,
channels [16, 32, 64, 64], 8x BEV stride) but on the pillar-sparse substrate
(toda_tpu/ops/pillar_sparse.py): fused span-window BEV gathers + z-dense GEMMs
per conv instead of 27 voxel-granular gathers. See that module's docstring for
the measured rationale and semantics ("submanifold in BEV, regular in z").

Activations flow in the TRANSPOSED layout flatT (nz*C, Mf) with Mf =
batch-folded pillars in lanes — XLA's native layout for tiny-C z-convs — so
no layout conversions occur between layers (measured ~150 ms/step saved at
nuScenes scale). Neighbor tables are built once per stage with the sort-based
searchsorted path (no dense BEV map), batch-folded, with analytic inverse
tables for the scatter-free conv backward.

These backbones consume raw points directly (the per-cell mean IS the MeanVFE of
this layout); the detector skips its generic voxelization path for them.
"""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import pallas_fused_conv as pfc
from ...ops.pillar_sparse import (
    bev_down_tables_batched,
    bev_downsample_sites,
    bev_neighbor_idx,
    bev_neighbor_idx_sorted_batched,
    build_bev_map,
    pillar_conv3d,
    pillar_conv3d_t,
    pillars_to_dense,
    pillars_to_dense_batched,
    voxelize_pillars,
    voxelize_pillars_batched,
)
from ..model_utils.masked_norm import MaskedBatchNorm


def fold_idx(idx, p_in):
    """(Bt, P_out, T) per-sample tables -> (Bt*P_out, T) folded into the
    concatenated row space (sample b's rows live at [b*p_in, (b+1)*p_in))."""
    bt = idx.shape[0]
    offs = (jnp.arange(bt, dtype=jnp.int32) * p_in)[:, None, None]
    return jnp.where(idx >= 0, idx + offs, -1).reshape(bt * idx.shape[1], idx.shape[2])


def ms_features(entry):
    """Materialize a multi_scale_3d_features entry as (Bt, P, nz, C)
    regardless of the stored layout (transposed backbones store features_t)."""
    if "features_t" in entry:
        ft = entry["features_t"]
        nz, bt = entry["nz"], entry["bt"]
        c = ft.shape[0] // nz
        return ft.reshape(nz, c, bt, -1).transpose(2, 3, 0, 1)
    return entry["features"]


class PillarConvLayer(nn.Module):
    """Legacy row-major conv layer (kept for UNetV2/PartA2; the main
    backbones use PillarConvLayerT's transposed flow)."""

    out_channels: int
    z_stride: int = 1
    use_relu: bool = True
    identity_tap: int = -1

    @nn.compact
    def __call__(self, features, neighbor_idx, out_mask, training=False,
                 inv_neighbor_idx=None):
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
    """Legacy row-major submanifold block (kept for UNetV2/PartA2)."""

    out_channels: int
    num_layers: int = 2
    residual: bool = False

    @nn.compact
    def __call__(self, features, coords, mask, bev_shape, training=False):
        bmap = jax.vmap(lambda c, m: build_bev_map(c, m, bev_shape))(coords, mask)
        nbr = jax.vmap(lambda oc, om, bm: bev_neighbor_idx(oc, om, bm, bev_shape, 1))(
            coords, mask, bmap
        )
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


class MaskedBatchNormT(nn.Module):
    """MaskedBatchNorm for the transposed layout: x (nz, C, Mf), mask (Mf,).
    Same parameter/stat names and semantics as MaskedBatchNorm (channel axis
    1; statistics over valid pillars x z)."""

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, training=False, return_affine=False):
        nz, c, mf = x.shape
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        in_dtype = x.dtype
        if training:
            n = jnp.maximum(mask.sum(dtype=jnp.float32) * nz, 1.0)
            xf = jnp.where(mask[None, None, :], x, 0).astype(jnp.float32)
            mean = xf.sum(axis=(0, 2)) / n
            mean_sq = (xf * xf).sum(axis=(0, 2)) / n
            var = jnp.maximum(mean_sq - mean**2, 0.0)
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        if return_affine:
            # fused-conv flow: the consumer applies y = x*inv + shift in-VMEM
            # (stats/averages above are identical to the applied path)
            return inv, bias - mean * inv
        shift = (bias - mean * inv).astype(in_dtype)
        y = x * inv.astype(in_dtype)[None, :, None] + shift[None, :, None]
        return jnp.where(mask[None, None, :], y, 0.0)


def apply_affine_t(flatT, affine, maskf, nz):
    """Materialize a pending per-channel normalization on a raw transposed
    tensor: relu(x*scale + shift) (relu iff act), masked. Used at stage
    outputs / fused-chain boundaries; inner layers consume the affine
    in-VMEM inside the fused kernel instead."""
    sc, sh, act = affine
    c = flatT.shape[0] // nz
    x3 = flatT.reshape(nz, c, -1)
    dt = flatT.dtype
    y = x3 * sc.astype(dt)[None, :, None] + sh.astype(dt)[None, :, None]
    if act:
        y = jnp.maximum(y, 0)
    y = jnp.where(maskf[None, None, :], y, 0)
    return y.reshape(nz * c, -1)


def identity_affine(c):
    """No-op input normalization (raw first layer): act=False."""
    return jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32), False


class PillarConvLayerT(nn.Module):
    out_channels: int
    nz: int
    z_stride: int = 1
    use_relu: bool = True
    identity_tap: int = -1  # 4 for stride-1 submanifold convs (center = self)
    # split backward (first raw-input layer only): dW via forward tables,
    # dx as a separate kernel that DCE drops unless input gradients are
    # consumed (FGSM perturb path keeps it automatically)
    split_bwd: bool = False
    # optional (span_fwd, span_bwd) window-span override for the fused
    # kernel — the down stages have very different per-block window needs
    spans: tuple = None

    @nn.compact
    def __call__(self, flatT, idxf, maskf, training=False, invf=None,
                 fused_in=None, in_maskf=None):
        """Legacy contract (fused_in=None): applied tensor in, applied
        (bn+relu+masked) tensor out, conv via pillar_conv3d_t + separate BN.

        Fused contract (fused_in=(scale, shift, act)): flatT is the RAW
        previous conv output whose normalization is still pending; this layer
        applies it inside the fused gather+conv kernel (no materialized
        activation pass) and returns (raw_out, (out_scale, out_shift, True))
        for the next layer. BN statistics/averages are identical either way.
        in_maskf: input-lane mask (defaults to maskf; differs for stride 2),
        only needed by the non-fusable fallback's explicit apply."""
        c = flatT.shape[0] // self.nz
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (3, 3, 3, c, self.out_channels),
        )
        it = self.identity_tap if self.identity_tap >= 0 else None
        nz_out = -(-self.nz // self.z_stride)
        if fused_in is not None:
            can = pfc.fused_ok(flatT.shape, flatT.dtype, c, self.out_channels,
                               idxf.shape[0], self.nz, self.z_stride,
                               self.spans)
            if can:
                out = pfc.fused_bnconv9_t(
                    flatT, fused_in[0], fused_in[1], w.astype(flatT.dtype),
                    idxf, invf, self.nz, self.z_stride, it, fused_in[2],
                    split_bwd=self.split_bwd, spans=self.spans,
                )
            else:
                # not fusable (e.g. c % 8 != 0 first layer, CPU tests):
                # materialize the pending affine, then the tuned legacy conv
                x = apply_affine_t(
                    flatT, fused_in,
                    maskf if in_maskf is None else in_maskf, self.nz,
                )
                out = pillar_conv3d_t(
                    x, idxf, w.astype(x.dtype), maskf, self.nz,
                    self.z_stride, it, invf,
                )
            x3 = out.reshape(nz_out, self.out_channels, -1)
            sc, sh = MaskedBatchNormT(name="bn")(
                x3, maskf, training=training, return_affine=True
            )
            return out, (sc, sh, self.use_relu)
        out = pillar_conv3d_t(
            flatT, idxf, w.astype(flatT.dtype), maskf, self.nz, self.z_stride,
            it, invf,
        )
        x3 = out.reshape(nz_out, self.out_channels, -1)
        x3 = MaskedBatchNormT(name="bn")(x3, maskf, training=training)
        if self.use_relu:
            x3 = nn.relu(x3)
        x3 = jnp.where(maskf[None, None, :], x3, 0.0)
        return x3.reshape(nz_out * self.out_channels, -1)


class PillarSubMBlockT(nn.Module):
    out_channels: int
    nz: int
    num_layers: int = 2
    residual: bool = False
    # True for the backbone's first block: its first conv consumes the raw
    # voxelizer output (identity affine, act=False), so its backward is
    # split (dW-only + DCE-able dx kernel)
    first: bool = False

    @nn.compact
    def __call__(self, flatT, idxf, maskf, training=False, fused_in=None):
        # submanifold conv on the key-sorted set: inverse of tap t is the
        # mirrored tap 8-t on the same table
        invf = idxf[:, ::-1]
        x = flatT
        if fused_in is not None and not self.residual:
            aff = fused_in
            for i in range(self.num_layers):
                x, aff = PillarConvLayerT(self.out_channels, self.nz,
                                          identity_tap=4, name=f"subm{i}",
                                          split_bwd=self.first and i == 0)(
                    x, idxf, maskf, training, invf, fused_in=aff)
            return x, aff
        if fused_in is not None and self.residual:
            # fused residual block: both convs run the fused raw+affine
            # chain; the residual join materializes ONE combined
            # apply(conv2 affine) + identity-add + relu pass. The block
            # returns an already-applied tensor with an identity affine
            # (act=False) so downstream chaining stays uniform.
            raw1, aff1 = PillarConvLayerT(self.out_channels, self.nz,
                                          identity_tap=4, name="conv1")(
                x, idxf, maskf, training, invf, fused_in=fused_in)
            raw2, aff2 = PillarConvLayerT(self.out_channels, self.nz,
                                          use_relu=False, identity_tap=4,
                                          name="conv2")(
                raw1, idxf, maskf, training, invf, fused_in=aff1)
            identity = apply_affine_t(x, fused_in, maskf, self.nz)
            cin = identity.shape[0] // self.nz
            if cin != self.out_channels:
                wp = self.param(
                    "proj_kernel", nn.initializers.lecun_normal(),
                    (cin, self.out_channels),
                )
                id3 = identity.reshape(self.nz, cin, -1)
                identity = jnp.einsum(
                    "zcm,cd->zdm", id3, wp.astype(identity.dtype)
                ).reshape(self.nz * self.out_channels, -1)
            y2 = apply_affine_t(raw2, aff2, maskf, self.nz)
            out = jnp.where(maskf[None, :], nn.relu(y2 + identity), 0.0)
            ones = jnp.ones((self.out_channels,), jnp.float32)
            return out, (ones, jnp.zeros_like(ones), False)
        if self.residual:
            identity = x
            x = PillarConvLayerT(self.out_channels, self.nz, identity_tap=4,
                                 name="conv1")(x, idxf, maskf, training, invf)
            x = PillarConvLayerT(self.out_channels, self.nz, use_relu=False,
                                 identity_tap=4, name="conv2")(
                x, idxf, maskf, training, invf)
            if identity.shape[0] // self.nz != self.out_channels:
                cin = identity.shape[0] // self.nz
                wp = self.param(
                    "proj_kernel", nn.initializers.lecun_normal(),
                    (cin, self.out_channels),
                )
                id3 = identity.reshape(self.nz, cin, -1)
                identity = jnp.einsum(
                    "zcm,cd->zdm", id3, wp.astype(identity.dtype)
                ).reshape(self.nz * self.out_channels, -1)
            x = jnp.where(maskf[None, :], nn.relu(x + identity), 0.0)
        else:
            for i in range(self.num_layers):
                x = PillarConvLayerT(self.out_channels, self.nz,
                                     identity_tap=4, name=f"subm{i}")(
                    x, idxf, maskf, training, invf)
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

        use_bf16 = self.model_cfg.get("BF16", True)
        vox = voxelize_pillars_batched(
            batch_dict["points"], batch_dict["points_mask"],
            self.voxel_size, self.point_cloud_range,
            grid_size=(nx, ny, nz), max_pillars=caps[0], nz=nz,
            transposed_cpad=8 if use_bf16 else None,
        )
        coords, mask = vox["pillar_coords"], vox["pillar_mask"]
        bt, p = mask.shape
        if "xt" in vox:
            # fused voxelizer unpack already emitted the transposed padded
            # bf16 layout (ops/pallas_gather.unpack_pillars_t)
            x = vox["xt"]
            c = x.shape[0] // nz
        else:
            x = vox["pillar_features"]  # (Bt, P, nz, C)
            if use_bf16:
                # bf16 activations halve gather/GEMM bytes; norms accumulate
                # in f32
                x = x.astype(jnp.bfloat16)
            c = x.shape[-1]
            # -> transposed flow: (nz*C, Bt*P), pillars in lanes (one relayout)
            x = x.transpose(2, 3, 0, 1).reshape(nz * c, bt * p)
            if c % 8 != 0:
                # pad input features to the 8-sublane multiple the fused
                # kernel requires, so the FIRST layer also takes the fused
                # path (the raw-feature c=4/5 legacy conv at full M was the
                # single most expensive non-fused layer). Zero channels are
                # exact: act=False skips the affine and zero inputs
                # contribute nothing; their weight columns get zero
                # gradients. Applied on every path so the param shapes stay
                # consistent across backends.
                cpad = -(-c // 8) * 8
                x = jnp.pad(
                    x.reshape(nz, c, bt * p), ((0, 0), (0, cpad - c), (0, 0))
                ).reshape(nz * cpad, bt * p)
                c = cpad
        bev_shape = (ny, nx)
        cur_nz = nz

        def subm_tables(coords, mask, bev_shape, p_in):
            nbr = bev_neighbor_idx_sorted_batched(
                coords, mask, coords, mask, bev_shape, 1)
            return fold_idx(nbr, p_in)

        multi_scale = {}
        maskf = mask.reshape(bt * p)
        idxf = subm_tables(coords, mask, bev_shape, p)
        # fused flow: chain raw activations + pending BN affines through the
        # layers (BN-apply/relu/halo handled inside the gather+conv kernels);
        # stage outputs consumed elsewhere get one explicit apply (DCE'd when
        # unused). Residual blocks join at ONE combined apply+add+relu pass
        # and hand an already-applied tensor down the chain.
        use_fused = bool(self.model_cfg.get("FUSED_CONV", True))
        aff = identity_affine(c) if use_fused else None
        if use_fused:
            x, aff = PillarSubMBlockT(chans[0], cur_nz, residual=self.RESIDUAL,
                                      first=True, name="stage1")(
                x, idxf, maskf, training, fused_in=aff)
            x1_out = apply_affine_t(x, aff, maskf, cur_nz)
        else:
            x = PillarSubMBlockT(chans[0], cur_nz, residual=self.RESIDUAL,
                                 name="stage1")(x, idxf, maskf, training)
            x1_out = x
        multi_scale["x_conv1"] = {
            "features_t": x1_out, "coords": coords, "mask": mask, "stride": 1,
            "nz": cur_nz, "bt": bt,
        }
        xs_out = x1_out

        stride = 1
        # per-stage down-conv window spans (fwd, bwd). One shared span
        # either overpays gather MACs on early stages or overflows on the
        # dense late ones (probe need128 at the kernel blocks: down2
        # 346/425, down3 424/330, down4 723/252 — down4 fwd OVERFLOWED the
        # old global 640 and silently ran the XLA fallback every step).
        down_spans = self.model_cfg.get("DOWN_SPANS", pfc.DEFAULT_DOWN_SPANS)
        for si, ch in enumerate(chans[1:], start=2):
            p_in, p_out = coords.shape[1], caps[si - 1]
            new_coords, new_mask = jax.vmap(
                lambda c_, m_: bev_downsample_sites(c_, m_, 2, p_out, bev_shape)
            )(coords, mask)
            coarse_shape = (-(-bev_shape[0] // 2), -(-bev_shape[1] // 2))
            # forward + inverse tables from windowed rank counts
            nbr, inv = bev_down_tables_batched(
                coords, mask, new_coords, new_mask, bev_shape, coarse_shape)
            new_maskf = new_mask.reshape(bt * p_out)
            if use_fused:
                ds = list(down_spans[min(si - 2, len(down_spans) - 1)])
                x, aff = PillarConvLayerT(ch, cur_nz, z_stride=2,
                                          spans=tuple(ds),
                                          name=f"down{si}")(
                    x, fold_idx(nbr, p_in), new_maskf, training,
                    fold_idx(inv, p_out), fused_in=aff, in_maskf=maskf)
            else:
                x = PillarConvLayerT(ch, cur_nz, z_stride=2, name=f"down{si}")(
                    x, fold_idx(nbr, p_in), new_maskf, training,
                    fold_idx(inv, p_out)
                )
            coords, mask, maskf = new_coords, new_mask, new_maskf
            bev_shape = coarse_shape
            cur_nz = -(-cur_nz // 2)
            stride *= 2
            idxf = subm_tables(coords, mask, bev_shape, p_out)
            if use_fused:
                x, aff = PillarSubMBlockT(ch, cur_nz, residual=self.RESIDUAL,
                                          name=f"stage{si}")(
                    x, idxf, maskf, training, fused_in=aff)
                xs_out = apply_affine_t(x, aff, maskf, cur_nz)
            else:
                x = PillarSubMBlockT(ch, cur_nz, residual=self.RESIDUAL,
                                     name=f"stage{si}")(x, idxf, maskf, training)
                xs_out = x
            multi_scale[f"x_conv{si}"] = {
                "features_t": xs_out, "coords": coords, "mask": mask,
                "stride": stride, "nz": cur_nz, "bt": bt,
            }

        # final stage -> dense BEV tensor (one small transpose)
        if use_fused:
            x = xs_out  # applied form of the last stage
        cfin = x.shape[0] // cur_nz
        x4 = x.reshape(cur_nz, cfin, bt, -1).transpose(2, 3, 0, 1)  # (Bt,P,nz,C)
        dense = pillars_to_dense_batched(
            x4, coords, mask, bev_shape
        )  # (B, ny8, nx8, nz8, C) — span-kernel scatter + gather VJP
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

"""Collapse the z axis of dense 3D voxel features into BEV channels.

Reference: pcdet/models/backbones_2d/map_to_bev/height_compression.py:4-26
(N, C, D, H, W -> N, C*D, H, W). Here NDHWC -> NHW(C*D).
"""

import flax.linen as nn


class HeightCompression(nn.Module):
    model_cfg: dict

    @nn.compact
    def __call__(self, batch_dict, training=False):
        x = batch_dict["encoded_spconv_tensor"]  # (B, D, H, W, C) dense
        b, d, h, w, c = x.shape
        x = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)
        batch_dict["spatial_features"] = x
        batch_dict["spatial_features_stride"] = batch_dict.get("encoded_spconv_tensor_stride", 8)
        return batch_dict

"""Learned z-collapse to BEV (CaDDN's map-to-BEV module).

Reference: pcdet/models/backbones_2d/map_to_bev/conv2d_collapse.py:1-38
((B, C, Z, Y, X) -> flatten z into channels -> BasicBlock2D (Conv2d+BN+ReLU)
-> (B, C, Y, X)). Here the dense tensor convention is (B, D, H, W, C):
flatten (D, C) into channels, then an NHWC conv + norm + relu.
"""

import flax.linen as nn


class Conv2DCollapse(nn.Module):
    model_cfg: dict

    @nn.compact
    def __call__(self, batch_dict, training=False):
        x = batch_dict["encoded_spconv_tensor"]  # (B, D, H, W, C)
        b, d, h, w, c = x.shape
        x = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)
        args = dict(self.model_cfg.get("ARGS", {}))
        ksize = int(args.get("kernel_size", 1))
        out_c = int(self.model_cfg["NUM_BEV_FEATURES"])
        x = nn.Conv(
            out_c, (ksize, ksize), padding="SAME",
            use_bias=bool(args.get("bias", False)), name="block_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not training, momentum=0.99, epsilon=1e-3,
            name="block_bn",
        )(x)
        x = nn.relu(x)
        batch_dict["spatial_features"] = x
        batch_dict["spatial_features_stride"] = batch_dict.get(
            "encoded_spconv_tensor_stride", 1
        )
        return batch_dict

"""Dense BEV backbone: strided conv stages + upsample-and-concat FPN.

Reference: pcdet/models/backbones_2d/base_bev_backbone.py:6-115. NHWC layout (TPU
native); convs are 3x3 SAME, the deblocks are transposed convs (or strided convs
when stride < 1 in the reference's encoding).
"""

import flax.linen as nn
import jax.numpy as jnp


class BaseBEVBackbone(nn.Module):
    model_cfg: dict
    input_channels: int

    def num_bev_features(self):
        cfg = self.model_cfg
        if cfg.get("NUM_UPSAMPLE_FILTERS", None):
            n = sum(cfg["NUM_UPSAMPLE_FILTERS"])
            if len(cfg["NUM_UPSAMPLE_FILTERS"]) > len(cfg.get("LAYER_NUMS", [])):
                n = cfg["NUM_UPSAMPLE_FILTERS"][-1]
            return n
        return cfg["NUM_FILTERS"][-1]

    @nn.compact
    def __call__(self, batch_dict, training=False):
        x = batch_dict["spatial_features"]  # (B, H, W, C)
        cfg = self.model_cfg
        layer_nums = list(cfg.get("LAYER_NUMS", []))
        layer_strides = list(cfg.get("LAYER_STRIDES", []))
        num_filters = list(cfg.get("NUM_FILTERS", []))
        upsample_strides = list(cfg.get("UPSAMPLE_STRIDES", []))
        num_upsample_filters = list(cfg.get("NUM_UPSAMPLE_FILTERS", []))

        cdtype = x.dtype  # bf16 in, bf16 compute; params stay f32

        def conv_bn_relu(x, ch, stride, name):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride), padding="SAME",
                        use_bias=False, dtype=cdtype, name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                             epsilon=1e-3, dtype=cdtype, name=f"{name}_bn")(x)
            return nn.relu(x)

        ups = []
        for i in range(len(layer_nums)):
            x = conv_bn_relu(x, num_filters[i], layer_strides[i], f"block{i}_down")
            for j in range(layer_nums[i]):
                x = conv_bn_relu(x, num_filters[i], 1, f"block{i}_layer{j}")
            if i < len(upsample_strides):
                stride = upsample_strides[i]
                if stride >= 1:
                    u = nn.ConvTranspose(
                        num_upsample_filters[i], (stride, stride),
                        strides=(stride, stride), use_bias=False, dtype=cdtype,
                        name=f"deblock{i}_deconv"
                    )(x)
                else:
                    s = int(round(1 / stride))
                    u = nn.Conv(num_upsample_filters[i], (s, s), strides=(s, s),
                                use_bias=False, dtype=cdtype, name=f"deblock{i}_conv")(x)
                u = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                                 epsilon=1e-3, dtype=cdtype, name=f"deblock{i}_bn")(u)
                ups.append(nn.relu(u))
            else:
                ups.append(x)

        if len(ups) > 1:
            x = jnp.concatenate(ups, axis=-1)
        elif ups:
            x = ups[0]

        if len(upsample_strides) > len(layer_nums):
            stride = upsample_strides[-1]
            x = nn.ConvTranspose(num_upsample_filters[-1], (stride, stride),
                                 strides=(stride, stride), use_bias=False, dtype=cdtype,
                                 name="final_deconv")(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                             epsilon=1e-3, dtype=cdtype, name="final_bn")(x)
            x = nn.relu(x)

        # heads and losses run in f32 regardless of backbone compute dtype
        batch_dict["spatial_features_2d"] = x.astype(jnp.float32)
        return batch_dict

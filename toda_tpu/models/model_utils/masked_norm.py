"""BatchNorm over padded sparse voxel lists: statistics from valid rows only.

flax's BatchNorm would average padding zeros into the statistics; sparse tensors
here are (B, V, C) with a (B, V) validity mask, so the norm must weight by mask.
This is the functional analog of spconv's BatchNorm1d-over-active-sites behavior.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, training=False):
        # x: (..., C), mask: (...) bool over all but the channel dim
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        # statistics accumulate in f32 via reduction dtype WITHOUT materializing
        # an f32 copy of x (a full-tensor astype costs 2 HBM passes per layer —
        # measured as "data formatting" in the step profile)
        in_dtype = x.dtype
        red_axes = tuple(range(x.ndim - 1))
        if training:
            wmask = mask[..., None]
            n = jnp.maximum(mask.sum(dtype=jnp.float32), 1.0)
            # the f32 converts feed ONLY reductions, so they fuse into the
            # reduce pass instead of materializing an f32 tensor
            xf = jnp.where(wmask, x, 0).astype(jnp.float32)
            mean = xf.sum(axis=red_axes) / n
            # E[x^2] - E[x]^2 form: one fused pass, no centered temporary
            mean_sq = (xf * xf).sum(axis=red_axes) / n
            var = jnp.maximum(mean_sq - mean**2, 0.0)
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        # fold (mean, inv, bias) into per-channel affines applied in x's dtype
        shift = (bias - mean * inv).astype(in_dtype)
        y = x * inv.astype(in_dtype) + shift
        return jnp.where(mask[..., None], y, 0.0)

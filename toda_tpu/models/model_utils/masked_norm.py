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

        in_dtype = x.dtype
        xf = x.astype(jnp.float32)
        if training:
            w = mask.astype(jnp.float32)[..., None]
            n = jnp.maximum(w.sum(), 1.0)
            mean = (xf * w).sum(axis=tuple(range(x.ndim - 1))) / n
            var = (((xf - mean) ** 2) * w).sum(axis=tuple(range(x.ndim - 1))) / n
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[..., None], y, 0.0).astype(in_dtype)

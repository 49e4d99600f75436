"""Verify the split backward (_fused_core_split) against the XLA reference.

Small real-TPU check: builds a synthetic sorted pillar set, compares y, dW,
dx between the split fused path and jax.vjp over _ref_fwd, for stride 1
(identity tap) with act=False (the raw-input first-layer contract).

Run: python tools/check_split_bwd.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import toda_tpu.ops.pallas_fused_conv as pfc

    M, nz, c, cout = 1024, 8, 8, 16
    ny = nx = 64
    rng = np.random.RandomState(0)
    keys = np.sort(rng.choice(ny * nx, size=M, replace=False)).astype(np.int64)
    idx = np.full((M, 9), -1, np.int32)
    for t in range(9):
        dy, dx_ = divmod(t, 3)
        q = keys + (dy - 1) * nx + (dx_ - 1)
        j = np.searchsorted(keys, q)
        jc = np.clip(j, 0, M - 1)
        hit = keys[jc] == q
        idx[:, t] = np.where(hit, jc, -1)
    idxf = jnp.asarray(idx)
    invf = idxf[:, ::-1]

    x = jnp.asarray(rng.randn(nz * c, M).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, c, cout).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    ones = jnp.ones((c,), jnp.float32)
    zeros = jnp.zeros((c,), jnp.float32)
    r = jnp.asarray(rng.randn(nz * cout, M).astype(np.float32), jnp.bfloat16)

    def f_split(x_, w_):
        y = pfc._fused_core_split(x_, ones, zeros, w_, idxf, invf, nz, 1,
                                  False, 4)
        return (y.astype(jnp.float32) * r.astype(jnp.float32)).sum()

    def f_ref(x_, w_):
        y = pfc._ref_fwd(x_, ones, zeros, w_, idxf, nz, 1, False)
        return (y.astype(jnp.float32) * r.astype(jnp.float32)).sum()

    gs = jax.jit(jax.grad(f_split, argnums=(0, 1)))
    gr = jax.jit(jax.grad(f_ref, argnums=(0, 1)))
    (dxs, dws) = gs(x, w)
    (dxr, dwr) = gr(x, w)

    def rel(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-6))

    print("dx rel err:", rel(dxs, dxr))
    print("dw rel err:", rel(dws, dwr))
    ys = jax.jit(lambda x_: pfc._fused_core_split(
        x_, ones, zeros, w, idxf, invf, nz, 1, False, 4))(x)
    yr = jax.jit(lambda x_: pfc._ref_fwd(
        x_, ones, zeros, w, idxf, nz, 1, False))(x)
    mask = np.asarray((idx >= 0).any(1))
    print("y rel err (valid lanes):",
          rel(np.asarray(ys)[:, mask], np.asarray(yr)[:, mask]))
    assert rel(dxs, dxr) < 3e-2 and rel(dws, dwr) < 3e-2
    print("OK")


if __name__ == "__main__":
    main()

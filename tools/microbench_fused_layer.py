"""A/B the fully fused BN+ReLU+gather9+conv layer vs the legacy
pillar_conv3d_t + BN-apply/relu/mask pipeline, as TWO chained layers
(the fused flow's savings appear at layer boundaries), fwd and fwd+bwd.

Run: python tools/microbench_fused_layer.py [M] [nz] [c] [stride]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import toda_tpu.ops.pallas_fused_conv as pfc
    from toda_tpu.ops.pillar_sparse import pillar_conv3d_t

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cout = c
    ny = nx = 1024
    rng = np.random.RandomState(0)

    keys = np.sort(rng.choice(ny * nx, size=M, replace=False)).astype(np.int64)
    idx = np.full((M, 9), -1, np.int32)
    for t in range(9):
        dy, dx = divmod(t, 3)
        q = keys + (dy - 1) * nx + (dx - 1)
        j = np.searchsorted(keys, q)
        jc = np.clip(j, 0, M - 1)
        hit = keys[jc] == q
        idx[:, t] = np.where(hit, jc, -1)
    idxj = jnp.asarray(idx)
    invj = idxj[:, ::-1]
    maskf = jnp.ones((M,), bool)

    tableT = jnp.asarray(rng.randn(nz * c, M).astype(np.float32), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(3, 3, 3, c, cout).astype(np.float32) * 0.1,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(3, 3, 3, cout, cout).astype(np.float32) * 0.1,
                     jnp.bfloat16)
    sc = jnp.asarray(0.9 + 0.1 * rng.rand(cout).astype(np.float32))
    sh = jnp.asarray(0.1 * rng.randn(cout).astype(np.float32))

    def stats(raw, nzz, cc):
        x3 = raw.reshape(nzz, cc, -1).astype(jnp.float32)
        mean = x3.mean(axis=(0, 2))
        var = jnp.maximum((x3 * x3).mean(axis=(0, 2)) - mean**2, 0)
        inv = jax.lax.rsqrt(var + 1e-3)
        return inv, -mean * inv

    def apply_aff(raw, s_, b_, nzz, cc):
        x3 = raw.reshape(nzz, cc, -1)
        y = x3 * s_.astype(raw.dtype)[None, :, None] + b_.astype(raw.dtype)[None, :, None]
        return jnp.maximum(y, 0).reshape(nzz * cc, -1)

    def legacy2(tbl, w1_, w2_):
        r1 = pillar_conv3d_t(tbl, idxj, w1_, maskf, nz, 1, 4, invj)
        s1, b1 = stats(r1, nz, cout)
        a1 = apply_aff(r1, s1, b1, nz, cout)
        r2 = pillar_conv3d_t(a1, idxj, w2_, maskf, nz, 1, 4, invj)
        s2, b2 = stats(r2, nz, cout)
        return apply_aff(r2, s2, b2, nz, cout)

    def fused2(tbl, w1_, w2_):
        r1 = pfc.fused_bnconv9_t(tbl, sc, sh, w1_, idxj, invj, nz, 1, 4, True)
        s1, b1 = stats(r1, nz, cout)
        r2 = pfc.fused_bnconv9_t(r1, s1, b1, w2_, idxj, invj, nz, 1, 4, True)
        s2, b2 = stats(r2, nz, cout)
        return apply_aff(r2, s2, b2, nz, cout)

    def timeit(name, fn, grad=False):
        if grad:
            def loss(tbl, w1_, w2_):
                return fn(tbl, w1_, w2_).astype(jnp.float32).mean()
            g = jax.grad(loss, argnums=(1, 2))

            def call(tbl, s):
                gw1, gw2 = g(tbl, w1 * (1 + s * 1e-6).astype(w1.dtype), w2)
                return gw1[0, 0, 0, 0, 0].astype(jnp.float32)
        else:
            def call(tbl, s):
                out = fn(tbl, w1 * (1 + s * 1e-6).astype(w1.dtype), w2)
                return out[:8, :128].astype(jnp.float32).sum()

        @partial(jax.jit, static_argnames=("n",))
        def loop(tbl, n):
            def body(carry, _):
                s, acc = carry
                # true data dep: the output scalar perturbs the next iter
                v = call(tbl, acc * 1e-9 + s.astype(jnp.float32))
                return (s + 1, acc * 0.5 + v), None
            (_, acc), _ = jax.lax.scan(
                body, (jnp.int32(0), jnp.float32(0)), None, length=n)
            return acc

        n = 16
        jax.block_until_ready(loop(tableT, n=n))  # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(loop(tableT, n=n))
        per = (time.perf_counter() - t0) / n * 1000
        print(f"{name}: {per:.2f} ms/call", flush=True)
        return per

    a = timeit("legacy2 fwd     ", legacy2)
    b = timeit("fused2  fwd     ", fused2)
    print(f"fwd speedup: {a / b:.2f}x")
    ag = timeit("legacy2 fwd+bwd ", legacy2, grad=True)
    bg = timeit("fused2  fwd+bwd ", fused2, grad=True)
    print(f"fwd+bwd speedup: {ag / bg:.2f}x")


if __name__ == "__main__":
    main()

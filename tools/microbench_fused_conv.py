"""A/B the fused gather9+conv kernel vs the stacked-gather + XLA conv path
at stage-1 nuScenes scale (bs8): the stacked path round-trips a
(9*(nz+2)*c, M) intermediate through HBM; the fused kernel contracts in VMEM.

Run: python tools/microbench_fused_conv.py [M] [nz] [c]
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

    import toda_tpu.ops.pallas_gather as pg

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cout = c
    w = (nz + 2) * c
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
    print("hit rate:", (idx >= 0).mean())

    tableT = jnp.asarray(rng.randn(w, M).astype(np.float32), jnp.bfloat16)
    weights = jnp.asarray(
        rng.randn(3, 3, 3, c, cout).astype(np.float32) * 0.1, jnp.bfloat16
    )
    idxj = jnp.asarray(idx)

    def stacked(tbl, salt):
        tbl = tbl + salt.astype(tbl.dtype) * 1e-6
        stk = pg.gather9_stacked_t(tbl, idxj, None, identity_tap=4)
        g4 = stk.reshape(9, nz + 2, c, -1)
        w9 = weights.transpose(1, 2, 0, 3, 4).reshape(9, 3, c, cout)
        out = jax.lax.conv_general_dilated(
            g4, w9, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("UWCN", "UWIO", "UWCN"),
        )[0]
        return out.reshape(nz * cout, -1)

    def fused(tbl, salt):
        tbl = tbl + salt.astype(tbl.dtype) * 1e-6
        return pg.gather9_conv_t(tbl, idxj, weights, nz, identity_tap=4)

    def timeit(name, fn):
        @partial(jax.jit, static_argnames=("n",))
        def loop(tbl, n):
            def body(carry, _):
                s, acc = carry
                out = fn(tbl, s)
                return (s + 1, acc + out[::97, ::257].astype(jnp.float32).sum()), None

            (_, acc), _ = jax.lax.scan(body, (jnp.int32(0), jnp.float32(0)), None, length=n)
            return acc

        jax.block_until_ready(loop(tableT, n=4))
        t0 = time.perf_counter()
        jax.block_until_ready(loop(tableT, n=8))
        t8 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(tableT, n=24))
        t24 = time.perf_counter() - t0
        per = (t24 - t8) / 16 * 1000
        print(f"{name}: {per:.2f} ms/call")
        return per

    a = timeit("stacked+conv", stacked)
    b = timeit("fused       ", fused)
    print(f"speedup: {a / b:.2f}x")


if __name__ == "__main__":
    main()

"""Hardware check of toda_tpu.ops.pallas_gather at model-realistic shapes:
lowering, exactness vs the XLA fallback, and fwd/bwd timing vs jnp.take.

Run: python tools/microbench_gather_prod.py
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

    from toda_tpu.ops import pallas_gather as pg

    # stage-1 shape at bs4: table (4*32768, 688) bf16, 9 monotone taps
    BT, P, W = 4, 32768, 768  # stage-1 W=(41+2)*16=688 padded to the lane multiple
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(BT, P, W).astype(np.float32), dtype=jnp.bfloat16)
    base = np.arange(P)
    idx = np.sort(np.clip(base + rng.randint(-2, 3, size=P) + 180, 0, P - 1))
    idx = np.where(rng.rand(P) < 0.15, -1, idx).astype(np.int32)
    idx_b = jnp.asarray(np.broadcast_to(idx, (BT, P)).copy())

    # exactness vs fallback
    got = jax.jit(pg.gather_rows)(table, idx_b)
    want = jax.jit(pg._xla_gather)(table.reshape(BT * P, W),
                                   jnp.asarray(np.concatenate(
                                       [np.where(idx >= 0, idx + b * P, -1) for b in range(BT)])))
    err = np.abs(np.asarray(got, np.float32).reshape(BT * P, W) - np.asarray(want, np.float32)).max()
    print(f"fwd exactness vs fallback: max err {err}", flush=True)
    assert err == 0.0, err

    gbar = jnp.asarray(rng.randn(BT, P, W).astype(np.float32), dtype=jnp.bfloat16)
    s_got = jax.jit(partial(pg.scatter_rows_add, n=P))(gbar, idx_b)
    s_want = jax.jit(partial(pg._xla_scatter_add, n=BT * P))(
        gbar.reshape(BT * P, W),
        jnp.asarray(np.concatenate([np.where(idx >= 0, idx + b * P, -1) for b in range(BT)])),
    ).reshape(BT, P, W)
    serr = np.abs(np.asarray(s_got, np.float32) - np.asarray(s_want, np.float32)).max()
    print(f"bwd(scatter) exactness vs fallback: max err {serr}", flush=True)
    assert serr < 0.3, serr  # bf16 fallback accumulates in bf16; kernel in f32

    def mk_bench(gfn):
        @partial(jax.jit, static_argnames=("iters",))
        def bench(table, idx_b, iters):
            def body(c, _):
                g = gfn(table, jnp.where(idx_b >= 0, idx_b + c, -1))
                return ((g[:, :, :64].astype(jnp.float32)
                         * g[::-1, ::-1, :64].astype(jnp.float32)).sum() > 1e19
                        ).astype(jnp.int32), None

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return c

        return bench

    def take_ref(table, idx_b):
        safe = jnp.where(idx_b >= 0, idx_b, P)
        padded = jnp.concatenate([table, jnp.zeros((BT, 1, W), table.dtype)], axis=1)
        return jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(padded, safe)

    nbytes = BT * P * W * 2

    def timeit(name, fn, iters=30):
        jax.block_until_ready(fn(table, idx_b, iters=iters))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(table, idx_b, iters=iters))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.3f} ms  {nbytes/dt/1e9:.1f} GB/s payload", flush=True)
        return dt

    t_new = timeit("fwd gather_rows ", mk_bench(pg.gather_rows))
    t_old = timeit("fwd take        ", mk_bench(take_ref))
    print(f"fwd speedup: {t_old/t_new:.2f}x", flush=True)

    # fwd+bwd through a scalar loss
    def mk_grad_bench(gfn):
        def loss(table, idx_b):
            g = gfn(table, idx_b)
            return (g.astype(jnp.float32) * g[::-1, ::-1].astype(jnp.float32)).sum()

        vg = jax.grad(loss)

        @partial(jax.jit, static_argnames=("iters",))
        def bench(table, idx_b, iters):
            def body(t, _):
                gr = vg(t, idx_b)
                return t + 1e-9 * gr, None

            t, _ = jax.lax.scan(body, table, None, length=iters)
            return t

        return bench

    t_new = timeit("fwd+bwd gather_rows ", mk_grad_bench(pg.gather_rows), iters=20)
    t_old = timeit("fwd+bwd take        ", mk_grad_bench(take_ref), iters=20)
    print(f"fwd+bwd speedup: {t_old/t_new:.2f}x", flush=True)


if __name__ == "__main__":
    main()

"""Sweep BLOCK/SPAN for the span-gather kernel on hardware (fwd only).

Run: python tools/microbench_gather_sweep.py
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

    BT, P, W = 4, 32768, 768
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(BT, P, W).astype(np.float32), dtype=jnp.bfloat16)
    base = np.arange(P)
    idx = np.sort(np.clip(base + rng.randint(-2, 3, size=P) + 180, 0, P - 1))
    idx = np.where(rng.rand(P) < 0.15, -1, idx).astype(np.int32)
    idx_b = jnp.asarray(np.broadcast_to(idx, (BT, P)).copy())
    nbytes = BT * P * W * 2

    ref = None
    for blk, span in [(128, 512), (256, 512), (256, 1024), (512, 1024), (1024, 2048), (512, 2048)]:
        pg.BLOCK, pg.SPAN = blk, span

        @partial(jax.jit, static_argnames=("iters",))
        def bench(table, idx_b, iters):
            def body(c, _):
                g = pg.gather_rows(table, jnp.where(idx_b >= 0, idx_b + c, -1))
                return ((g[:, :, :64].astype(jnp.float32)
                         * g[::-1, ::-1, :64].astype(jnp.float32)).sum() > 1e19
                        ).astype(jnp.int32), None

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return c

        try:
            out = np.asarray(jax.jit(pg.gather_rows)(table, idx_b), np.float32)
            if ref is None:
                ref = out
            else:
                assert np.array_equal(out, ref), f"mismatch at {blk}/{span}"
            jax.block_until_ready(bench(table, idx_b, iters=30))
            t0 = time.perf_counter()
            jax.block_until_ready(bench(table, idx_b, iters=30))
            dt = (time.perf_counter() - t0) / 30
            print(f"B={blk:5d} S={span:5d}: {dt*1e3:7.3f} ms  {nbytes/dt/1e9:6.1f} GB/s payload",
                  flush=True)
        except Exception as e:  # noqa
            print(f"B={blk:5d} S={span:5d}: FAIL {str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()

"""Isolate span-gather kernel costs on hardware:

  dma:    double-buffered dynamic-offset window DMA only (no compute)
  dot:    one-hot matmul only (window comes in via blocked pipeline)
  both:   the full kernel (reference point)

Run: python tools/microbench_kernel_parts.py
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, W = 131072, 768
    DTYPE = jnp.bfloat16
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(M, W).astype(np.float32), dtype=DTYPE)

    def timeit(name, fn, *args, bytes_moved=None):
        # every iteration gets a distinct salt (flows into the kernel inputs),
        # and the per-iter cost is the n=40 minus n=10 slope — fixed overhead
        # and any whole-call result caching cancel out
        @partial(jax.jit, static_argnames=("n",))
        def loop(args, salt0, n):
            def body(carry, _):
                c, acc = carry
                out = fn(*args, salt=c)
                return (c + 1, acc + out[::257, :1].astype(jnp.float32).sum()), None

            (_, acc), _ = jax.lax.scan(body, (salt0, jnp.float32(0)), None, length=n)
            return acc

        jax.block_until_ready(loop(args, jnp.int32(0), n=10))
        jax.block_until_ready(loop(args, jnp.int32(0), n=40))
        t0 = time.perf_counter()
        jax.block_until_ready(loop(args, jnp.int32(1), n=10))
        t10 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(args, jnp.int32(2), n=40))
        t40 = time.perf_counter() - t0
        dt = (t40 - t10) / 30
        extra = f"  {bytes_moved/dt/1e9:.1f} GB/s" if bytes_moved else ""
        print(f"{name}: {dt*1e3:.3f} ms{extra}  (t10={t10*1e3:.1f} t40={t40*1e3:.1f})",
              flush=True)

    for B, S in [(256, 512), (512, 1024)]:
        NBLK = M // B
        lo_np = (np.minimum(np.arange(NBLK) * B, M - S) // 8 * 8).astype(np.int32)
        lo = jnp.asarray(lo_np)
        li = jnp.asarray(
            np.clip(np.arange(M) % B + 7, 0, S - 1).astype(np.int32).reshape(M, 1)
        )

        # ---- (a) DMA only: copy first B rows of each window to the out block
        def dma_kernel(lo_ref, src, out_ref, win, sem):
            i = pl.program_id(0)
            n = pl.num_programs(0)

            def start(blk, slot):
                off = pl.multiple_of(lo_ref[blk], 8)
                pltpu.make_async_copy(src.at[pl.ds(off, S)], win.at[slot], sem.at[slot]).start()

            @pl.when(i == 0)
            def _():
                start(0, 0)

            @pl.when(i + 1 < n)
            def _():
                start(i + 1, (i + 1) % 2)

            slot = i % 2
            pltpu.make_async_copy(
                src.at[pl.ds(pl.multiple_of(lo_ref[i], 8), S)], win.at[slot], sem.at[slot]
            ).wait()

            @pl.when(slot == 0)
            def _():
                out_ref[:] = win[0, :B]

            @pl.when(slot == 1)
            def _():
                out_ref[:] = win[1, :B]

        def dma_only(lo, table, salt=0):
            lo = jnp.maximum(lo - 8 * salt, 0)
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(NBLK,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((B, W), lambda i, lo: (i, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((2, S, W), DTYPE), pltpu.SemaphoreType.DMA((2,))],
            )
            return pl.pallas_call(dma_kernel, grid_spec=gs,
                                  out_shape=jax.ShapeDtypeStruct((M, W), DTYPE))(lo, table)

        timeit(f"B={B} S={S} dma ", dma_only, lo, table,
               bytes_moved=NBLK * S * W * 2)

        # ---- (b) matmul only: window arrives via the blocked pipeline
        def dot_kernel(li_ref, win_ref, out_ref):
            li = li_ref[:]
            onehot = (li == jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)).astype(DTYPE)
            out_ref[:] = jnp.dot(onehot, win_ref[:], preferred_element_type=jnp.float32
                                 ).astype(out_ref.dtype)

        def dot_only(li, table, salt=0):
            li = jnp.maximum(li - salt, 0)
            # window = a moving blocked slice (aligned to B) — same bytes as dma
            return pl.pallas_call(
                dot_kernel, grid=(NBLK,),
                in_specs=[
                    pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((S, W), lambda i: (i * B // S, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, W), DTYPE),
            )(li, table)

        timeit(f"B={B} S={S} dot ", dot_only, li, table,
               bytes_moved=M * W * 2)

        # ---- (c) onehot build only (no matmul): sum the onehot into lanes
        def oh_kernel(li_ref, out_ref):
            li = li_ref[:]
            onehot = (li == jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)).astype(DTYPE)
            out_ref[:] = jnp.sum(onehot, axis=1, keepdims=True) + jnp.zeros(
                (B, 128), DTYPE
            )

        def oh_only(li, salt=0):
            li = jnp.maximum(li - salt, 0)
            return pl.pallas_call(
                oh_kernel, grid=(NBLK,),
                in_specs=[pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((B, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, 128), DTYPE),
            )(li)

        timeit(f"B={B} S={S} onehot", oh_only, li)


if __name__ == "__main__":
    main()

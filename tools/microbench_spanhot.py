"""Prototype of the production span-gather kernel: per-block window DMA +
one-hot MXU local gather. Measures GB/s vs the jnp.take baseline and checks
correctness bit-exactly.

Design constraints from the pallas ladder (tools/microbench_pallas_ladder*.py):
blocked VMEM + MXU dots + 8-aligned dynamic DMA offsets lower fine; per-row
DMA, in-kernel take and dynamic VMEM row reads do not.

Run: python tools/microbench_spanhot.py
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

    P = 32768
    W = 768
    B = 128   # output rows per block
    S = 512   # window rows per block (span capacity)
    NBLK = P // B

    for DTYPE in (jnp.bfloat16, jnp.float32):
        rng = np.random.RandomState(0)
        flat = jnp.asarray(rng.randn(P + 1, W).astype(np.float32), dtype=DTYPE)
        base = np.arange(P)
        idx = np.sort(np.clip(base + rng.randint(-2, 3, size=P) + 180, 0, P - 1)).astype(np.int32)
        miss = rng.rand(P) < 0.2
        idx_signed = np.where(miss, -1, idx).astype(np.int32)  # -1 = missing

        idx_j = jnp.asarray(idx_signed)

        def prologue(idx):
            blk = idx.reshape(NBLK, B)
            valid = blk >= 0
            big = jnp.where(valid, blk, np.iinfo(np.int32).max)
            lo = jnp.min(big, axis=1)
            lo = jnp.where(lo == np.iinfo(np.int32).max, 0, lo)
            lo = (lo // 8) * 8
            # keep the clamp 8-aligned too — the kernel promises multiple_of(8)
            lo = jnp.minimum(lo, ((P + 1 - S) // 8) * 8).astype(jnp.int32)
            li = jnp.where(valid, blk - lo[:, None], S)  # S = out-of-range -> zero row
            overflow = jnp.any(li > S)  # li == S only for invalid; > S is a real overflow
            li = jnp.minimum(li, S).astype(jnp.int32)
            # (P, 1) column layout: (B, 1) blocks satisfy the (8, 128)-or-full rule
            return lo, li.reshape(P, 1), overflow

        def kernel(lo_ref, li_ref, src, out_ref, win, sem):
            i = pl.program_id(0)
            off = pl.multiple_of(lo_ref[i], 8)
            cp = pltpu.make_async_copy(src.at[pl.ds(off, S)], win, sem)
            cp.start()
            cp.wait()
            li = li_ref[:]  # (B, 1) this block's local indices (blocked in by grid)
            onehot = (
                li == jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
            ).astype(win.dtype)
            # bf16 x one-hot accumulated in f32 is exact. (f32 operands get the
            # MXU's default bf16 truncation — the production path is bf16-only,
            # f32 keeps the XLA take fallback.)
            out_ref[:] = jnp.dot(
                onehot, win[:], preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)

        def span_gather(flat, lo, li):
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NBLK,),
                in_specs=[
                    pl.BlockSpec((B, 1), lambda i, lo: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((B, W), lambda i, lo: (i, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((S, W), flat.dtype),
                    pltpu.SemaphoreType.DMA,
                ],
            )
            return pl.pallas_call(
                kernel, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((P, W), flat.dtype),
            )(lo, li, flat)

        # correctness
        lo, li, overflow = jax.jit(prologue)(idx_j)
        assert not bool(overflow)
        g = jax.jit(span_gather)(flat, lo, li)
        refrows = np.asarray(flat, np.float32)[np.where(miss, P, idx)]
        refrows[miss] = 0.0
        got = np.asarray(g, np.float32)
        err = np.abs(got - refrows).max()
        print(f"{DTYPE.__name__}: max err {err}", flush=True)
        if DTYPE == jnp.bfloat16:
            assert err == 0.0, err  # one-hot bf16 selection must be exact
        else:
            assert err < 0.1, err  # f32 via MXU default precision: approximate

        @partial(jax.jit, static_argnames=("iters",))
        def bench(flat, idx, iters):
            def body(c, _):
                lo, li, _ = prologue(jnp.where(idx >= 0, idx + c, idx))
                g = span_gather(flat, lo, li)
                return ((g * g[::-1]).sum() > 1e19).astype(jnp.int32), None

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return c

        @partial(jax.jit, static_argnames=("iters",))
        def bench_take(flat, idx, iters):
            def body(c, _):
                g = jnp.take(flat, jnp.where(idx >= 0, idx + c, P), axis=0)
                return ((g * g[::-1]).sum() > 1e19).astype(jnp.int32), None

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return c

        nbytes = P * W * np.dtype(DTYPE).itemsize
        for name, fn in (("spanhot", bench), ("take", bench_take)):
            jax.block_until_ready(fn(flat, idx_j, iters=50))  # compile at the timed iters
            t0 = time.perf_counter()
            jax.block_until_ready(fn(flat, idx_j, iters=50))
            dt = (time.perf_counter() - t0) / 50
            print(
                f"{DTYPE.__name__} {name}: {dt*1e3:.3f} ms  {nbytes/dt/1e9:.1f} GB/s (payload)",
                flush=True,
            )


if __name__ == "__main__":
    main()

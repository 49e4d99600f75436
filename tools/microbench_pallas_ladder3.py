"""Pallas bisection round 3: aligned dynamic DMA + in-kernel take variants."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(np.random.randn(1024, 768).astype(np.float32))

    def run(name, fn, *args):
        try:
            out = jax.jit(fn)(*args)
            jax.block_until_ready(out)
            print(f"{name}: OK {np.asarray(out).ravel()[0]:.3f}", flush=True)
            return True
        except Exception as e:  # noqa
            print(f"{name}: FAIL {str(e).splitlines()[0][:150]}", flush=True)
            return False

    lo = jnp.asarray((np.arange(8) * 128).astype(np.int32))

    # 4c: dynamic DMA offset declared a multiple of 8
    def k4c(lo_ref, src, o_ref, scratch, sem):
        i = pl.program_id(0)
        off = pl.multiple_of(lo_ref[i], 8)
        cp = pltpu.make_async_copy(src.at[pl.ds(off, 128)], scratch, sem)
        cp.start(); cp.wait()
        o_ref[:] = scratch[:] * 2.0

    def f4c(lo, x):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(8,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((128, 768), lambda i, lo: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 768), x.dtype), pltpu.SemaphoreType.DMA],
        )
        return pl.pallas_call(k4c, grid_spec=gs,
                              out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(lo, x)

    run("4c_dyn_dma_aligned", f4c, lo, x)

    # 6d: same-size in-kernel take on a VMEM input (indices via replicated rows)
    S = 1024
    li_np = np.random.randint(0, S, (8, 8, S)).astype(np.int32)
    li_np[:] = li_np[:, :1, :]  # replicate across sublanes
    li = jnp.asarray(li_np)

    def k6d(li_ref, src_ref, o_ref):
        lv = li_ref[0, 0]  # (S,) static read of the replicated row
        o_ref[:] = jnp.take(src_ref[:], lv, axis=0)

    run("6d_take_samesize", lambda li, x: pl.pallas_call(
        k6d, grid=(8,),
        in_specs=[
            pl.BlockSpec((1, 8, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * S, 768), x.dtype))(li, x), li, x)

    # 6e: smaller-than-source take (256 from 1024)
    li2_np = np.random.randint(0, S, (8, 8, 256)).astype(np.int32)
    li2_np[:] = li2_np[:, :1, :]
    li2 = jnp.asarray(li2_np)

    def k6e(li_ref, src_ref, o_ref):
        lv = li_ref[0, 0]  # (256,)
        o_ref[:] = jnp.take(src_ref[:], lv, axis=0)

    run("6e_take_smaller", lambda li, x: pl.pallas_call(
        k6e, grid=(8,),
        in_specs=[
            pl.BlockSpec((1, 8, 256), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((256, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * 256, 768), x.dtype))(li, x), li2, x)

    # 9: dynamic-slice read from a VMEM ref (alternative local gather primitive)
    def k9(src_ref, o_ref):
        def body(r, c):
            row = jax.lax.dynamic_slice(src_ref[:], (c * 0 + r * 2, 0), (1, 768))
            o_ref[pl.ds(r, 1), :] = row
            return c
        jax.lax.fori_loop(0, 128, body, 0)

    run("9_dynslice_loop", lambda x: pl.pallas_call(
        k9, grid=(8,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 768), x.dtype))(x), x)


if __name__ == "__main__":
    main()

"""Pallas bisection round 2: scalar prefetch, dynamic DMA, per-row DMA and
one-hot dot variants — isolating the exact unsupported feature on this backend.
"""

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

    # 4b: scalar prefetch drives a dynamic-offset DMA
    def k4b(lo_ref, src, o_ref, scratch, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(src.at[pl.ds(lo_ref[i], 128)], scratch, sem)
        cp.start(); cp.wait()
        o_ref[:] = scratch[:] * 2.0

    def f4b(lo, x):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(8,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((128, 768), lambda i, lo: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 768), x.dtype), pltpu.SemaphoreType.DMA],
        )
        return pl.pallas_call(k4b, grid_spec=gs,
                              out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(lo, x)

    run("4b_prefetch_dyn_dma", f4b, lo, x)

    # 5b: per-row DMA, indices from prefetch scalars, rows into VMEM scratch
    tbl = jnp.asarray(np.random.randint(0, 1024, (8 * 128,)).astype(np.int32))

    def k5b(tbl_ref, src, o_ref, scratch, sem):
        i = pl.program_id(0)

        def issue(r, c):
            pltpu.make_async_copy(src.at[tbl_ref[i * 128 + r]], scratch.at[r], sem).start()
            return c
        jax.lax.fori_loop(0, 128, issue, 0)

        def drain(r, c):
            pltpu.make_async_copy(src.at[tbl_ref[i * 128 + r]], scratch.at[r], sem).wait()
            return c
        jax.lax.fori_loop(0, 128, drain, 0)
        o_ref[:] = scratch[:] * 1.0

    def f5b(tbl, x):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(8,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((128, 768), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 768), x.dtype), pltpu.SemaphoreType.DMA],
        )
        return pl.pallas_call(k5b, grid_spec=gs,
                              out_shape=jax.ShapeDtypeStruct((1024, 768), x.dtype))(tbl, x)

    run("5b_perrow_prefetch", f5b, tbl, x)

    # 5c: single-row DMA with STATIC index (isolates row-granular DMA itself)
    def k5c(src, o_ref, sem):
        def issue(r, c):
            pltpu.make_async_copy(src.at[r], o_ref.at[r], sem).start()
            return c
        jax.lax.fori_loop(0, 128, issue, 0)

        def drain(r, c):
            pltpu.make_async_copy(src.at[r], o_ref.at[r], sem).wait()
            return c
        jax.lax.fori_loop(0, 128, drain, 0)

    def f5c(x):
        return pl.pallas_call(
            k5c, grid=(8,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((128, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1024, 768), x.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA])(x)

    run("5c_perrow_static", f5c, x)

    # 6b: one-hot dot, indices from FIRST row only (static sublane read)
    li0 = jnp.asarray(np.random.randint(0, 1024, (8, 128)).astype(np.int32))

    def k6b(li_ref, src_ref, o_ref):
        lv = li_ref[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 1024), 1)
        onehot = (cols == lv[:, None]).astype(src_ref.dtype)
        o_ref[:] = jnp.dot(onehot, src_ref[:], preferred_element_type=jnp.float32)

    run("6b_onehot_static_row", lambda li, x: pl.pallas_call(
        k6b, grid=(8,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 768), jnp.float32))(li, x), li0, x)

    # 6c: one-hot from in-kernel iota only (no index input at all)
    def k6c(src_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, 1024), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 1024), 1)
        onehot = (cols == rows * 8).astype(src_ref.dtype)
        o_ref[:] = jnp.dot(onehot, src_ref[:], preferred_element_type=jnp.float32)

    run("6c_onehot_iota", lambda x: pl.pallas_call(
        k6c, grid=(8,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 768), jnp.float32))(x), x)

    # 8: plain matmul block kernel (MXU sanity)
    w = jnp.asarray(np.random.randn(768, 512).astype(np.float32))

    def k8(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

    run("8_matmul", lambda x, w: pl.pallas_call(
        k8, grid=(8,),
        in_specs=[pl.BlockSpec((128, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 512), jnp.float32))(x, w), x, w)


if __name__ == "__main__":
    main()

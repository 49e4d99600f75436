"""Bisect Pallas TPU support on this backend: trivial -> DMA -> dynamic DMA ->
SMEM -> one-hot MXU gather. Each rung compiles+runs separately so the first
failing feature is identified.
"""

import sys
import traceback
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
            msg = str(e).splitlines()[0][:160]
            print(f"{name}: FAIL {msg}", flush=True)
            return False

    # 1. trivial VMEM kernel
    def k1(i_ref, o_ref):
        o_ref[:] = i_ref[:] * 2.0

    run("1_trivial", lambda x: pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x), x)

    # 2. grid + blocked
    def k2(i_ref, o_ref):
        o_ref[:] = i_ref[:] + 1.0

    run("2_grid", lambda x: pl.pallas_call(
        k2, grid=(8,),
        in_specs=[pl.BlockSpec((128, 768), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x), x)

    # 3. manual DMA from ANY with static slice
    def k3(src, o_ref, scratch, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(src.at[pl.ds(i * 128, 128)], scratch, sem)
        cp.start(); cp.wait()
        o_ref[:] = scratch[:] * 2.0

    run("3_dma_static", lambda x: pl.pallas_call(
        k3, grid=(8,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((128, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((128, 768), x.dtype), pltpu.SemaphoreType.DMA])(x), x)

    # 4. DMA with data-dependent start offset (from SMEM input block)
    lo = jnp.asarray((np.arange(8) * 128).astype(np.int32).reshape(8, 1))

    def k4(lo_ref, src, o_ref, scratch, sem):
        cp = pltpu.make_async_copy(src.at[pl.ds(lo_ref[0], 128)], scratch, sem)
        cp.start(); cp.wait()
        o_ref[:] = scratch[:] * 2.0

    run("4_dma_dynamic_smemblock", lambda lo, x: pl.pallas_call(
        k4, grid=(8,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((128, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((128, 768), x.dtype), pltpu.SemaphoreType.DMA])(lo, x), lo, x)

    # 5. DMA of index block HBM->SMEM scratch, then per-row DMA
    tbl = jnp.asarray(np.random.randint(0, 1024, (8, 128)).astype(np.int32))

    def k5(tbl_hbm, src, o_ref, tsm, tsem, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(tbl_hbm.at[i], tsm, tsem)
        cp.start(); cp.wait()

        def issue(r, c):
            pltpu.make_async_copy(src.at[tsm[r]], o_ref.at[r], sem).start()
            return c
        jax.lax.fori_loop(0, 128, issue, 0)

        def drain(r, c):
            pltpu.make_async_copy(src.at[tsm[r]], o_ref.at[r], sem).wait()
            return c
        jax.lax.fori_loop(0, 128, drain, 0)

    run("5_perrow_dma", lambda t, x: pl.pallas_call(
        k5, grid=(8,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((128, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 768), x.dtype),
        scratch_shapes=[pltpu.SMEM((128,), jnp.int32),
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA])(t, x), tbl, x)

    # 6. one-hot MXU gather from a VMEM block
    li = jnp.asarray(np.random.randint(0, 1024, (8, 128)).astype(np.int32))

    def k6(li_ref, src_ref, o_ref):
        i = pl.program_id(0)
        lv = li_ref[i]  # (128,)
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 1024), 1)
        onehot = (cols == lv[:, None]).astype(src_ref.dtype)
        o_ref[:] = jnp.dot(onehot, src_ref[:], preferred_element_type=jnp.float32)

    run("6_onehot_dot", lambda li, x: pl.pallas_call(
        k6, grid=(8,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 768), jnp.float32))(li, x), li, x)

    # 7. combined: dynamic span DMA + onehot local gather
    def k7(lo_ref, li_ref, src, o_ref, span, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(src.at[pl.ds(lo_ref[0], 256)], span, sem)
        cp.start(); cp.wait()
        lv = li_ref[i]
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 1)
        onehot = (cols == lv[:, None]).astype(span.dtype)
        o_ref[:] = jnp.dot(onehot, span[:], preferred_element_type=jnp.float32)

    lo7 = jnp.asarray((np.arange(8) * 128).astype(np.int32).reshape(8, 1))
    li7 = jnp.asarray(np.random.randint(0, 256, (8, 128)).astype(np.int32))
    run("7_span_onehot", lambda lo, li, x: pl.pallas_call(
        k7, grid=(8,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((128, 768), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 768), jnp.float32),
        scratch_shapes=[pltpu.VMEM((256, 768), x.dtype), pltpu.SemaphoreType.DMA])(lo, li, x),
        lo7, li7, x)


if __name__ == "__main__":
    main()

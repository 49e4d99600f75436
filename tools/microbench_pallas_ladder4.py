"""Pallas bisection round 4: dynamic VMEM slicing + shifted-select gather.

 a) win[pl.ds(dynoff, B)] — dynamic-offset slice read of a VMEM scratch
 b) K-way shifted-window select gather (the candidate fast local gather)

Run: python tools/microbench_pallas_ladder4.py
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

    B, S, W = 128, 512, 768
    NBLK = 8
    M = NBLK * B
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M + S, W).astype(np.float32), jnp.bfloat16)

    def run(name, fn, *args, check=None):
        try:
            out = jax.jit(fn)(*args)
            jax.block_until_ready(out)
            o = np.asarray(out, np.float32)
            ok = "OK"
            if check is not None:
                err = np.abs(o - check).max()
                ok = f"OK err={err}"
            print(f"{name}: {ok}", flush=True)
        except Exception as e:  # noqa
            print(f"{name}: FAIL {str(e).splitlines()[0][:140]}", flush=True)

    # (a) dynamic-offset VMEM slice read: out block = win[ds(off, B)]
    offs = jnp.asarray((np.arange(NBLK) % 3 * 16).astype(np.int32))

    def ka(off_ref, src, out_ref, win, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(src.at[pl.ds(i * B, S)], win, sem)
        cp.start(); cp.wait()
        out_ref[:] = win[pl.ds(off_ref[i], B)]

    def fa(offs, x):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(NBLK,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((B, W), lambda i, o: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S, W), x.dtype), pltpu.SemaphoreType.DMA],
        )
        return pl.pallas_call(ka, grid_spec=gs,
                              out_shape=jax.ShapeDtypeStruct((M, W), x.dtype))(offs, x)

    chk = np.concatenate([
        np.asarray(x, np.float32)[i * B + (i % 3) * 16 : i * B + (i % 3) * 16 + B]
        for i in range(NBLK)
    ])
    run("a_dyn_vmem_slice", fa, offs, x, check=chk)

    # (a2) dynamic slice with NON-aligned offset (8-row granularity off)
    offs2 = jnp.asarray((np.arange(NBLK) % 5 * 3).astype(np.int32))  # not /8
    chk2 = np.concatenate([
        np.asarray(x, np.float32)[i * B + (i % 5) * 3 : i * B + (i % 5) * 3 + B]
        for i in range(NBLK)
    ])
    run("a2_dyn_vmem_slice_unaligned", fa, offs2, x, check=chk2)

    # (b) K-way shifted select: out[r] = win[r + d[slot[r]]] for K offsets
    K = 8
    d_np = np.array([0, 3, 5, 16, 21, 40, 77, 130], np.int32)
    slot_np = rng.randint(0, K, size=(M,)).astype(np.int32)

    def kb(d_ref, slot_ref, src, out_ref, win, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(src.at[pl.ds(i * B, S)], win, sem)
        cp.start(); cp.wait()
        slots = slot_ref[:]  # (B, 1)
        acc = jnp.zeros((B, W), jnp.float32)
        for k in range(K):
            sh = win[pl.ds(d_ref[k], B)]
            acc = acc + jnp.where(slots == k, sh.astype(jnp.float32), 0.0)
        out_ref[:] = acc.astype(out_ref.dtype)

    def fb(d, slots, x):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(NBLK,),
            in_specs=[
                pl.BlockSpec((B, 1), lambda i, d: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((B, W), lambda i, d: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S, W), x.dtype), pltpu.SemaphoreType.DMA],
        )
        return pl.pallas_call(kb, grid_spec=gs,
                              out_shape=jax.ShapeDtypeStruct((M, W), x.dtype))(
            d, slots.reshape(M, 1), x)

    xf = np.asarray(x, np.float32)
    chkb = np.concatenate([
        np.stack([xf[i * B + r + d_np[slot_np[i * B + r]]] for r in range(B)])
        for i in range(NBLK)
    ])
    run("b_kway_shift_select", fb, jnp.asarray(d_np), jnp.asarray(slot_np), x, check=chkb)


if __name__ == "__main__":
    main()

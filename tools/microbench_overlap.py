"""Isolate DMA vs compute in the fused-conv kernel's per-block loop.

Three kernels with the exact window-DMA structure of pallas_fused_conv's
forward (3 dy-group windows, NBUF-slot ring, lookahead-1):
  dma   — windows DMA'd, no dots (out = trivial function of one window col)
  comp  — no DMA, dots on resident (stale) windows
  both  — the real structure (DMA + dots)
If both ~= max(dma, comp): overlap works and the kernel is bound by the
larger. If both ~= dma + comp: serialization — fix the pipeline.

Run: python tools/microbench_overlap.py [M] [nz] [c]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    BLOCK, SPAN, NBUF = 256, 512, 2
    W = nz * c
    nblk = M // BLOCK
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(W, M).astype(np.float32), jnp.bfloat16)
    # per-block window offsets: slope-1 stream (like subm tables)
    meta = jnp.asarray(
        np.minimum(np.arange(nblk) * BLOCK // 128 * 128, M - SPAN),
        jnp.int32,
    )[:, None] * jnp.ones((1, 3), jnp.int32)
    oh = jnp.asarray(rng.rand(128, BLOCK) < 0.01, jnp.bfloat16)

    def make(mode):
        def kern(meta_ref, src_ref, oh_ref, out_ref, win, acc, sem):
            i = pl.program_id(0)
            nb = pl.num_programs(0)

            def start(blk, slot):
                for g in range(3):
                    off = pl.multiple_of(meta_ref[blk, g], 128)
                    pltpu.make_async_copy(
                        src_ref.at[:, pl.ds(off, SPAN)],
                        win.at[slot, g],
                        sem.at[slot, g],
                    ).start()

            if mode != "comp":
                @pl.when(i == 0)
                def _():
                    for b in range(min(NBUF - 1, nb)):
                        start(b, b)

                @pl.when(i + NBUF - 1 < nb)
                def _():
                    start(i + NBUF - 1, (i + NBUF - 1) % NBUF)

                slot = i % NBUF
                for g in range(3):
                    pltpu.make_async_copy(
                        src_ref.at[:, pl.ds(pl.multiple_of(meta_ref[i, g], 128), SPAN)],
                        win.at[slot, g],
                        sem.at[slot, g],
                    ).wait()
            else:
                slot = i % NBUF

            if mode != "dma":
                o = oh_ref[:]
                for t in range(8):
                    g = t // 3
                    for b in range(NBUF):
                        for sub in range(2):  # ~avg predicated subwindows
                            @pl.when(slot == b)
                            def _(b=b, g=g, sub=sub):
                                acc[:, :] += jnp.dot(
                                    win[b, g, :, sub * 128:(sub + 1) * 128], o,
                                    preferred_element_type=jnp.float32,
                                )
                out_ref[:, :] = acc[:, :].astype(out_ref.dtype)
            else:
                for b in range(NBUF):
                    @pl.when(slot == b)
                    def _(b=b):
                        out_ref[:, :] = win[b, 0, :, :BLOCK]

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((128, BLOCK), lambda i, mt: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((W, BLOCK), lambda i, mt: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NBUF, 3, W, SPAN), jnp.bfloat16),
                pltpu.VMEM((W, BLOCK), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF, 3)),
            ],
        )
        f = pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((W, M), jnp.bfloat16),
        )

        def run(meta, src, oh, n):
            # unrolled chain in ONE dispatch: y*0 add is not foldable (NaN
            # semantics) and forces serial execution; slope between two n
            # values cancels the ~28 ms tunnel dispatch latency. lax.scan
            # chaining measured impossibly fast on this tunnel — do not use.
            y = None
            s = src
            for _ in range(n):
                y = f(meta, s, oh)
                s = s + y[: s.shape[0]] * 0
            return y[:8, :128].astype(jnp.float32).sum()

        return jax.jit(run, static_argnums=3)

    for mode in ("dma", "comp", "both"):
        fn = make(mode)
        times = {}
        for n in (3, 9):
            r = fn(meta, src, oh, n)
            r.block_until_ready()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = fn(meta, src, oh, n)
                r.block_until_ready()
                ts.append(time.perf_counter() - t0)
            times[n] = min(ts)
        perturb = 3 * W * M * 2 / 800e9  # ~chained add pass, s
        print(f"  raw {mode}: n3={times[3]*1e3:.2f} ms n9={times[9]*1e3:.2f} ms")
        dt = (times[9] - times[3]) / 6 - perturb
        gb = 3 * W * SPAN * 2 * nblk / 1e9
        note = f"  ({gb/dt:.0f} GB/s window DMA)" if mode == "dma" else ""
        print(f"{mode:5s}: {dt*1e3:7.2f} ms/call  "
              f"({dt/nblk*1e6:5.1f} us/block){note}")


if __name__ == "__main__":
    main()

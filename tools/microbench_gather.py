"""Microbenchmark: gather strategies for the pillar-sparse conv hot path.

The pillar backbone's dominant cost is 9 wide-row gathers per conv
(rows of (nz+2)*C bf16 from a (P+1, W) table, indices monotone per tap).
This compares, on the real chip:

  A. jnp.take baseline, random indices (what pillar_conv3d does today)
  B. jnp.take, monotone neighbor-like indices (locality sensitivity)
  C. Pallas per-row DMA gather (one descriptor per row)
  D. Pallas span-DMA + in-kernel local take (exploits monotone indices:
     one big DMA for the block's index span, then a VMEM-local gather)
  E. D but the local gather as a one-hot MXU matmul (fallback if take
     doesn't lower)
  F. neighbor-index build: dense bev_map scatter+lookup vs searchsorted

All variants chain a REAL data dependency through the timing loop (the
gathered value feeds the next iteration's indices) — unfused `x*0` tricks
get constant-folded and report fake numbers on this backend.

Run: python tools/microbench_gather.py   (axon TPU preset)
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

RESULTS = {}


def timed(name, fn, *args, iters=20, bytes_moved=None):
    import jax

    try:
        out = fn(*args, iters=2)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(*args, iters=iters)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        gbps = (bytes_moved / dt / 1e9) if bytes_moved else None
        RESULTS[name] = {"ms": round(dt * 1e3, 3), "GBps": round(gbps, 1) if gbps else None}
        print(f"{name}: {dt*1e3:.3f} ms" + (f"  {gbps:.1f} GB/s" if gbps else ""), flush=True)
    except Exception as e:  # noqa
        RESULTS[name] = {"error": str(e)[:2000]}
        print(f"{name}: FAILED {str(e)[:2000]}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = 32768
    NZ, C = 42, 16
    W = 768  # (nz+2)*C=672 padded up to a lane multiple (128) for VMEM rows
    BP = 256
    S = 1024
    NBLK = P // BP
    # f32: a single (1, W) row is a whole sublane tile; bf16 packs 2 rows per
    # physical sublane, which per-row DMA destinations cannot express (backend
    # compile crash observed)
    DTYPE = jnp.float32

    rng = np.random.RandomState(0)
    flat_np = rng.randn(P + 1, W).astype(np.float32)
    flat = jnp.asarray(flat_np, dtype=DTYPE)
    base = np.arange(P)
    idx_nbr = np.sort(
        np.clip(base + rng.randint(-2, 3, size=P) + 180, 0, P - 1).astype(np.int32)
    )
    idx_rand = rng.randint(0, P, size=P).astype(np.int32)
    row_bytes = W * 4
    moved = P * row_bytes  # read side only

    # dependency helper: force FULL materialization of g. A plain sum() gets
    # rewritten by XLA as gather(row_sums(flat)) (measured fake 7 TB/s); pairing
    # each row with a DIFFERENT row before the reduce defeats row-decomposition.
    def dep(g):
        return ((g * g[::-1]).sum() > 1e19).astype(jnp.int32)

    # ---- A/B: XLA take ------------------------------------------------------
    @partial(jax.jit, static_argnames=("iters",))
    def bench_take(flat, idx, iters):
        def body(c, _):
            g = jnp.take(flat, idx + c, axis=0)
            return dep(g), None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return c

    timed("A_take_random", bench_take, flat, jnp.asarray(idx_rand), bytes_moved=moved)
    timed("B_take_monotone", bench_take, flat, jnp.asarray(idx_nbr), bytes_moved=moved)

    # ---- C: per-row DMA gather ----------------------------------------------
    # index table lives in HBM; each grid step DMAs its (BP,) slice into SMEM
    tbl_blk = jnp.asarray(idx_nbr.reshape(NBLK, BP))

    def rowdma_kernel(tbl_hbm, src_ref, out_ref, tbl_smem, tsem, sem):
        i = pl.program_id(0)
        tcp = pltpu.make_async_copy(tbl_hbm.at[i], tbl_smem, tsem)
        tcp.start()
        tcp.wait()

        def issue(r, carry):
            pltpu.make_async_copy(src_ref.at[tbl_smem[r]], out_ref.at[r], sem).start()
            return carry

        jax.lax.fori_loop(0, BP, issue, 0)

        def drain(r, carry):
            pltpu.make_async_copy(src_ref.at[tbl_smem[r]], out_ref.at[r], sem).wait()
            return carry

        jax.lax.fori_loop(0, BP, drain, 0)

    def rowdma(flat, tbl):
        return pl.pallas_call(
            rowdma_kernel,
            grid=(NBLK,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((BP, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, W), flat.dtype),
            scratch_shapes=[
                pltpu.SMEM((BP,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )(tbl, flat)

    @partial(jax.jit, static_argnames=("iters",))
    def bench_rowdma(flat, tbl, iters):
        def body(c, _):
            g = rowdma(flat, tbl + c)
            return dep(g), None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return c

    timed("C_perrow_dma", bench_rowdma, flat, tbl_blk, bytes_moved=moved)

    # ---- D: span DMA + local take -------------------------------------------
    lo = idx_nbr.reshape(NBLK, BP).min(axis=1)
    lo = np.minimum(lo, P + 1 - S).astype(np.int32)
    li = (idx_nbr.reshape(NBLK, BP) - lo[:, None]).astype(np.int32)
    assert li.max() < S, li.max()
    lo_j = jnp.asarray(lo)  # (NBLK,)
    li_j = jnp.asarray(li.reshape(NBLK, BP))

    def span_kernel(lo_hbm, li_ref, src_ref, out_ref, span, lo_smem, lsem, sem):
        i = pl.program_id(0)
        lcp = pltpu.make_async_copy(lo_hbm.at[pl.ds(i, 1)], lo_smem, lsem)
        lcp.start()
        lcp.wait()
        cp = pltpu.make_async_copy(src_ref.at[pl.ds(lo_smem[0], S)], span, sem)
        cp.start()
        cp.wait()
        i = pl.program_id(0)
        # Mosaic's vector gather wants indices matching the gathered dim size:
        # gather S-from-S with the first BP entries real, then slice
        li_pad = jnp.zeros((S,), jnp.int32).at[:BP].set(li_ref[i])
        out_ref[:] = jnp.take(span[:], li_pad, axis=0)[:BP]

    def spangather(flat, lo_j, li_j):
        return pl.pallas_call(
            span_kernel,
            grid=(NBLK,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # full (NBLK, BP) table
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((BP, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, W), flat.dtype),
            scratch_shapes=[
                pltpu.VMEM((S, W), flat.dtype),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )(lo_j, li_j, flat)

    @partial(jax.jit, static_argnames=("iters",))
    def bench_span(flat, lo_j, li_j, iters):
        def body(c, _):
            g = spangather(flat, lo_j + c, li_j)
            return dep(g), None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return c

    timed("D_span_take", bench_span, flat, lo_j, li_j, bytes_moved=moved)

    # ---- E: span DMA + one-hot MXU local gather ------------------------------
    def span_onehot_kernel(lo_hbm, li_ref, src_ref, out_ref, span, lo_smem, lsem, sem):
        i = pl.program_id(0)
        lcp = pltpu.make_async_copy(lo_hbm.at[pl.ds(i, 1)], lo_smem, lsem)
        lcp.start()
        lcp.wait()
        cp = pltpu.make_async_copy(src_ref.at[pl.ds(lo_smem[0], S)], span, sem)
        cp.start()
        cp.wait()
        li = li_ref[pl.program_id(0)]  # (BP,)
        cols = jax.lax.broadcasted_iota(jnp.int32, (BP, S), 1)
        onehot = (cols == li[:, None]).astype(span.dtype)
        out_ref[:] = jnp.dot(onehot, span[:], preferred_element_type=jnp.float32).astype(
            out_ref.dtype
        )

    def span_onehot(flat, lo_j, li_j):
        return pl.pallas_call(
            span_onehot_kernel,
            grid=(NBLK,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # full (NBLK, BP) table
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((BP, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, W), flat.dtype),
            scratch_shapes=[
                pltpu.VMEM((S, W), flat.dtype),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )(lo_j, li_j, flat)

    @partial(jax.jit, static_argnames=("iters",))
    def bench_span_onehot(flat, lo_j, li_j, iters):
        def body(c, _):
            g = span_onehot(flat, lo_j + c, li_j)
            return dep(g), None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return c

    timed("E_span_onehot", bench_span_onehot, flat, lo_j, li_j, bytes_moved=moved)

    # correctness spot-check for whichever pallas variants ran
    want = np.asarray(jnp.take(flat, jnp.asarray(idx_nbr), axis=0), dtype=np.float32)  # noqa
    key_of = {"C": "C_perrow_dma", "D": "D_span_take", "E": "E_span_onehot"}
    for nm, fn in (("C", rowdma), ("D", spangather), ("E", span_onehot)):
        if "error" in RESULTS.get(key_of[nm], {}):
            continue
        try:
            got = (
                np.asarray(fn(flat, tbl_blk), dtype=np.float32)
                if nm == "C"
                else np.asarray(fn(flat, lo_j, li_j), dtype=np.float32)
            )
            ok = bool(np.allclose(got, want, atol=2e-2))
            RESULTS[f"{nm}_correct"] = ok
            print(f"{nm} correct: {ok}", flush=True)
        except Exception as e:  # noqa
            RESULTS[f"{nm}_correct"] = str(e)[:200]
            print(f"{nm} correctness check failed: {str(e)[:200]}", flush=True)

    # ---- F: neighbor-index build --------------------------------------------
    NY = NX = 1024
    keys = np.unique(rng.randint(0, NY * NX, size=P)).astype(np.int32)
    keys = np.sort(keys)[: P]
    pad = P - len(keys)
    coords_np = np.stack([keys // NX, keys % NX], axis=-1).astype(np.int32)
    mask_np = np.ones(len(keys), dtype=bool)
    if pad:
        coords_np = np.concatenate([coords_np, -np.ones((pad, 2), np.int32)])
        mask_np = np.concatenate([mask_np, np.zeros(pad, bool)])
    coords = jnp.asarray(coords_np, dtype=jnp.int32)
    mask = jnp.asarray(mask_np)

    from toda_tpu.ops.pillar_sparse import bev_neighbor_idx, build_bev_map

    @partial(jax.jit, static_argnames=("iters",))
    def bench_bevmap(coords, mask, iters):
        def body(c, _):
            bm = build_bev_map(coords + c, mask, (NY, NX))
            nbr = bev_neighbor_idx(coords + c, mask, bm, (NY, NX), 1)
            return (nbr.sum() > 1 << 30).astype(jnp.int32), None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return c

    timed("F_bevmap_lookup", bench_bevmap, coords, mask)

    @partial(jax.jit, static_argnames=("iters",))
    def bench_searchsorted(coords, mask, iters):
        offs = jnp.asarray(
            [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)], dtype=jnp.int32
        )

        def body(c, _):
            co = coords + c
            key = jnp.where(mask, co[:, 0] * NX + co[:, 1], np.iinfo(np.int32).max)
            nb = co[:, None, :] + offs[None]
            ok = (
                (nb[..., 0] >= 0)
                & (nb[..., 0] < NY)
                & (nb[..., 1] >= 0)
                & (nb[..., 1] < NX)
                & mask[:, None]
            )
            nbkey = nb[..., 0] * NX + nb[..., 1]
            pos = jnp.searchsorted(key, nbkey.reshape(-1))
            posr = jnp.searchsorted(key, nbkey.reshape(-1), side="right")
            hit = (posr > pos).reshape(P, 9)  # avoids a tiny-row gather key[pos]
            pos = jnp.clip(pos.reshape(P, 9), 0, P - 1)
            nbr = jnp.where(ok & hit, pos, -1)
            return (nbr.sum() > 1 << 30).astype(jnp.int32), None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return c

    timed("F_searchsorted", bench_searchsorted, coords, mask)

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()

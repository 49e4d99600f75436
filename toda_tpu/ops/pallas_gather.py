"""Span-window row gather/scatter as Pallas TPU kernels.

Why: XLA's TPU gather/scatter of matrix rows is LATENCY-bound at ~60 ns/row
regardless of row width or index locality (measured: 32768 x 3 KB rows take
~1.9 ms = 53 GB/s; 64 B rows the same 1.9 ms = 1.1 GB/s). The pillar-sparse
conv (ops/pillar_sparse.py) needs 9 such gathers per layer — the dominant
step cost. But its per-tap neighbor indices are *monotone* (both pillar sets
are sorted by BEV key and a conv tap adds a constant key offset), so each
block of output rows reads from a small contiguous window of input rows.

Kernels (bf16 only — the backbone's compute dtype; f32 falls back to XLA):

  gather_rows(table, idx):  out[i] = table[idx[i]] if idx[i] >= 0 else 0
    Per output block of B rows: double-buffered DMA of the (S, W) input
    window covering the block's index span, then a one-hot (B, S) x (S, W)
    MXU matmul performs the local gather (in-kernel `take` does not lower
    on Mosaic; one-hot x bf16 accumulated in f32 is EXACT selection).

  scatter_rows_add(g, idx, n):  out[j] = sum_{i: idx[i]==j} g[i]
    The transpose (used as gather_rows' VJP). Per OUTPUT tile of B rows:
    DMA the window of contributing input rows (contiguous because idx is
    monotone over valid entries) plus the matching index window, one-hot
    (S, B) built from global indices, contracted against the (S, W) window.

Both paths compute a runtime `overflow` flag (window capacity exceeded, or
for scatter non-monotone indices) and lax.cond into the exact XLA fallback,
so correctness never depends on the span assumption. Replaces the reference's
spconv CUDA gather/scatter rulebook application
(pcdet/models/backbones_3d/spconv_backbone.py via spconv's indice_conv).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = np.iinfo(np.int32).max

# Output-block rows (B) and input-window rows (S) per grid step. S/B slack
# absorbs index-span jitter; spans beyond S trigger the XLA fallback.
BLOCK = 128
SPAN = 512

# In-flight window DMAs. Measured: the copy engine serializes transfers at
# ~220 GB/s effective for these shapes, so deeper pipelines don't help — two
# buffers suffice to overlap the compute.
NBUF = 2

# Window rows for the fused multi-tap kernel. Callers group taps by BEV row
# offset (dy): taps within a group differ only by +-1 column, so the group's
# union span stays ~ the block span (measured max ~170 at BLOCK=128 on the
# nuScenes-scale workload) — one window DMA serves 3 taps AND the one-hot
# matmuls stay small. A full 9-tap union would need ~1024 rows and the
# one-hot FLOPs would dominate (measured: ~1.9 TFLOP per stage-1 conv).
SPAN_TAPS = 256

# Tests flip this to exercise the kernels on CPU via the Pallas interpreter.
INTERPRET = False


def _on_tpu():
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _pallas_ok(dtype, n, m, w):
    if INTERPRET:
        return m % BLOCK == 0 and n >= SPAN
    return (
        _on_tpu()
        and dtype == jnp.bfloat16
        and m % BLOCK == 0
        and n >= SPAN
        and n % 8 == 0  # window clamp stays 8-aligned
        and w % 128 == 0  # HBM slices must be lane-aligned (callers pad W)
    )


# --------------------------------------------------------------------------
# forward: span gather
# --------------------------------------------------------------------------


def _xla_gather(table, idx):
    n = table.shape[0]
    safe = jnp.where(idx >= 0, idx, 0)
    g = jnp.take(table, safe, axis=0)
    return jnp.where((idx >= 0)[:, None], g, 0).astype(table.dtype)


def _gather_kernel(lo_ref, li_ref, src, out_ref, win, sem):
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    nbuf, s = win.shape[0], win.shape[1]

    def start(blk, slot):
        off = pl.multiple_of(lo_ref[blk], 8)
        pltpu.make_async_copy(src.at[pl.ds(off, s)], win.at[slot], sem.at[slot]).start()

    # prefetch distance nbuf-1: block i+nbuf-1 lands in slot (i-1) % nbuf,
    # which was consumed at step i-1 — safe without post-compute ordering
    @pl.when(i == 0)
    def _():
        for b in range(min(nbuf - 1, nblk)):
            start(b, b)

    @pl.when(i + nbuf - 1 < nblk)
    def _():
        start(i + nbuf - 1, (i + nbuf - 1) % nbuf)

    slot = i % nbuf
    pltpu.make_async_copy(
        src.at[pl.ds(pl.multiple_of(lo_ref[i], 8), s)], win.at[slot], sem.at[slot]
    ).wait()

    li = li_ref[:]  # (B, 1) local indices; S (=s) marks missing -> no match
    onehot = (li == jax.lax.broadcasted_iota(jnp.int32, (li.shape[0], s), 1)).astype(
        src.dtype
    )

    # dynamic leading-index reads fault on Mosaic; predicated dots pick the
    # buffer without materializing a window-sized copy
    for b in range(nbuf):
        @pl.when(slot == b)
        def _(b=b):
            out_ref[:] = jnp.dot(
                onehot, win[b], preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)


def _pallas_gather(table, lo, li, m):
    n, w = table.shape
    nblk = m // BLOCK
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BLOCK, 1), lambda i, lo: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BLOCK, w), lambda i, lo: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, SPAN, w), table.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((m, w), table.dtype),
        interpret=INTERPRET,
    )(lo, li, table)


def _gather_prologue(idx, n):
    m = idx.shape[0]
    nblk = m // BLOCK
    blk = idx.reshape(nblk, BLOCK)
    valid = blk >= 0
    lo = jnp.min(jnp.where(valid, blk, INT_MAX), axis=1)
    lo = jnp.where(lo == INT_MAX, 0, lo)
    lo = (lo // 8) * 8
    lo = jnp.minimum(lo, ((n - SPAN) // 8) * 8).astype(jnp.int32)
    vli = blk - lo[:, None]
    overflow = jnp.any(valid & (vli >= SPAN))  # valid index outside the window
    li = jnp.where(valid, jnp.clip(vli, 0, SPAN), SPAN)  # SPAN = missing sentinel
    li = li.astype(jnp.int32).reshape(m, 1)
    return lo, li, overflow


def _core_gather(table, idx):
    """table (N, W), idx (M,) int32 in [-1, N) -> (M, W); -1 rows are zero."""
    n, w = table.shape
    m = idx.shape[0]
    if not _pallas_ok(table.dtype, n, m, w):
        return _xla_gather(table, idx)
    lo, li, overflow = _gather_prologue(idx, n)
    return jax.lax.cond(
        overflow,
        lambda: _xla_gather(table, idx),
        lambda: _pallas_gather(table, lo, li, m),
    )


# --------------------------------------------------------------------------
# fused multi-tap gather: one window DMA serves T taps
# --------------------------------------------------------------------------
#
# A 3x3 BEV conv needs T=8-9 gathers whose per-tap index streams differ by a
# constant key offset (+-1 column, +-1 BEV row), so one slightly larger window
# covers all taps' spans for a block: the DMA cost (the measured bottleneck,
# ~220 GB/s effective) is paid ONCE instead of T times.


def _gather_taps_kernel(lo_ref, li_ref, src, *refs):
    outs, (win, sem) = refs[:-2], refs[-2:]
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    nbuf, s = win.shape[0], win.shape[1]

    def start(blk, slot):
        off = pl.multiple_of(lo_ref[blk], 8)
        pltpu.make_async_copy(src.at[pl.ds(off, s)], win.at[slot], sem.at[slot]).start()

    @pl.when(i == 0)
    def _():
        for b in range(min(nbuf - 1, nblk)):
            start(b, b)

    @pl.when(i + nbuf - 1 < nblk)
    def _():
        start(i + nbuf - 1, (i + nbuf - 1) % nbuf)

    slot = i % nbuf
    pltpu.make_async_copy(
        src.at[pl.ds(pl.multiple_of(lo_ref[i], 8), s)], win.at[slot], sem.at[slot]
    ).wait()

    li = li_ref[:]  # (B, T) local indices; s marks missing
    bsz = li.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (bsz, s), 1)
    for t, out_ref in enumerate(outs):
        onehot = (li[:, t : t + 1] == iota).astype(src.dtype)
        for b in range(nbuf):
            @pl.when(slot == b)
            def _(b=b, onehot=onehot, out_ref=out_ref):
                out_ref[:] = jnp.dot(
                    onehot, win[b], preferred_element_type=jnp.float32
                ).astype(out_ref.dtype)


def _pallas_gather_taps(table, lo, li, m, ntap):
    n, w = table.shape
    nblk = m // BLOCK
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BLOCK, ntap), lambda i, lo: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK, w), lambda i, lo: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(ntap)
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, SPAN_TAPS, w), table.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        _gather_taps_kernel,
        grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((m, w), table.dtype) for _ in range(ntap)],
        interpret=INTERPRET,
    )(lo, li, table)


def _taps_prologue(idx, n):
    m, ntap = idx.shape
    nblk = m // BLOCK
    blk = idx.reshape(nblk, BLOCK * ntap)
    valid = blk >= 0
    lo = jnp.min(jnp.where(valid, blk, INT_MAX), axis=1)
    lo = jnp.where(lo == INT_MAX, 0, lo)
    lo = (lo // 8) * 8
    lo = jnp.minimum(lo, ((n - SPAN_TAPS) // 8) * 8).astype(jnp.int32)
    vli = blk - lo[:, None]
    overflow = jnp.any(valid & (vli >= SPAN_TAPS))
    li = jnp.where(valid, jnp.clip(vli, 0, SPAN_TAPS), SPAN_TAPS)
    return lo, li.astype(jnp.int32).reshape(m, ntap), overflow


def _core_gather_taps(table, idx):
    """table (N, W); idx (M, T) int32 in [-1, N) -> list of T (M, W) arrays.

    NOT differentiable (no VJP registered) — consumed inside pillar_conv3d's
    custom_vjp, whose backward is itself a fused gather (see pillar_sparse)."""
    n, w = table.shape
    m, ntap = idx.shape

    def fallback():
        return tuple(_xla_gather(table, idx[:, t]) for t in range(ntap))

    if not _pallas_ok(table.dtype, n, m, w) or n < SPAN_TAPS:
        return fallback()
    lo, li, overflow = _taps_prologue(idx, n)
    return jax.lax.cond(
        overflow,
        fallback,
        lambda: tuple(_pallas_gather_taps(table, lo, li, m, ntap)),
    )


def gather_rows_taps(table, idx):
    """Fused multi-tap row gather (see _core_gather_taps).

    Args:
        table: (N, W) or (Bt, N, W)
        idx:   (M, T) or (Bt, M, T); -1 => zero row.
    Returns list of T arrays (M, W) / (Bt, M, W)."""
    if table.ndim == 2:
        return _core_gather_taps(table, idx)
    bt, n, w = table.shape
    m, ntap = idx.shape[1], idx.shape[2]
    offs = (jnp.arange(bt, dtype=jnp.int32) * n)[:, None, None]
    idx2 = jnp.where(idx >= 0, idx + offs, -1).reshape(bt * m, ntap)
    outs = _core_gather_taps(table.reshape(bt * n, w), idx2)
    return [o.reshape(bt, m, w) for o in outs]


# --------------------------------------------------------------------------
# transposed-layout fused multi-tap gather: table is (W, N), rows minor
# --------------------------------------------------------------------------
#
# XLA lays out the z-conv with the pillar dim MINOR (each lane = one pillar;
# C is tiny), so a (N, W) gather forces a full layout conversion on both
# sides of every conv — measured ~150 ms/step. This variant keeps pillars in
# lanes end to end: the window is a 128-aligned LANE slice of the (W, N)
# table, and the local gather is win (W, S) @ onehot (S, B) on the MXU.

SPAN_T = 512  # lane-window size; offsets must be 128-aligned (lane tiling)
# separate block size for the transposed kernel: the one-hot matmul FLOPs
# scale with SPAN_T/BLOCK_T, and the union span grows only additively with
# the block size, so bigger blocks cut compute
BLOCK_T = 256


def _xla_gather_t(tableT, idx):
    safe = jnp.where(idx >= 0, idx, 0)
    g = jnp.take(tableT, safe, axis=1)
    return jnp.where((idx >= 0)[None, :], g, 0).astype(tableT.dtype)


def _pallas_ok_t(dtype, n, m, w):
    if INTERPRET:
        return m % BLOCK_T == 0 and n >= SPAN_T
    return (
        _on_tpu()
        and dtype == jnp.bfloat16
        and m % BLOCK_T == 0
        and n >= SPAN_T
        and n % 128 == 0  # lane-dim windows need 128-aligned clamping
        and w % 8 == 0
    )


def _gather_taps_t_kernel(meta_ref, li_ref, src, *refs):
    """meta_ref (nblk, 1 + 2T): [0] window lo, [1+t] / [1+T+t] first/last
    128-lane subwindow containing tap t's indices — each output column is
    selected by exactly ONE subwindow (one-hot), so subwindows outside the
    range contribute only zeros and their dots are skipped (predication).
    The first in-range subwindow STORES (covers the no-valid case with an
    all-zero dot), later in-range ones ADD — exact, no zero-init needed."""
    outs, (win, sem) = refs[:-2], refs[-2:]
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    nbuf, _, s = win.shape
    ntap = len(outs)
    nsub = s // 128

    def start(blk, slot):
        off = pl.multiple_of(meta_ref[blk, 0], 128)
        pltpu.make_async_copy(
            src.at[:, pl.ds(off, s)], win.at[slot], sem.at[slot]
        ).start()

    @pl.when(i == 0)
    def _():
        for b in range(min(nbuf - 1, nblk)):
            start(b, b)

    @pl.when(i + nbuf - 1 < nblk)
    def _():
        start(i + nbuf - 1, (i + nbuf - 1) % nbuf)

    slot = i % nbuf
    pltpu.make_async_copy(
        src.at[:, pl.ds(pl.multiple_of(meta_ref[i, 0], 128), s)],
        win.at[slot], sem.at[slot],
    ).wait()

    li = li_ref[0]  # (T, 8, B) sublane-replicated local indices
    bsz = li.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (s, bsz), 0)
    for t, out_ref in enumerate(outs):
        smin = meta_ref[i, 1 + t]
        smax = meta_ref[i, 1 + ntap + t]
        onehot = (iota == li[t, 0:1]).astype(src.dtype)  # (S, B)
        for b in range(nbuf):
            for sub in range(nsub):
                oh = onehot[sub * 128 : (sub + 1) * 128]

                @pl.when((slot == b) & (smin == sub))
                def _(b=b, sub=sub, oh=oh, out_ref=out_ref):
                    out_ref[:] = jnp.dot(
                        win[b, :, sub * 128 : (sub + 1) * 128], oh,
                        preferred_element_type=jnp.float32,
                    ).astype(out_ref.dtype)

                @pl.when((slot == b) & (smin < sub) & (sub <= smax))
                def _(b=b, sub=sub, oh=oh, out_ref=out_ref):
                    out_ref[:] += jnp.dot(
                        win[b, :, sub * 128 : (sub + 1) * 128], oh,
                        preferred_element_type=jnp.float32,
                    ).astype(out_ref.dtype)


def _sub_ranges(vli, gv, span):
    """Per-(block, tap) first/last 128-lane subwindow containing valid local
    indices. vli (nblk, B, T) local indices, gv same-shape validity. Empty
    taps map to (0, 0): the sub-0 STORE writes the all-zero dot."""
    sub = jnp.clip(vli, 0, span - 1) // 128
    smin = jnp.min(jnp.where(gv, sub, span), axis=1)  # (nblk, T)
    none = smin >= span // 128
    smin = jnp.where(none, 0, smin)
    smax = jnp.where(none, 0, jnp.max(jnp.where(gv, sub, -1), axis=1))
    return smin.astype(jnp.int32), smax.astype(jnp.int32)


def _pallas_gather_taps_t(tableT, meta, li4, m, ntap, span):
    w, n = tableT.shape
    nblk = m // BLOCK_T
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(
                (1, ntap, 8, BLOCK_T), lambda i, lo: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((w, BLOCK_T), lambda i, lo: (0, i), memory_space=pltpu.VMEM)
            for _ in range(ntap)
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, w, span), tableT.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        _gather_taps_t_kernel,
        grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((w, m), tableT.dtype) for _ in range(ntap)],
        interpret=INTERPRET,
    )(meta, li4, tableT)


def _taps_t_prologue(idx, n, span):
    m, ntap = idx.shape
    nblk = m // BLOCK_T
    blk = idx.reshape(nblk, BLOCK_T * ntap)
    valid = blk >= 0
    lo = jnp.min(jnp.where(valid, blk, INT_MAX), axis=1)
    lo = jnp.where(lo == INT_MAX, 0, lo)
    lo = (lo // 128) * 128
    lo = jnp.minimum(lo, ((n - span) // 128) * 128).astype(jnp.int32)
    vli = blk - lo[:, None]
    overflow = jnp.any(valid & (vli >= span))
    li = jnp.where(valid, jnp.clip(vli, 0, span), span).astype(jnp.int32)
    li4 = li.reshape(nblk, BLOCK_T, ntap).transpose(0, 2, 1)  # (nblk, T, B)
    li4 = jnp.broadcast_to(li4[:, :, None, :], (nblk, ntap, 8, BLOCK_T))
    smin, smax = _sub_ranges(
        vli.reshape(nblk, BLOCK_T, ntap),
        valid.reshape(nblk, BLOCK_T, ntap),
        span,
    )
    meta = jnp.concatenate([lo[:, None], smin, smax], axis=1)  # (nblk, 1+2T)
    return meta, li4, overflow


def gather_rows_taps_t(tableT, idx, span=None):
    """Transposed fused multi-tap gather: tableT (W, N); idx (M, T), -1 =>
    zero column. Returns list of T arrays (W, M). Indices must already be
    batch-folded (the caller offsets per-sample indices into the folded
    column space). `span` widens the window for strided (slope > 1) index
    streams. NOT differentiable — used inside pillar_conv3d_t's custom
    VJP."""
    w, n = tableT.shape
    m, ntap = idx.shape
    span = span or SPAN_T

    def fallback():
        return tuple(_xla_gather_t(tableT, idx[:, t]) for t in range(ntap))

    if not _pallas_ok_t(tableT.dtype, n, m, w) or n < span:
        return fallback()
    meta, li4, overflow = _taps_t_prologue(idx, n, span)
    return jax.lax.cond(
        overflow,
        fallback,
        lambda: tuple(_pallas_gather_taps_t(tableT, meta, li4, m, ntap, span)),
    )


# --------------------------------------------------------------------------
# 9-tap stacked transposed gather: 3 dy-group windows, ONE [t][z][c] output
# --------------------------------------------------------------------------
#
# Feeds the whole 3x3x3 conv in one kernel call: per block, three tight
# dy-group windows are DMA'd (one per BEV row offset) and all nine one-hot
# dots write contiguous per-tap row ranges of a single stacked output.
# The consumer then runs ONE conv with (taps, z) as two spatial dims instead
# of nine small convs + an 8-way add chain.


def _gather9_stacked_kernel(chunk, identity, meta_ref, li_ref, src, *refs):
    """meta_ref (nblk, 21): [0:3] per-dy-group window lo, [3+t]/[12+t] the
    first/last 128-lane subwindow containing tap t's indices. One-hot
    selection means each output column comes from exactly one subwindow, so
    out-of-range sub-dots are skipped (predication): the first in-range one
    STORES (covers the empty-tap case with an all-zero dot), later ones ADD."""
    if identity is None:
        if chunk is None:
            out_ref, win, sem = refs
        else:
            out_ref, win, acc, sem = refs
        xblk = None
    else:
        if chunk is None:
            xblk, out_ref, win, sem = refs
        else:
            xblk, out_ref, win, acc, sem = refs
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    nbuf, _, w, s = win.shape
    nsub = s // 128

    def start(blk, slot):
        for g in range(3):
            off = pl.multiple_of(meta_ref[blk, g], 128)
            pltpu.make_async_copy(
                src.at[:, pl.ds(off, s)], win.at[slot, g], sem.at[slot, g]
            ).start()

    @pl.when(i == 0)
    def _():
        for b in range(min(nbuf - 1, nblk)):
            start(b, b)

    @pl.when(i + nbuf - 1 < nblk)
    def _():
        start(i + nbuf - 1, (i + nbuf - 1) % nbuf)

    slot = i % nbuf
    for g in range(3):
        pltpu.make_async_copy(
            src.at[:, pl.ds(pl.multiple_of(meta_ref[i, g], 128), s)],
            win.at[slot, g],
            sem.at[slot, g],
        ).wait()

    li = li_ref[0]  # (9, 8, B)
    bsz = li.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (s, bsz), 0)

    def emit(t, res):
        if chunk is None:  # [t][rows] contiguous per tap
            out_ref[t * w : (t + 1) * w, :] = res
        else:  # interleave chunks: row j*9*chunk + t*chunk
            for j in range(w // chunk):
                dst = j * 9 * chunk + t * chunk
                out_ref[dst : dst + chunk, :] = res[j * chunk : (j + 1) * chunk, :]

    for t in range(9):
        if t == identity:
            # identity tap: the block's own columns, fetched by the pipeline —
            # no one-hot dot needed
            emit(t, xblk[:])
            continue
        g = t // 3
        smin = meta_ref[i, 3 + t]
        smax = meta_ref[i, 12 + t]
        onehot = (iota == li[t, 0:1]).astype(src.dtype)
        for b in range(nbuf):
            for sub in range(nsub):
                oh = onehot[sub * 128 : (sub + 1) * 128]

                def dot_sub(b=b, g=g, sub=sub, oh=oh):
                    return jnp.dot(
                        win[b, g, :, sub * 128 : (sub + 1) * 128], oh,
                        preferred_element_type=jnp.float32,
                    ).astype(out_ref.dtype)

                if chunk is None:  # contiguous: store/add straight to out
                    @pl.when((slot == b) & (smin == sub))
                    def _(t=t, dot_sub=dot_sub):
                        out_ref[t * w : (t + 1) * w, :] = dot_sub()

                    @pl.when((slot == b) & (smin < sub) & (sub <= smax))
                    def _(t=t, dot_sub=dot_sub):
                        out_ref[t * w : (t + 1) * w, :] += dot_sub()
                else:  # interleaved: accumulate contiguously, emit once
                    @pl.when((slot == b) & (smin == sub))
                    def _(dot_sub=dot_sub):
                        acc[:, :] = dot_sub()

                    @pl.when((slot == b) & (smin < sub) & (sub <= smax))
                    def _(dot_sub=dot_sub):
                        acc[:, :] += dot_sub()
        if chunk is not None:
            emit(t, acc[:, :])


def _pallas_gather9_stacked(tableT, lo, li4, m, span, chunk=None, identity=None,
                            xsrc=None):
    w, n = tableT.shape
    nblk = m // BLOCK_T
    in_specs = [
        pl.BlockSpec(
            (1, 9, 8, BLOCK_T), lambda i, lo: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [lo, li4, tableT]
    if identity is not None:
        in_specs.append(
            pl.BlockSpec((w, BLOCK_T), lambda i, lo: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(xsrc)
    scratch = [pltpu.VMEM((NBUF, 3, w, span), tableT.dtype)]
    if chunk is not None:
        scratch.append(pltpu.VMEM((w, BLOCK_T), tableT.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((NBUF, 3)))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (9 * w, BLOCK_T), lambda i, lo: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(_gather9_stacked_kernel, chunk, identity),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((9 * w, m), tableT.dtype),
        interpret=INTERPRET,
    )(*args)


def _stacked_prologue(idx, n, span):
    m = idx.shape[0]
    nblk = m // BLOCK_T
    blk = idx.reshape(nblk, BLOCK_T, 9)
    valid = blk >= 0
    los = []
    overflow = jnp.zeros((), bool)
    lis, vlis = [], []
    for g in range(3):
        grp = blk[:, :, 3 * g : 3 * g + 3].reshape(nblk, -1)
        gv = valid[:, :, 3 * g : 3 * g + 3].reshape(nblk, -1)
        lo = jnp.min(jnp.where(gv, grp, INT_MAX), axis=1)
        lo = jnp.where(lo == INT_MAX, 0, lo)
        lo = (lo // 128) * 128
        lo = jnp.minimum(lo, ((n - span) // 128) * 128).astype(jnp.int32)
        vli = grp - lo[:, None]
        overflow = overflow | jnp.any(gv & (vli >= span))
        li = jnp.where(gv, jnp.clip(vli, 0, span), span).astype(jnp.int32)
        los.append(lo)
        lis.append(li.reshape(nblk, BLOCK_T, 3))
        vlis.append(vli.reshape(nblk, BLOCK_T, 3))
    lo3 = jnp.stack(los, axis=1)  # (nblk, 3)
    li9 = jnp.concatenate(lis, axis=2)  # (nblk, B, 9)
    li4 = jnp.broadcast_to(
        li9.transpose(0, 2, 1)[:, :, None, :], (nblk, 9, 8, BLOCK_T)
    )
    smin, smax = _sub_ranges(
        jnp.concatenate(vlis, axis=2), valid.reshape(nblk, BLOCK_T, 9), span
    )  # (nblk, 9) each
    meta = jnp.concatenate([lo3, smin, smax], axis=1)  # (nblk, 21)
    return meta, li4, overflow


def gather9_stacked_t(tableT, idx, span=None, chunk=None, identity_tap=None):
    """tableT (W, N); idx (M, 9) batch-folded -> ((9*W), M) stacked
    per-tap gathers (-1 => zero column). Row order: [t][rows-of-W] when
    chunk is None, else chunks of `chunk` rows interleaved as
    [j][t][chunk] (row j*9*chunk + t*chunk) — the layout a consumer conv
    with (taps, z) folded into channels wants. The fast path requires the
    per-dy-group union span to fit `span`; exact XLA fallback otherwise.
    NOT differentiable (used inside pillar_conv3d_t's custom VJP)."""
    w, n = tableT.shape
    m = idx.shape[0]
    span = span or SPAN_T

    def fallback():
        gs = [_xla_gather_t(tableT, idx[:, t]) for t in range(9)]
        if chunk is None:
            return jnp.concatenate(gs, axis=0)
        stk = jnp.stack(gs, axis=0).reshape(9, w // chunk, chunk, m)
        return stk.transpose(1, 0, 2, 3).reshape(9 * w, m)

    if not _pallas_ok_t(tableT.dtype, n, m, w) or n < span:
        return fallback()
    # the identity shortcut only applies when output rows == table columns
    identity = identity_tap if (identity_tap is not None and m == n) else None
    meta, li4, overflow = _stacked_prologue(idx, n, span)
    return jax.lax.cond(
        overflow,
        fallback,
        lambda: _pallas_gather9_stacked(
            tableT, meta, li4, m, span, chunk, identity, tableT
        ),
    )


# --------------------------------------------------------------------------
# fused 9-tap gather + 3x3x3 submanifold conv (z_stride 1)
# --------------------------------------------------------------------------
#
# The stacked kernel materializes a (9*(nz+2)*c, M) intermediate in HBM that
# the consumer conv immediately re-reads — ~6.4 GB of round-trip traffic per
# stage-1 conv at nuScenes scale. This kernel contracts each tap's gathered
# window against the conv weights IN VMEM instead: per tap, the one-hot
# sub-dots produce g_t (w, B) in scratch, three z-shifted (c, nz*B) views are
# assembled by value transposes, and one (3c, cout) x (3c, nz*B) dot
# accumulates the tap's contribution. Only the (nz*cout, B) conv output block
# is ever written to HBM.


def _gather9_conv_kernel(identity, nz, c, cout, meta_ref, li_ref, w_ref, src, *refs):
    if identity is None:
        out_ref, win, gbuf, acc, sem = refs
        xblk = None
    else:
        xblk, out_ref, win, gbuf, acc, sem = refs
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    nbuf, _, w, s = win.shape
    nsub = s // 128
    bsz = out_ref.shape[1]

    def start(blk, slot):
        for g in range(3):
            off = pl.multiple_of(meta_ref[blk, g], 128)
            pltpu.make_async_copy(
                src.at[:, pl.ds(off, s)], win.at[slot, g], sem.at[slot, g]
            ).start()

    @pl.when(i == 0)
    def _():
        for b in range(min(nbuf - 1, nblk)):
            start(b, b)

    @pl.when(i + nbuf - 1 < nblk)
    def _():
        start(i + nbuf - 1, (i + nbuf - 1) % nbuf)

    slot = i % nbuf
    for g in range(3):
        pltpu.make_async_copy(
            src.at[:, pl.ds(pl.multiple_of(meta_ref[i, g], 128), s)],
            win.at[slot, g],
            sem.at[slot, g],
        ).wait()

    li = li_ref[0]  # (9, 8, B)
    iota = jax.lax.broadcasted_iota(jnp.int32, (s, bsz), 0)

    for t in range(9):
        g = t // 3
        if t == identity:
            gv = xblk[:]
        else:
            smin = meta_ref[i, 3 + t]
            smax = meta_ref[i, 12 + t]
            onehot = (iota == li[t, 0:1]).astype(src.dtype)
            for b in range(nbuf):
                for sub in range(nsub):
                    oh = onehot[sub * 128 : (sub + 1) * 128]

                    @pl.when((slot == b) & (smin == sub))
                    def _(b=b, g=g, sub=sub, oh=oh):
                        gbuf[:, :] = jnp.dot(
                            win[b, g, :, sub * 128 : (sub + 1) * 128], oh,
                            preferred_element_type=jnp.float32,
                        ).astype(gbuf.dtype)

                    @pl.when((slot == b) & (smin < sub) & (sub <= smax))
                    def _(b=b, g=g, sub=sub, oh=oh):
                        gbuf[:, :] += jnp.dot(
                            win[b, g, :, sub * 128 : (sub + 1) * 128], oh,
                            preferred_element_type=jnp.float32,
                        ).astype(gbuf.dtype)
            gv = gbuf[:, :]
        # g3: three z-shifted (c, nz*B) views of the (nz+2)*c-row window
        g3 = jnp.concatenate(
            [
                gv[dz * c : dz * c + nz * c]
                .reshape(nz, c, bsz)
                .transpose(1, 0, 2)
                .reshape(c, nz * bsz)
                for dz in range(3)
            ],
            axis=0,
        )  # (3c, nz*B)
        contrib = jax.lax.dot_general(
            w_ref[t], g3,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cout, nz*B)
        if t == 0:
            acc[:, :] = contrib
        else:
            acc[:, :] += contrib
    out = acc[:, :].reshape(cout, nz, bsz).transpose(1, 0, 2)
    out_ref[:, :] = out.reshape(nz * cout, bsz).astype(out_ref.dtype)


def _pallas_gather9_conv(tableT, meta, li4, w9, m, span, nz, c, cout, identity):
    w, n = tableT.shape
    nblk = m // BLOCK_T
    in_specs = [
        pl.BlockSpec(
            (1, 9, 8, BLOCK_T), lambda i, lo: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((9, 3 * c, cout), lambda i, lo: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [meta, li4, w9, tableT]
    if identity is not None:
        in_specs.append(
            pl.BlockSpec((w, BLOCK_T), lambda i, lo: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(tableT)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (nz * cout, BLOCK_T), lambda i, lo: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF, 3, w, span), tableT.dtype),
            pltpu.VMEM((w, BLOCK_T), tableT.dtype),
            pltpu.VMEM((cout, nz * BLOCK_T), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 3)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather9_conv_kernel, identity, nz, c, cout),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nz * cout, m), tableT.dtype),
        interpret=INTERPRET,
    )(*args)


def gather9_conv_t(tableT, idx, weights, nz, span=None, identity_tap=None):
    """Fused 9-tap gather + 3x3x3 z-stride-1 conv in the transposed layout.

    Args:
        tableT: (W, N) haloed activations, W = (nz+2)*c, batch-folded pillars
            in lanes (z halo of c zero rows top and bottom).
        idx: (M, 9) batch-folded per-tap neighbor tables (-1 => missing).
        weights: (3, 3, 3, C, Cout) in (dz, dy, dx) order.
        nz: output z cells (== input, stride 1).
    Returns (nz*Cout, M) conv output (UNMASKED — caller applies the pillar
    mask). Falls back to the stacked-gather + XLA conv when the fast-path
    requirements fail. NOT differentiable (used inside pillar_conv3d_t's
    custom VJP)."""
    w, n = tableT.shape
    m = idx.shape[0]
    c = w // (nz + 2)
    cout = weights.shape[-1]
    span = span or SPAN_T
    # (9, 3c, cout): w9[dy*3+dx][dz*c + ci][co]
    w9 = (
        weights.transpose(1, 2, 0, 3, 4)
        .reshape(9, 3 * c, cout)
        .astype(tableT.dtype)
    )

    def fallback():
        gs = [_xla_gather_t(tableT, idx[:, t]) for t in range(9)]
        acc = None
        for t, gT in enumerate(gs):
            g4 = gT.reshape(1, nz + 2, c, m)
            contrib = jax.lax.conv_general_dilated(
                g4[0], weights[:, t // 3, t % 3], window_strides=(1,),
                padding="VALID", dimension_numbers=("WCN", "WIO", "WCN"),
            )
            acc = contrib if acc is None else acc + contrib
        return acc.reshape(nz * cout, m)

    ok = (
        _pallas_ok_t(tableT.dtype, n, m, w)
        and n >= span
        and c % 8 == 0
        and (nz * cout) % 8 == 0
        and cout % 8 == 0
    )
    if not ok:
        return fallback()
    identity = identity_tap if (identity_tap is not None and m == n) else None
    meta, li4, overflow = _stacked_prologue(idx, n, span)
    return jax.lax.cond(
        overflow,
        fallback,
        lambda: _pallas_gather9_conv(
            tableT, meta, li4, w9, m, span, nz, c, cout, identity
        ),
    )


# --------------------------------------------------------------------------
# transpose: span scatter-add
# --------------------------------------------------------------------------


def _xla_scatter_add(g, idx, n):
    w = g.shape[1]
    safe = jnp.where(idx >= 0, idx, n)
    out = jnp.zeros((n + 1, w), dtype=g.dtype).at[safe].add(g, mode="drop")
    return out[:n]


def _scatter_kernel(c_ref, t_ref, g_hbm, out_ref, win, sem):
    k = pl.program_id(0)
    nblk = pl.num_programs(0)
    nbuf, s = win.shape[0], win.shape[1]

    def start(blk, slot):
        off = pl.multiple_of(c_ref[blk], 8)
        pltpu.make_async_copy(g_hbm.at[pl.ds(off, s)], win.at[slot], sem.at[slot]).start()

    @pl.when(k == 0)
    def _():
        for b_ in range(min(nbuf - 1, nblk)):
            start(b_, b_)

    @pl.when(k + nbuf - 1 < nblk)
    def _():
        start(k + nbuf - 1, (k + nbuf - 1) % nbuf)

    slot = k % nbuf
    off = pl.multiple_of(c_ref[k], 8)
    pltpu.make_async_copy(g_hbm.at[pl.ds(off, s)], win.at[slot], sem.at[slot]).wait()

    tw = t_ref[0]  # (S/64, 64) global target indices of this tile's window:
    # dense lanes — the earlier (S, 1) sublane layout forced a 128x-padded
    # HBM tensor (one lane of 128 used; its copy+select traced 15 ms/step)
    b = out_ref.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (b, 64), 0) + k * b
    # onehot[r, j] = 1 iff input row (c_k + j) targets out row (k*B + r);
    # one accumulating (B, 64) x (64, W) dot per 64-row window chunk (no
    # transpose, no lane-concat)

    def dot(gw):
        acc = None
        for j in range(s // 64):
            piece = (tw[j][None, :] == ids).astype(gw.dtype)
            contrib = jax.lax.dot_general(
                piece,
                gw[j * 64 : (j + 1) * 64],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = contrib if acc is None else acc + contrib
        return acc.astype(out_ref.dtype)

    for b_ in range(nbuf):
        @pl.when(slot == b_)
        def _(b_=b_):
            out_ref[:] = dot(win[b_])


def _pallas_scatter(g, tgt_win, c, n, out_dtype=None, span=None):
    m, w = g.shape
    nblk = n // BLOCK
    out_dtype = out_dtype or g.dtype
    span = span or SPAN
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, span // 64, 64), lambda k, c: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BLOCK, w), lambda k, c: (k, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, span, w), g.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n, w), out_dtype),
        interpret=INTERPRET,
    )(c, tgt_win, g)


def _scatter_prologue(idx, n, m, span=None):
    span = span or SPAN
    nblk = n // BLOCK
    valid = idx >= 0
    idxm = jax.lax.cummax(jnp.where(valid, idx, -1), axis=0)
    # monotone check: every valid idx must be >= the running max before it
    prev = jnp.concatenate([jnp.full((1,), -1, idxm.dtype), idxm[:-1]])
    nonmono = jnp.any(valid & (idx < prev))
    tile_starts = jnp.arange(nblk, dtype=jnp.int32) * BLOCK
    # Ranks of the tile boundaries via a coarse compare-count instead of
    # jnp.searchsorted: searchsorted lowers to a while-loop binary search
    # with per-iteration gathers (traced at ~3 ms/step for 10k queries at
    # nuScenes scale, pure latency). idxm is MONOTONE, so block j of 64 is
    # entirely < q iff its last element idxm[64j+63] < q — the coarse count
    # t = #(idxm[63::64] < q) equals floor(searchsorted(idxm, q)/64)
    # EXACTLY. That is all `c` (64-aligned starts) needs; `b` must stay
    # EXACT (a +64 slop can cross a sample boundary into the next sample's
    # valid rows and re-trigger the tail-overflow bug the posv clamp
    # fixed), so refine it with one wide-row gather of the boundary block.
    coarse = idxm[63::64]  # (m//64,) last element of each full 64-block
    nfull = coarse.shape[0]
    qb = tile_starts + BLOCK
    if nfull == 0:  # tiny arrays: the binary-search cost is irrelevant
        c = jnp.zeros(nblk, jnp.int32)
        b = jnp.searchsorted(idxm, qb, side="left").astype(jnp.int32)
    else:
        qs = jnp.concatenate([tile_starts, qb])
        t_ab = jnp.sum(coarse[None, :] < qs[:, None], axis=1,
                       dtype=jnp.int32)  # (2*nblk,)
        c = t_ab[:nblk] * 64
        t_b = t_ab[nblk:]
        im64 = idxm[: nfull * 64].reshape(nfull, 64)
        rowb = jnp.take(im64, jnp.minimum(t_b, nfull - 1), axis=0)
        fine = jnp.sum(rowb < qb[:, None], axis=1, dtype=jnp.int32)
        # block t_b's last element is >= q, so nothing past it is < q
        b = jnp.where(t_b >= nfull, m, 64 * t_b + fine)
    # The ≤63-row extra slack on starts is negligible vs the span
    # (true post-compaction windows are ~100 rows, span is 512-640).
    c = jnp.minimum(c, ((m - span) // 64) * 64)
    c = jnp.maximum(c, 0).astype(jnp.int32)
    # overflow must count only VALID rows in the window: with batched
    # (flattened) inputs each sample's invalid tail (idx=-1, cummax stuck)
    # sits between samples, and the raw b of a sample-boundary tile lands
    # past that whole tail — a ~100k overestimate that forced the XLA
    # fallback scatter every step at nuScenes scale (trace: 15 ms/step)
    # even though the true per-tile windows were <100 rows. Clamp b to
    # one-past the last valid source row strictly before it.
    posv = jax.lax.cummax(
        jnp.where(valid, jnp.arange(m, dtype=jnp.int32), -1)
    )
    bsafe = jnp.where(b > 0, jnp.take(posv, jnp.maximum(b - 1, 0)) + 1, 0)
    overflow = nonmono | jnp.any(bsafe - c > span)
    # per-tile index windows. vmap(dynamic_slice) lowers to a sequential
    # nblk-iteration XLA while loop (traced at 8.6 ms/step at nuScenes
    # scale) and a batched element take to a 46 ms latency-bound gather;
    # instead materialize a sliding-window table of 64-element blocks
    # (span//64 shifted lane-concats, contiguous copies) and row-gather it
    # WIDE (nblk rows x span lanes — row gathers are latency-bound per ROW,
    # so wide rows are ~free). Requires the 64-aligned starts above.
    nw = span // 64
    m64 = -(-m // 64) * 64
    idx64 = jnp.pad(idx.astype(jnp.int32), (0, m64 - m),
                    constant_values=-1).reshape(m64 // 64, 64)
    idx64 = jnp.pad(idx64, ((0, nw - 1), (0, 0)), constant_values=-1)
    win_tab = jnp.concatenate(
        [idx64[k : k + m64 // 64] for k in range(nw)], axis=1
    )  # (m64/64, span): row r = idx[64r : 64r+span]
    # barrier: without it XLA fuses the shifted-concat INTO the take as a
    # per-element nw-way select chain (traced 10 ms/step); materialized, the
    # take is a plain wide-row gather (~1 ms)
    win_tab = jax.lax.optimization_barrier(win_tab)
    tgt_win = jnp.take(win_tab, c // 64, axis=0)
    return c, tgt_win.reshape(nblk, span // 64, 64), overflow


def _core_scatter(g, idx, n, out_dtype=None, span=None):
    """g (M, W), idx (M,) int32 in [-1, N); requires valid idx nondecreasing
    for the fast path (checked at runtime; falls back otherwise).
    out_dtype (default g.dtype) selects the accumulator-output dtype —
    f32 output keeps the kernel's f32 accumulation exact for bf16 inputs."""
    m, w = g.shape
    span = span or SPAN
    out_dtype = out_dtype or g.dtype

    def fallback():
        return _xla_scatter_add(g.astype(out_dtype), idx, n)

    if not _pallas_ok(g.dtype, n, m, w) or m < span or m % 8 != 0 or n % BLOCK != 0:
        return fallback()
    c, tgt_win, overflow = _scatter_prologue(idx, n, m, span)
    return jax.lax.cond(
        overflow,
        fallback,
        lambda: _pallas_scatter(g, tgt_win, c, n, out_dtype, span),
    )


# --------------------------------------------------------------------------
# public API (differentiable, optionally batched)
# --------------------------------------------------------------------------


@jax.custom_vjp
def _gather_core_diff(table, idx):
    return _core_gather(table, idx)


def _gather_fwd(table, idx):
    return _core_gather(table, idx), (idx, table.shape[0])


def _gather_bwd(res, gbar):
    idx, n = res
    return _core_scatter(gbar, idx, n), None


_gather_core_diff.defvjp(_gather_fwd, _gather_bwd)


def gather_rows(table, idx):
    """Row gather with -1 => zero row. Differentiable w.r.t. `table`.

    Args:
        table: (N, W) or (Bt, N, W)
        idx:   (M,)   or (Bt, M) int32; batched form gathers within-sample.
    Returns (M, W) / (Bt, M, W), same dtype as table.

    Fast path requires the span property (indices of each 128-row block fit
    a 512-row window) — true for BEV conv-tap neighbor tables; anything else
    falls back to XLA transparently.
    """
    if table.ndim == 2:
        return _gather_core_diff(table, idx)
    bt, n, w = table.shape
    m = idx.shape[1]
    offs = (jnp.arange(bt, dtype=jnp.int32) * n)[:, None]
    idx2 = jnp.where(idx >= 0, idx + offs, -1).reshape(bt * m)
    out = _gather_core_diff(table.reshape(bt * n, w), idx2)
    return out.reshape(bt, m, w)


def scatter_rows_add(g, idx, n, out_dtype=None, span=None):
    """Transpose of gather_rows: sum rows of g into an (N, W) table by idx
    (-1 rows dropped). Batched like gather_rows. out_dtype=f32 keeps the
    kernel's f32 accumulation for bf16 inputs."""
    if g.ndim == 2:
        return _core_scatter(g, idx, n, out_dtype, span)
    bt, m, w = g.shape
    offs = (jnp.arange(bt, dtype=jnp.int32) * n)[:, None]
    idx2 = jnp.where(idx >= 0, idx + offs, -1).reshape(bt * m)
    out = _core_scatter(g.reshape(bt * m, w), idx2, bt * n, out_dtype, span)
    return out.reshape(bt, n, w)


# --------------------------------------------------------------------------
# packed-voxelizer unpack: scatter output -> transposed conv input
# --------------------------------------------------------------------------
#
# The packed voxelizer scatter (ops/pillar_sparse.voxelize_pillars_batched)
# produces (Bt, P*nz/8, 128) f32: row r holds 8 cells (cell = r*8+g), cell g
# occupying lanes [g*16, g*16+16) as 2-way bf16-split pairs of (c features +
# count). The backbone wants (nz*cpad, Bt*P) bf16 pillar-in-lane columns,
# mean features on rows z*cpad+ch (ch < c), zeros elsewhere. Getting there
# in XLA costs 4+ full relayout passes over 300+ MB intermediates (pair-sum,
# (Bt, ncell, 8) reshape, count column slice, divide, bf16 cast, transpose,
# channel pad — traced at ~35 ms/step at nuScenes scale). This kernel does
# it in ONE pass: a static (128, 128) selector dot folds pair-sum + count
# spread, the VPU does the masked divide + bf16 cast, and per-z-slab
# identity dots emit the transpose on the MXU (no value relayouts).
# Reference semantics: the mean-VFE + dense conv input formatting implied by
# pcdet's spconv voxel features (pcdet/datasets/processor/data_processor.py
# transform_points_to_voxels + mean VFE), re-laid-out for the TPU flow.


def _unpack_sel(c):
    """(128, 128) f32: columns 0..63 pair-sum (lane 2j + 2j+1 -> j), columns
    64..127 spread the count pair (g*16+2c, +1) to all 8 lanes of cell g."""
    s = np.zeros((128, 128), np.float32)
    for j in range(64):
        s[2 * j, j] = 1.0
        s[2 * j + 1, j] = 1.0
    for g in range(8):
        for k in range(8):
            s[g * 16 + 2 * c, 64 + g * 8 + k] = 1.0
            s[g * 16 + 2 * c + 1, 64 + g * 8 + k] = 1.0
    return s


def _unpack_perm(blkp, nzr):
    """(blkp*nzr, nzr*blkp) 0/1 permutation: row p*nzr+q -> column q*blkp+p
    (the transpose-and-regroup the output assembly slices below expect)."""
    e = np.zeros((blkp * nzr, nzr * blkp), np.float32)
    for p_ in range(blkp):
        for q in range(nzr):
            e[p_ * nzr + q, q * blkp + p_] = 1.0
    return e


def _unpack_kernel(nzr, c, x_ref, sel_ref, perm_ref, o_ref):
    blkp = o_ref.shape[1]
    t = jax.lax.dot_general(
        x_ref[0], sel_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (blkp*nzr, 128): [:, :64] sums, [:, 64:] counts
    sums = t[:, :64]
    cnt = jnp.maximum(jnp.round(t[:, 64:]), 1.0)
    k_of_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1) % 8
    y = jnp.where(k_of_lane < c, sums / cnt, 0.0).astype(o_ref.dtype)
    # MXU transpose-and-regroup: one dot against a static permutation
    # (Mosaic cannot shape-cast the (blkp, nzr, 64) sublane split directly)
    z = jax.lax.dot_general(
        y, perm_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)  # (64, nzr*blkp), column q*blkp+p
    for q in range(nzr):
        o_ref[q * 64 : (q + 1) * 64, :] = z[:, q * blkp : (q + 1) * blkp]


def unpack_pillars_t_ref(out_scatter, nz, c, cpad, p):
    """Pure-XLA reference: (Bt, P*nz/8, 128) f32 -> (nz*cpad, Bt*P) bf16."""
    bt = out_scatter.shape[0]
    o4 = out_scatter.reshape(bt, -1, 64, 2)
    s64 = o4[..., 0] + o4[..., 1]  # (bt, R, 64)
    sums = s64.reshape(bt, p * nz, 8)
    cnt = jnp.maximum(jnp.round(sums[..., c]), 1.0)
    feats = sums[..., :c] / cnt[..., None]
    x = feats.reshape(bt, p, nz, c).astype(jnp.bfloat16)
    x = x.transpose(2, 3, 0, 1).reshape(nz, c, bt * p)
    x = jnp.pad(x, ((0, 0), (0, cpad - c), (0, 0)))
    return x.reshape(nz * cpad, bt * p)


def unpack_pillars_t_ok(nz, c, cpad, p):
    return (
        jax.default_backend() != "cpu"
        and not INTERPRET_FORCED
        and cpad == 8
        and nz % 8 == 0
        and 1 <= c <= 6
        and p % 256 == 0
    )


INTERPRET_FORCED = False  # tests flip this to exercise the kernel on CPU


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def unpack_pillars_t(out_scatter, nz, c, cpad, p):
    """Fused unpack of the packed voxelizer scatter output into the
    transposed backbone input. Differentiable (reference VJP; the backward
    only runs in adversarial-gradient contexts)."""
    return _unpack_impl(out_scatter, nz, c, cpad, p)


def _unpack_impl(out_scatter, nz, c, cpad, p):
    if not unpack_pillars_t_ok(nz, c, cpad, p) and not INTERPRET_FORCED:
        return unpack_pillars_t_ref(out_scatter, nz, c, cpad, p)
    bt = out_scatter.shape[0]
    blkp = 256
    nzr = nz // 8
    nblk = p // blkp
    sel = jnp.asarray(_unpack_sel(c))
    perm = jnp.asarray(_unpack_perm(blkp, nzr), jnp.bfloat16)
    kern = functools.partial(_unpack_kernel, nzr, c)
    return pl.pallas_call(
        kern,
        grid=(bt, nblk),
        in_specs=[
            pl.BlockSpec((1, blkp * nzr, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blkp * nzr, nzr * blkp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nz * cpad, blkp),
                               lambda b, i: (0, b * (p // blkp) + i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz * cpad, bt * p), jnp.bfloat16),
        interpret=INTERPRET_FORCED,
    )(out_scatter, sel, perm)


def _unpack_vjp_fwd(out_scatter, nz, c, cpad, p):
    return _unpack_impl(out_scatter, nz, c, cpad, p), (out_scatter,)


def _unpack_vjp_bwd(nz, c, cpad, p, res, g):
    (out_scatter,) = res
    _, vjp = jax.vjp(lambda o: unpack_pillars_t_ref(o, nz, c, cpad, p),
                     out_scatter)
    return vjp(g)


unpack_pillars_t.defvjp(_unpack_vjp_fwd, _unpack_vjp_bwd)

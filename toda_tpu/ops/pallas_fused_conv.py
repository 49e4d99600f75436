"""Fully fused BN+ReLU+gather9+conv3x3x3 Pallas kernel (transposed layout).

The r3 profile of the pillar-sparse backbone showed the step time dominated by
HBM traffic *around* the convs, not the conv math: the stacked 9-tap gather
materializes a 9x-sized intermediate that the conv immediately re-reads
(~6.4 GB round trip per stage-1 conv), and each layer pays separate
elementwise passes for halo-pad, BN-apply, relu and masking. This module
fuses the whole layer into one kernel each way:

    y_raw = Conv3x3x3( relu( x_raw * scale + shift ) )      [z stride 1 or 2]

  * x_raw is the PREVIOUS layer's raw conv output — BN apply + relu happen
    in-VMEM on the DMA'd window (3 dy-group windows per block, as in
    ops/pallas_gather.gather9_stacked_t). The affine row vectors are zero on
    the z-halo rows, so haloing is free (no pad pass, no scratch zero-init).
  * The conv itself runs as BANDED Z-GROUP MXU contractions: zg output
    z-slabs are batched into the dot's M dimension (zg*cout = 128) against a
    static block-banded weight matrix, contracting K = (z_stride*(zg-1)+3)*c
    gathered rows per tap. No value transposes anywhere — the failure mode
    that made the earlier gather9_conv_t fusion 0.85x.
  * Backward mirrors forward: gy is window-gathered by the INVERSE tables,
    contracted with the transposed band, multiplied by the recomputed relu
    mask; dW accumulates in-kernel as per-tap (zg2*c, K2*cout) lane
    contractions summed over blocks and z-groups (band entries extracted
    outside). d(scale)/d(shift) are cheap XLA reductions over the kernel's
    g_relu output.

Replaces (when shapes allow) the gather9_stacked_t + XLA-conv + BN/relu/mask
pipeline of ops/pillar_sparse.pillar_conv3d_t. Reference semantics:
spconv.SubMConv3d / SparseConv3d application in
pcdet/models/backbones_3d/spconv_backbone.py (rulebook gather-GEMM-scatter),
re-expressed TPU-first; BN+ReLU correspond to the norm_fn+relu in each
SparseSequential block there.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_gather as _pg

INT_MAX = np.iinfo(np.int32).max

NBUF = int(os.environ.get("TODA_FUSED_NBUF", "2"))
# output-block lanes. Smaller blocks shrink the per-dy-group window spans
# (tools/probe_group_spans.py: subm need128 at blk 128 is ~298 vs ~423 at
# blk 256) and gather MACs scale with span x M independent of blk, at the
# price of 2x grid steps and 1.5x window DMA bytes.
BLOCK = int(os.environ.get("TODA_FUSED_BLOCK", "256"))  # stride-1
BLOCK_DOWN = int(os.environ.get("TODA_FUSED_BLOCK_DOWN", "128"))  # stride-2 fwd
BLOCK_BWD = int(os.environ.get("TODA_FUSED_BLOCK_BWD", str(BLOCK)))
# Window spans (lanes), env-tunable. Probed on the bs8 bench workload
# (4 varied batches, r3): per-dy-group window need at blk 256 is max 325
# with 8-aligned starts for all subm stages — but window starts must be
# 128-ALIGNED (lane tiling) and sizes 128-multiples, so the effective
# need is ~325 + up-to-127 alignment ≈ 450 → 512 is the minimum legal
# span (384 overflowed both the bench and the dense block test).
# Stride-2 forward needs up to 618 at blk 128 (8-aligned) → 640/896.
# (A 64-aligned dual-plane variant was measured OFF in r3 — 34.4 vs 36.96
# scans/s — and removed in r4; see NOTES.md and git history.)
SPAN_SUBM = int(os.environ.get("TODA_SPAN_SUBM", "512"))
SPAN_DOWN = int(os.environ.get("TODA_SPAN_DOWN", "640"))
SPAN_BWD_DOWN = int(os.environ.get("TODA_SPAN_BWD_DOWN", "512"))
# per-stage (fwd, bwd) down-conv span defaults consumed by the backbone
# (probe need128/need8 at the kernel blocks; see pillar_sparse_backbone)
DEFAULT_DOWN_SPANS = [[512, 512], [512, 384], [896, 384]]
INTERPRET = False
# debug knob: 1 = always take the fast kernel (skip the overflow cond; wrong
# results if a window would overflow), 2 = always take the XLA reference
FORCE_PATH = int(os.environ.get("TODA_FUSED_FORCE_PATH", "0"))
# 1 = wide-gather forward: ONE full-span dot per dy-group against the
# group's taps' one-hots concatenated along lanes (no subwindow predication,
# no cross-sub VMEM accumulation); 0 = legacy per-tap sub-dot loop
WIDE_FWD = int(os.environ.get("TODA_FUSED_WIDE", "1"))
# 1 = span-tier ladder on the wide group dots: pick the narrowest
# 128-aligned window tier covering the group's union tap range (typical
# used span is ~320 of 512 lanes), predicated per tier x position.
# MEASURED OFF (v5e, 2-layer fwd microbench): 38.6 ms vs 16.2 ms full-span
# — the predicated tier x position sites serialize in Mosaic; the kernels
# are issue-bound, so skipped-lane FLOPs never show. Kept for the record.
LADDER = int(os.environ.get("TODA_FUSED_LADDER", "0"))
# N = split each wide group dot into an always-on dot over the first
# nsub-min(N, nsub-2) subwindows + one predicated accumulate per tail
# subwindow (taken only when the group's windowed content reaches it).
# Measured (v5e bs8): 1 -> 38.02, 2 -> 38.41, 3 -> 38.53, 4 -> 38.56
# scans/s (vs 36.93 full-span). See _ladder_dots for why this wins where
# the full tier x position ladder lost.
TAIL_SPLIT = int(os.environ.get("TODA_FUSED_TAIL_SPLIT", "4"))
# 1 = the shared backward kernel also emits dx (= g_relu * scale rows) and
# the dscale/dshift lane-sum accumulators, replacing three full-tensor XLA
# epilogue passes per act-layer (dx scaling + the two (nz,c,M) reshape
# reductions) with two tiny in-kernel ones-dots.
FUSED_AFFINE_BWD = int(os.environ.get("TODA_FUSED_AFFINE_BWD", "1"))
# 1 = mixed custom VJP: fused Pallas forward + the legacy stacked-gather
# XLA-GEMM conv backward with the affine/relu chain rule applied on a
# recomputed pre-activation mask. Wins the isolated 2-layer microbench
# (32.83 vs 34.96 ms fwd+bwd) but LOSES end-to-end (21.51 vs 22.79
# scans/s, bench.py bs8): across the 11-layer backbone the recomputed-h
# passes, the 9*Cout gather-stack HBM round-trips, and the unfused
# dscale/dshift reductions outweigh the per-layer dot savings that the
# in-kernel fused backward avoids. Default off; knob kept for A/B.
MIXED_BWD = int(os.environ.get("TODA_FUSED_MIXED_BWD", "0"))
# timing-diagnostic ONLY (wrong dW when 1): skip the in-kernel dW dots
SKIP_DW = int(os.environ.get("TODA_FUSED_SKIP_DW", "0"))
# Lane width of the banded z-group dots (M dim fwd / N dim bwd). 256 halves
# the per-block band/dW MXU issue count vs 128 (the kernels are issue-bound
# on those small dots); z-groups that overrun nz are tail-trimmed, so the
# wide gather dots never pay for group padding.
GROUP_LANES = int(os.environ.get("TODA_GROUP_LANES", "128"))


# default window grouping: taps share a window per BEV row offset dy (rows
# are far apart in the key-sorted rank space, columns adjacent).
# (A plane-major "parity" grouping for stride-2 convs was measured OFF in r3
# — 35.6 vs 40.2 scans/s — and removed in r4; see NOTES.md + git history.)
DY_GROUPS = ((0, 1, 2), (3, 4, 5), (6, 7, 8))


def _fwd_slots(identity, groups=DY_GROUPS):
    """Tap -> gbuf lane-slot: taps take slots in group-iteration order (so
    each group's slots are contiguous for the wide group dot); identity
    last."""
    taps = [t for ts in groups for t in ts if t != identity]
    slot = {t: k for k, t in enumerate(taps)}
    if identity is not None:
        slot[identity] = 8
    return slot


def _group_of(groups):
    """Tap -> group index."""
    return {t: gi for gi, ts in enumerate(groups) for t in ts}


def _span_tiers(nsub):
    """Ascending subwindow-count tiers for the ladder; last = full span.
    Capped for wide spans to bound the predicated-region count."""
    if not LADDER:
        return [nsub]
    return list(range(2, nsub + 1)) if nsub <= 4 else [3, nsub]


def _fwd_band_iter(cfg):
    """(gz, zge, r0, krows, mcols) for the fwd band dots, tail-trimmed: the
    last z-group covers only zg_tail real output slabs, so its dot reads
    fewer gathered rows and writes fewer acc rows (no group padding)."""
    zg, s, c, cout = cfg["zg"], cfg["z_stride"], cfg["c"], cfg["cout"]
    ng = cfg["nzp_out"] // zg
    for gz in range(ng):
        zge = cfg["zg_tail"] if gz == ng - 1 else zg
        yield gz, zge, s * gz * zg * c, fwd_band_slabs(zge, s) * c, zge * cout


def _bwd_band_iter(cfg):
    """(gz, zg2e, r0, krows, ncols) for the bwd band/dW dots, tail-trimmed."""
    zg2, s, c, cout = cfg["zg2"], cfg["z_stride"], cfg["c"], cfg["cout"]
    goff = zg2 if s == 1 else zg2 // 2
    ng2 = cfg["nzp_in"] // zg2
    for gz in range(ng2):
        zg2e = cfg["zg2_tail"] if gz == ng2 - 1 else zg2
        yield (gz, zg2e, gz * goff * cout,
               bwd_tail_slabs(zg2e, s) * cout, zg2e * c)


def _meta_ms(cfg):
    """(meta stride, smin base) for the fwd meta layout of cfg."""
    ng = len(cfg["groups"])
    sbase = ng * (2 if cfg["ne"] else 1)
    return sbase + 18, sbase


def _group_range(meta_ref, i, ts, ms=21, sbase=3):
    """Union (smin, smax) 128-lane subwindow range over a group's taps."""
    smin_g = meta_ref[i * ms + sbase + ts[0]]
    smax_g = meta_ref[i * ms + sbase + 9 + ts[0]]
    for t in ts[1:]:
        smin_g = jnp.minimum(smin_g, meta_ref[i * ms + sbase + t])
        smax_g = jnp.maximum(smax_g, meta_ref[i * ms + sbase + 9 + t])
    return smin_g, smax_g


def _ladder_dots(win, slot, b_g_oh_list, gbuf, meta_ref, i, identity, nsub,
                 ms=21, sbase=3, ne_of=None, spans_g=None):
    """Emit the predicated tier x position group dots for one buffer slot
    predicate set. b_g_oh_list: [(b, g, ts, oh, gstart, wdt)].
    spans_g: per-group spans (defaults to nsub*128 for every group).
    ne_of(g): group-nonempty scalar predicate — when given, the main dot is
    skipped and the gbuf region zero-stored for empty groups."""
    get_nsub = (lambda g: spans_g[g] // 128) if spans_g else (lambda g: nsub)
    if ne_of is not None:
        done = set()
        for _, g, ts, oh, gstart, wdt in b_g_oh_list:
            if g in done:
                continue
            done.add(g)

            @pl.when(ne_of(g) == 0)
            def _(gstart=gstart, wdt=wdt):
                gbuf[:, pl.ds(gstart, wdt)] = jnp.zeros(
                    (gbuf.shape[0], wdt), gbuf.dtype)

    ntail_glob = TAIL_SPLIT if not LADDER else 0
    if ntail_glob > 0:
        # Tail-split: window content always starts in subwindow 0 (the
        # window lo is floor128 of the group's min index), so the last
        # 128-lane subwindow(s) are populated only by the widest blocks.
        # ONE always-on dot over the first nsub-ntail subs + a predicated
        # accumulate per tail sub trims up to ntail/nsub of the gather
        # MACs on most blocks, with fixed-shape dot sites (the full tier
        # x position ladder measured 2.4x WORSE — many variable-shape
        # predicated sites serialize in Mosaic; a few fixed sites do not).
        for b, g, ts, oh, gstart, wdt in b_g_oh_list:
            nsub_g = get_nsub(g)
            ntail = min(TAIL_SPLIT, nsub_g - 2)
            if ntail < 0:
                ntail = 0
            wmain = (nsub_g - ntail) * 128
            _, smax_g = _group_range(meta_ref, i, ts, ms, sbase)
            main_pred = slot == b
            if ne_of is not None:
                main_pred = main_pred & (ne_of(g) != 0)

            @pl.when(main_pred)
            def _(b=b, g=g, oh=oh, gstart=gstart, wdt=wdt, wmain=wmain):
                gbuf[:, pl.ds(gstart, wdt)] = jnp.dot(
                    win[b, g, :, :wmain], oh[:wmain],
                    preferred_element_type=jnp.float32,
                ).astype(gbuf.dtype)

            for k in range(nsub_g - ntail, nsub_g):
                @pl.when((slot == b) & (smax_g >= k))
                def _(b=b, g=g, k=k, oh=oh, gstart=gstart, wdt=wdt):
                    gbuf[:, pl.ds(gstart, wdt)] += jnp.dot(
                        win[b, g, :, k * 128 : (k + 1) * 128],
                        oh[k * 128 : (k + 1) * 128],
                        preferred_element_type=jnp.float32,
                    ).astype(gbuf.dtype)
        return
    tiers = _span_tiers(nsub)
    for b, g, ts, oh, gstart, wdt in b_g_oh_list:
        smin_g, smax_g = _group_range(meta_ref, i, ts, ms, sbase)
        width_g = smax_g - smin_g + 1
        for ti, w in enumerate(tiers):
            lo_excl = tiers[ti - 1] if ti else 0
            cond_w = (width_g > lo_excl) & (width_g <= w)
            if w == nsub:
                positions = [0]
            else:
                positions = range(nsub - w + 1)
            s_cl = jnp.minimum(smin_g, nsub - w)
            for s in positions:
                cnd = (slot == b) & cond_w
                if w != nsub:
                    cnd = cnd & (s_cl == s)

                @pl.when(cnd)
                def _(b=b, g=g, s=s, w=w, oh=oh, gstart=gstart, wdt=wdt):
                    gbuf[:, pl.ds(gstart, wdt)] = jnp.dot(
                        win[b, g, :, s * 128 : (s + w) * 128],
                        oh[s * 128 : (s + w) * 128],
                        preferred_element_type=jnp.float32,
                    ).astype(gbuf.dtype)


# --------------------------------------------------------------------------
# static banded weights
# --------------------------------------------------------------------------


def fwd_group_size(cout):
    """zg: output z-slabs per band dot, so zg*cout ~ GROUP_LANES (MXU M)."""
    return max(1, GROUP_LANES // cout)


def bwd_group_size(c, z_stride):
    zg2 = max(1, GROUP_LANES // c)
    if z_stride == 2 and zg2 % 2:
        zg2 += 1  # group offsets must be affine in g (even zg2)
    return zg2


def bwd_tail_slabs(zg2_t, z_stride):
    """gy-window slabs read by a TRIMMED bwd group of zg2_t input slabs."""
    return zg2_t + 2 if z_stride == 1 else zg2_t // 2 + 1


def fwd_band_slabs(zg, z_stride):
    return z_stride * (zg - 1) + 3


def bwd_band_slabs(zg2, z_stride):
    return zg2 + 2 if z_stride == 1 else zg2 // 2 + 1


def _fwd_band_sel(zg, z_stride):
    """Static (3, Kslabs, zg) 0/1 selector: sel[dz, K, k] = 1 iff band slab
    K == z_stride*k + dz (the fwd band placement)."""
    ks = fwd_band_slabs(zg, z_stride)
    sel = np.zeros((3, ks, zg), np.float32)
    for k in range(zg):
        for dz in range(3):
            sel[dz, z_stride * k + dz, k] = 1.0
    return sel


def band_fwd_weights(w, zg, z_stride):
    """(3,3,3,c,cout) (dz,dy,dx) -> (9, Kslabs*c, zg*cout) banded.

    Band block for (output slab k, dz): rows (z_stride*k+dz)*c..+c, cols
    k*cout..+cout — output zo of group g reads haloed input slabs
    z_stride*zo + dz with the group's buffer window starting at haloed slab
    z_stride*g*zg. Built as ONE einsum against a static 0/1 selector —
    the per-(t,k,dz) .at[].set chain traced as ~150 separate fusion ops
    (~8 ms/step rebuilt for every layer fwd+bwd)."""
    c, cout = w.shape[3], w.shape[4]
    ks = fwd_band_slabs(zg, z_stride)
    sel = jnp.asarray(_fwd_band_sel(zg, z_stride), w.dtype)
    w9 = w.reshape(3, 9, c, cout)
    band = jnp.einsum("dKk,dtio->tKiko", sel, w9)
    return band.reshape(9, ks * c, zg * cout)


def _bwd_slab_pairs(zg2, z_stride):
    """(k, dz) -> gy-buffer slab index within a backward z-group, or None.

    Forward: output zo consumes haloed input slab z_stride*zo + dz, i.e.
    unpadded zi = z_stride*zo + dz - 1. Backward group g covers
    zi = g*zg2 + k; the gathered-gy buffer is top-haloed by one zero slab iff
    stride 1 (slab h = zo + 1), un-haloed for stride 2 (slab h = zo), and the
    group's window starts at slab g*zg2 (stride 1) / g*zg2//2 (stride 2)."""
    pairs = {}
    for k in range(zg2):
        for dz in range(3):
            num = k + 1 - dz  # z_stride * zo_rel for the in-group zi = k
            if z_stride == 1:
                pairs[(k, dz)] = k + 2 - dz
            else:
                pairs[(k, dz)] = num // 2 if (num % 2 == 0 and num >= 0) else None
    return pairs


def _bwd_band_sel(zg2, z_stride):
    """Static (3, K2slabs, zg2) 0/1 selector of the bwd band placement
    (sel[dz, sl, k] = 1 iff _bwd_slab_pairs maps (k, dz) -> sl)."""
    k2 = bwd_band_slabs(zg2, z_stride)
    pairs = _bwd_slab_pairs(zg2, z_stride)
    sel = np.zeros((3, k2, zg2), np.float32)
    for k in range(zg2):
        for dz in range(3):
            sl = pairs[(k, dz)]
            if sl is not None and 0 <= sl < k2:
                sel[dz, sl, k] = 1.0
    return sel


def band_bwd_weights(w, zg2, z_stride):
    """(3,3,3,c,cout) -> (9, K2slabs*cout, zg2*c) transposed band: the
    features-cotangent contraction g_pre = sum_t Wback_t^T . gathered-gy
    (see _bwd_slab_pairs for the slab mapping). One einsum against a
    static selector, same rationale as band_fwd_weights."""
    c, cout = w.shape[3], w.shape[4]
    k2 = bwd_band_slabs(zg2, z_stride)
    sel = jnp.asarray(_bwd_band_sel(zg2, z_stride), w.dtype)
    w9 = w.reshape(3, 9, c, cout)
    band = jnp.einsum("dSk,dtio->tSoki", sel, w9)
    return band.reshape(9, k2 * cout, zg2 * c)


def extract_dw(dwacc, c, cout, zg2, z_stride, dtype):
    """dwacc (9, K2slabs*cout, zg2*c) f32 -> dW (3,3,3,c,cout).

    dwacc_t holds, summed over blocks and z-groups, the lane contraction of
    xb group rows against gathered-gy group rows; the (k, dz) band cells are
    the conv-weight gradients, off-band cells unused cross terms. The band
    cell selection is the same static selector as band_bwd_weights, applied
    as one einsum."""
    k2 = bwd_band_slabs(zg2, z_stride)
    sel = jnp.asarray(_bwd_band_sel(zg2, z_stride), dwacc.dtype)
    d5 = dwacc.reshape(9, k2, cout, zg2, c)
    dw = jnp.einsum("dSk,tSoki->dtio", sel, d5)
    return dw.reshape(3, 3, 3, c, cout).astype(dtype)


# --------------------------------------------------------------------------
# prologue (slim li: no 8-sublane replication)
# --------------------------------------------------------------------------


def _prologue(idx, n, span, block=BLOCK, align=None, groups=DY_GROUPS,
              with_ne=False):
    """idx (M, 9) folded tap tables -> meta (nblk, ms), li (nblk, 9, 1, B),
    overflow. Same per-group window math as pallas_gather._stacked_prologue,
    but li is NOT sublane-replicated (8x less metadata traffic).

    groups: window grouping of the 9 taps (DY_GROUPS). `span` may be a
    scalar or a per-group tuple. with_ne=True appends a per-group nonempty
    flag after the lo words (the kernel skips the group's DMA and dots
    when 0).
    Meta layout: [lo(ng) | ne(ng if with_ne) | smin(9) | smax(9)], flat.

    align: window-start alignment (128 = the HBM DMA lane-offset rule)."""
    if align is None:
        align = 128
    ng = len(groups)
    spans = (span,) * ng if np.isscalar(span) else tuple(span)
    m = idx.shape[0]
    nblk = m // block
    blk = idx.reshape(nblk, block, 9)
    valid = blk >= 0
    los, nes = [], []
    li_t = [None] * 9
    vli_t = [None] * 9
    overflow = jnp.zeros((), bool)
    for g, ts in enumerate(groups):
        sp = spans[g]
        grp = blk[:, :, list(ts)].reshape(nblk, -1)
        gv = valid[:, :, list(ts)].reshape(nblk, -1)
        lo = jnp.min(jnp.where(gv, grp, INT_MAX), axis=1)
        ne = lo != INT_MAX
        lo = jnp.where(ne, lo, 0)
        lo = (lo // align) * align
        lo = jnp.minimum(lo, ((n - sp) // align) * align).astype(jnp.int32)
        vli = grp - lo[:, None]
        overflow = overflow | jnp.any(gv & (vli >= sp))
        li = jnp.where(gv, jnp.clip(vli, 0, sp), sp).astype(jnp.int32)
        los.append(lo)
        nes.append(ne.astype(jnp.int32))
        li3 = li.reshape(nblk, block, len(ts))
        vli3 = vli.reshape(nblk, block, len(ts))
        for k, t in enumerate(ts):
            li_t[t] = li3[:, :, k]
            vli_t[t] = vli3[:, :, k]
    lo_g = jnp.stack(los, axis=1)
    li9 = jnp.stack(li_t, axis=2)  # (nblk, B, 9), tap order
    li4 = li9.transpose(0, 2, 1)[:, :, None, :]  # (nblk, 9, 1, B)
    # per-tap subwindow ranges relative to the TAP'S OWN group span (the
    # sentinel for _sub_ranges is the tap's group span; use the max so the
    # clip below keeps empty taps out of range for every group)
    gof = _group_of(groups)
    sub_l, sub_v = [], []
    for t in range(9):
        sub_l.append(vli_t[t])
        sub_v.append(valid[:, :, t])
    smin, smax = _pg._sub_ranges(
        jnp.stack(sub_l, axis=2), jnp.stack(sub_v, axis=2), max(spans)
    )
    # clamp per-tap smax to its group's subwindow count (empty -> (0, 0))
    nsub_t = jnp.asarray([spans[gof[t]] // 128 for t in range(9)], jnp.int32)
    smin = jnp.minimum(smin, nsub_t[None] - 1)
    smax = jnp.minimum(smax, nsub_t[None] - 1)
    parts = [lo_g] + ([jnp.stack(nes, axis=1)] if with_ne else []) + [smin,
                                                                      smax]
    meta = jnp.concatenate(parts, axis=1)  # (nblk, ms)
    # FLAT (nblk*ms,): Mosaic pads each row of a 2-D prefetched SMEM operand
    # to 128 lanes, so (2048, ms) i32 would claim the full 1 MB SMEM budget
    return meta.reshape(-1), li4, overflow


def _win_src(src, lo, span):
    """Window slice of the (rows, n) DMA source at 128-aligned start `lo`
    (an SMEM scalar read from meta)."""
    return src.at[:, pl.ds(pl.multiple_of(lo, 128), span)]


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(cfg, meta_ref, src, li_ref, sc_ref, sh_ref, wb_ref, xblk_ref,
                out_ref, win, gbuf, acc, sem):
    """Scratch `win` rows live in the z-HALOED row space (haloed slab h =
    unpadded z + 1); DMA fills rows [c, c+nz_in*c); the affine row vectors
    are zero outside that range, so halo/pad rows become exact zeros without
    any scratch initialization."""
    c, cout = cfg["c"], cfg["cout"]
    zg, s = cfg["zg"], cfg["z_stride"]
    identity = cfg["identity"]
    w0 = cfg["nz_in"] * c
    ngz = cfg["nzp_out"] // zg
    ks = fwd_band_slabs(zg, s)
    groups = cfg["groups"]
    spans_g = cfg["spans_g"]
    ngr = len(groups)
    ms, sbase = _meta_ms(cfg)
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    nbuf, _, whalo, span = win.shape
    nsub = span // 128

    def ne_of(blk, g):
        return meta_ref[blk * ms + ngr + g] if cfg["ne"] else None

    def one_group(blk, slot, g, op):
        copy = pltpu.make_async_copy(
            _win_src(src, meta_ref[blk * ms + g], spans_g[g]),
            win.at[slot, g, pl.ds(c, w0), pl.ds(0, spans_g[g])],
            sem.at[slot, g],
        )
        if cfg["ne"]:
            @pl.when(ne_of(blk, g) != 0)
            def _():
                getattr(copy, op)()
        else:
            getattr(copy, op)()

    def start(blk, slot):
        for g in range(ngr):
            one_group(blk, slot, g, "start")

    @pl.when(i == 0)
    def _():
        # zero the halo/pad window rows once (never DMA'd, so zeros persist;
        # uninitialized VMEM could hold NaN bit patterns, and 0*NaN != 0)
        for b in range(nbuf):
            for g in range(ngr):
                win[b, g, pl.ds(0, c)] = jnp.zeros((c, span), win.dtype)
                nrest = whalo - c - w0
                if nrest:
                    win[b, g, pl.ds(c + w0, nrest)] = jnp.zeros(
                        (nrest, span), win.dtype
                    )
        for b in range(min(nbuf - 1, nblk)):
            start(b, b)

    @pl.when(i + nbuf - 1 < nblk)
    def _():
        start(i + nbuf - 1, (i + nbuf - 1) % nbuf)

    slot = i % nbuf
    for g in range(ngr):
        one_group(i, slot, g, "wait")

    # BN + relu in place on the three windows (scale/shift rows are zero on
    # halo and pad rows so those stay exactly zero). Dynamic leading-index
    # access on scratch faults on Mosaic -> predicate per buffer slot.
    # act=False (raw first layer): the affine is the identity and halo/pad
    # rows are already zero (i==0 init, never DMA'd) — skip the whole pass.
    sc = sc_ref[:]  # (whalo, 1)
    sh = sh_ref[:]
    if cfg["act"]:
        for b in range(NBUF):
            @pl.when(slot == b)
            def _(b=b):
                for g in range(ngr):
                    win[b, g] = jnp.maximum(win[b, g] * sc + sh, 0)

    li = li_ref[0]  # (9, 1, B)
    bsz = out_ref.shape[1]

    if WIDE_FWD:
        # Wide-gather path: per window group, ONE full-span dot against the
        # group's taps' one-hots concatenated along lanes. Trades ~1.6x raw
        # gather MACs (no subwindow predication) for ~7x fewer MXU issues and
        # zero cross-sub VMEM read-modify-write accumulation — the measured
        # bottleneck of the sub-dot loop (kernel is MXU-issue-bound, window
        # DMA runs at ~690 GB/s).
        slot_of = _fwd_slots(identity, groups)
        if identity is not None:
            s8 = slot_of[identity] * bsz
            if cfg["act"]:
                xb = jnp.maximum(
                    xblk_ref[:] * sc[c : c + w0] + sh[c : c + w0], 0
                )
            else:
                xb = xblk_ref[:]
            gbuf[pl.ds(c, w0), pl.ds(s8, bsz)] = xb
            gbuf[pl.ds(0, c), pl.ds(s8, bsz)] = jnp.zeros((c, bsz), gbuf.dtype)
            nrest = whalo - c - w0
            gbuf[pl.ds(c + w0, nrest), pl.ds(s8, bsz)] = jnp.zeros(
                (nrest, bsz), gbuf.dtype
            )
        sites = []
        gstart = 0
        for g in range(ngr):
            ts = [t for t in groups[g] if t != identity]
            if not ts:
                continue
            wdt = len(ts) * bsz
            licat = jnp.concatenate([li[t] for t in ts], axis=-1)  # (1, wdt)
            giota = jax.lax.broadcasted_iota(jnp.int32, (spans_g[g], wdt), 0)
            oh = (giota == licat).astype(gbuf.dtype)
            for b in range(NBUF):
                sites.append((b, g, ts, oh, gstart, wdt))
            gstart += wdt
        _ladder_dots(win, slot, sites, gbuf, meta_ref, i, identity,
                     span // 128, ms, sbase,
                     (lambda g: ne_of(i, g)) if cfg["ne"] else None, spans_g)
        for t in range(9):
            soff = slot_of[t] * bsz
            for gz, zge, r0, krows, mcols in _fwd_band_iter(cfg):
                gsl = gbuf[pl.ds(r0, krows), pl.ds(soff, bsz)]
                contrib = jax.lax.dot_general(
                    wb_ref[t, :krows, :mcols], gsl,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if t == 0:
                    acc[pl.ds(gz * zg * cout, mcols)] = contrib
                else:
                    acc[pl.ds(gz * zg * cout, mcols)] += contrib
        out_ref[:, :] = acc[:, :].astype(out_ref.dtype)
        return

    gof = _group_of(groups)

    for t in range(9):
        if t == identity:
            xb = xblk_ref[:] * sc[c : c + w0] + sh[c : c + w0]
            if cfg["act"]:
                xb = jnp.maximum(xb, 0)
            gbuf[pl.ds(c, w0)] = xb
            gbuf[pl.ds(0, c)] = jnp.zeros((c, bsz), gbuf.dtype)
            nrest = whalo - c - w0
            gbuf[pl.ds(c + w0, nrest)] = jnp.zeros((nrest, bsz), gbuf.dtype)
        else:
            g = gof[t]
            nsub_g = spans_g[g] // 128
            iota = jax.lax.broadcasted_iota(jnp.int32, (spans_g[g], bsz), 0)
            smin = meta_ref[i * ms + sbase + t]
            smax = meta_ref[i * ms + sbase + 9 + t]
            onehot = (iota == li[t]).astype(gbuf.dtype)
            for b in range(NBUF):
                for sub in range(nsub_g):
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
        # band dots: z-group gz reads gathered haloed rows from slab s*gz*zg
        for gz, zge, r0, krows, mcols in _fwd_band_iter(cfg):
            gsl = gbuf[pl.ds(r0, krows)]
            contrib = jax.lax.dot_general(
                wb_ref[t, :krows, :mcols], gsl,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (zge*cout, B)
            if t == 0:
                acc[pl.ds(gz * zg * cout, mcols)] = contrib
            else:
                acc[pl.ds(gz * zg * cout, mcols)] += contrib
    out_ref[:, :] = acc[:, :].astype(out_ref.dtype)


def _call_fwd(x, sc_h, sh_h, wband, meta, li4, m, cfg):
    w0, n = x.shape
    blk = cfg["blk_fwd"]
    nblk = m // blk
    c, cout = cfg["c"], cfg["cout"]
    whalo, span = cfg["whalo"], cfg["span"]
    nzp_out = cfg["nzp_out"]
    ks = fwd_band_slabs(cfg["zg"], cfg["z_stride"])
    identity = cfg["identity"]

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # src table (manual DMA)
        pl.BlockSpec((1, 9, 1, blk), lambda i, mt: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((whalo, 1), lambda i, mt: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((whalo, 1), lambda i, mt: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((9, ks * c, cfg["zg"] * cout), lambda i, mt: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    src = x
    args = [meta, src, li4, sc_h, sh_h, wband]
    if identity is not None:
        in_specs.append(
            pl.BlockSpec((w0, blk), lambda i, mt: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(x)

    def kern(meta_ref, src, li_ref, sc_ref, sh_ref, wb_ref, *rest):
        if identity is not None:
            xblk_ref = rest[0]
            rest = rest[1:]
        else:
            xblk_ref = None
        out_ref, win, gbuf, acc, sem = rest
        _fwd_kernel(cfg, meta_ref, src, li_ref, sc_ref, sh_ref, wb_ref,
                    xblk_ref, out_ref, win, gbuf, acc, sem)

    w2 = cfg["nz_out"] * cout
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((w2, blk), lambda i, mt: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, len(cfg["groups"]), whalo, span), x.dtype),
            pltpu.VMEM((whalo, 9 * blk if WIDE_FWD else blk), x.dtype),
            pltpu.VMEM((w2, blk), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, len(cfg["groups"]))),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((w2, m), x.dtype),
        interpret=INTERPRET,
    )(*args)


# --------------------------------------------------------------------------
# dW-only kernel (forward tables)
# --------------------------------------------------------------------------
#
# For layers whose INPUT cotangent is dead (the backbone's first conv: its
# input is the voxelizer output, and parameters see no gradient through it),
# the shared backward kernel wastes its dominant cost — the inverse-table gy
# gather feeding the dx band dots. This kernel computes dW alone from the
# FORWARD tables: gather xb taps exactly like _fwd_kernel (same meta/one-hot
# machinery), then contract gathered group rows against the block's OWN gy
# rows over lanes. dW appears in the fwd band layout (9, Ks*c, zg*cout); the
# true (3,3,3,c,cout) gradient is the adjoint of band_fwd_weights
# (extract_dw_fwd). Used by the SPLIT backward (_fused_core_split), where dx
# is a separate, DCE-able kernel: normal training drops it, input-gradient
# paths (FGSM perturbation, runtime/pseudo_label.py) keep it automatically.


def _dw_kernel(cfg, meta_ref, src, li_ref, sc_ref, sh_ref, gyblk_ref,
               xblk_ref, dw_ref, win, gbuf, sem):
    c, cout = cfg["c"], cfg["cout"]
    zg = cfg["zg"]
    identity = cfg["identity"]
    w0 = cfg["nz_in"] * c
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    nbuf, _, whalo, span = win.shape

    def start(blk, slot):
        for g in range(3):
            pltpu.make_async_copy(
                _win_src(src, meta_ref[blk * 21 + g], span),
                win.at[slot, g, pl.ds(c, w0)],
                sem.at[slot, g],
            ).start()

    @pl.when(i == 0)
    def _():
        for b in range(nbuf):
            for g in range(3):
                win[b, g, pl.ds(0, c)] = jnp.zeros((c, span), win.dtype)
                nrest = whalo - c - w0
                if nrest:
                    win[b, g, pl.ds(c + w0, nrest)] = jnp.zeros(
                        (nrest, span), win.dtype
                    )
        dw_ref[:, :, :] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        for b in range(min(nbuf - 1, nblk)):
            start(b, b)

    @pl.when(i + nbuf - 1 < nblk)
    def _():
        start(i + nbuf - 1, (i + nbuf - 1) % nbuf)

    slot = i % nbuf
    for g in range(3):
        pltpu.make_async_copy(
            _win_src(src, meta_ref[i * 21 + g], span),
            win.at[slot, g, pl.ds(c, w0)],
            sem.at[slot, g],
        ).wait()

    li = li_ref[0]  # (9, 1, B)
    bsz = gyblk_ref.shape[1]

    if cfg["act"]:
        sc = sc_ref[:]
        sh = sh_ref[:]
        for b in range(NBUF):
            @pl.when(slot == b)
            def _(b=b):
                for g in range(3):
                    win[b, g] = jnp.maximum(win[b, g] * sc + sh, 0)

    slot_of = _fwd_slots(identity)
    if identity is not None:
        s8 = slot_of[identity] * bsz
        # tap-validity mask: unlike the forward (whose invalid output lanes
        # are unspecified by contract), dW sums over lanes — a garbage
        # xb x gy product at an invalid lane would pollute the gradient
        vm = (li[identity] != span).astype(gbuf.dtype)  # (1, B)
        if cfg["act"]:
            xb = jnp.maximum(
                xblk_ref[:] * sc_ref[c : c + w0] + sh_ref[c : c + w0], 0
            )
        else:
            xb = xblk_ref[:]
        gbuf[pl.ds(c, w0), pl.ds(s8, bsz)] = xb * vm
        gbuf[pl.ds(0, c), pl.ds(s8, bsz)] = jnp.zeros((c, bsz), gbuf.dtype)
        nrest = whalo - c - w0
        gbuf[pl.ds(c + w0, nrest), pl.ds(s8, bsz)] = jnp.zeros(
            (nrest, bsz), gbuf.dtype
        )
    sites = []
    gstart = 0
    for g in range(3):
        ts = [t for t in (3 * g, 3 * g + 1, 3 * g + 2) if t != identity]
        wdt = len(ts) * bsz
        licat = jnp.concatenate([li[t] for t in ts], axis=-1)  # (1, wdt)
        giota = jax.lax.broadcasted_iota(jnp.int32, (span, wdt), 0)
        oh = (giota == licat).astype(gbuf.dtype)
        for b in range(NBUF):
            sites.append((b, g, ts, oh, gstart, wdt))
        gstart += wdt
    _ladder_dots(win, slot, sites, gbuf, meta_ref, i, identity, span // 128)

    for t in range(9):
        soff = slot_of[t] * bsz
        for gz, zge, r0, krows, mcols in _fwd_band_iter(cfg):
            gsl = gbuf[pl.ds(r0, krows), pl.ds(soff, bsz)]
            gysl = gyblk_ref[pl.ds(gz * zg * cout, mcols)]
            dcon = jax.lax.dot_general(
                gsl, gysl,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (krows, mcols)
            dw_ref[t, :krows, :mcols] += dcon


def _call_dw(x, sc_h, sh_h, gy, meta, li4, m_out, cfg):
    w0, n = x.shape
    blk = cfg["blk_fwd"]
    nblk = m_out // blk
    c, cout = cfg["c"], cfg["cout"]
    whalo, span = cfg["whalo"], cfg["span"]
    ks = fwd_band_slabs(cfg["zg"], cfg["z_stride"])
    identity = cfg["identity"]
    w2 = cfg["nz_out"] * cout

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # src table (manual DMA)
        pl.BlockSpec((1, 9, 1, blk), lambda i, mt: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((whalo, 1), lambda i, mt: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((whalo, 1), lambda i, mt: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((w2, blk), lambda i, mt: (0, i), memory_space=pltpu.VMEM),
    ]
    src = x
    args = [meta, src, li4, sc_h, sh_h, gy]
    if identity is not None:
        in_specs.append(
            pl.BlockSpec((w0, blk), lambda i, mt: (0, i),
                         memory_space=pltpu.VMEM)
        )
        args.append(x)

    def kern(meta_ref, src, li_ref, sc_ref, sh_ref, gyblk_ref, *rest):
        if identity is not None:
            xblk_ref = rest[0]
            rest = rest[1:]
        else:
            xblk_ref = None
        dw_ref, win, gbuf, sem = rest
        _dw_kernel(cfg, meta_ref, src, li_ref, sc_ref, sh_ref, gyblk_ref,
                   xblk_ref, dw_ref, win, gbuf, sem)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((9, ks * c, cfg["zg"] * cout),
                               lambda i, mt: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, 3, whalo, span), x.dtype),
            pltpu.VMEM((whalo, 9 * blk), x.dtype),
            pltpu.SemaphoreType.DMA((NBUF, 3)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((9, ks * c, cfg["zg"] * cout),
                                       jnp.float32),
        interpret=INTERPRET,
    )(*args)


def extract_dw_fwd(dwacc, c, cout, zg, z_stride, dtype):
    """dwacc (9, Ks*c, zg*cout) f32 (fwd band layout) -> dW (3,3,3,c,cout).
    Adjoint of band_fwd_weights: sum each weight over its band placements."""
    ks = fwd_band_slabs(zg, z_stride)
    sel = jnp.asarray(_fwd_band_sel(zg, z_stride), dwacc.dtype)
    d5 = dwacc.reshape(9, ks, c, zg, cout)
    dw = jnp.einsum("dKk,tKiko->dtio", sel, d5)
    return dw.reshape(3, 3, 3, c, cout).astype(dtype)


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------


def _bwd_epilogue(cfg, gout_ref, acc, xr, relu_m, sc_ref, ds_ref, dsh_ref,
                  w0):
    """Write the block's dx and (when ds_ref is set) accumulate the affine
    gradients in-kernel: dx = g_relu * scale-rows, dscale += sum_lanes
    g_relu * x, dshift += sum_lanes g_relu — the lane reductions ride ONE
    tiny (w0, B)x(B, 8) ones-dot each, replacing three full-tensor XLA
    passes per layer (dx scaling + the dscale/dshift reshape-reduces)."""
    gpre = acc[pl.ds(0, w0)]
    if not cfg["act"]:
        gout_ref[pl.ds(0, w0)] = gpre.astype(gout_ref.dtype)
        return
    grl = gpre.astype(xr.dtype) * relu_m  # g_relu, the pre-affine cotangent
    if ds_ref is None:
        gout_ref[pl.ds(0, w0)] = grl.astype(gout_ref.dtype)
        return
    gout_ref[pl.ds(0, w0)] = (grl * sc_ref[:]).astype(gout_ref.dtype)
    ones = jnp.ones((grl.shape[1], 8), grl.dtype)
    ds_ref[:, :] += jax.lax.dot(grl * xr, ones,
                                preferred_element_type=jnp.float32)
    dsh_ref[:, :] += jax.lax.dot(grl, ones,
                                 preferred_element_type=jnp.float32)


def _bwd_kernel(cfg, meta_ref, src, li_ref, sc_ref, sh_ref, wb_ref, xblk_ref,
                gyblk_ref, gout_ref, dw_ref, ds_ref, dsh_ref, win, gbuf, acc,
                xbb, sem, want_dw=True):
    """Gathers gy (the conv output cotangent) by the INVERSE tables, applies
    the transposed band to produce the pre-activation cotangent, multiplies
    by the recomputed relu mask, and accumulates per-tap dW outer products.

    Window scratch rows: haloed gy space (slab h = zo + ht, ht = 1 for
    stride 1, 0 for stride 2); DMA fills rows [ht*cout, ht*cout + nz_out*cout);
    the rest is zero-initialized once at i == 0 (disjoint from DMA rows)."""
    c, cout = cfg["c"], cfg["cout"]
    zg2, s = cfg["zg2"], cfg["z_stride"]
    w2 = cfg["nz_out"] * cout
    w0 = cfg["nz_in"] * c
    identity = cfg["identity"]
    ht = 1 if s == 1 else 0
    k2 = bwd_band_slabs(zg2, s)
    ng2 = cfg["nzp_in"] // zg2
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    nbuf, _, whalo2, span = win.shape
    nsub = span // 128

    @pl.when(i == 0)
    def _():
        # zero halo/pad rows (never DMA'd; disjoint from in-flight DMA rows)
        if ht:
            for b in range(nbuf):
                for g in range(3):
                    win[b, g, pl.ds(0, ht * cout)] = jnp.zeros(
                        (ht * cout, span), win.dtype
                    )
        nrest = whalo2 - ht * cout - w2
        if nrest:
            for b in range(nbuf):
                for g in range(3):
                    win[b, g, pl.ds(ht * cout + w2, nrest)] = jnp.zeros(
                        (nrest, span), win.dtype
                    )
        if want_dw:
            dw_ref[:, :, :] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        if ds_ref is not None:
            ds_ref[:, :] = jnp.zeros(ds_ref.shape, ds_ref.dtype)
            dsh_ref[:, :] = jnp.zeros(dsh_ref.shape, dsh_ref.dtype)

    def start(blk, slot):
        for g in range(3):
            pltpu.make_async_copy(
                _win_src(src, meta_ref[blk * 21 + g], span),
                win.at[slot, g, pl.ds(ht * cout, w2)],
                sem.at[slot, g],
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
            _win_src(src, meta_ref[i * 21 + g], span),
            win.at[slot, g, pl.ds(ht * cout, w2)],
            sem.at[slot, g],
        ).wait()

    bsz = gout_ref.shape[1]
    # recompute xb = relu(bn(x)) for the dW products, and the relu mask
    relu_m = xr = None
    if cfg["act"] or want_dw:
        xr = xblk_ref[:]
        sc = sc_ref[:]
        sh = sh_ref[:]
        pre = xr * sc + sh
        if cfg["act"]:
            xb = jnp.maximum(pre, 0)
            # bf16 cmpf is unsupported on some TPU targets: compare in f32
            relu_m = (pre.astype(jnp.float32) > 0).astype(xr.dtype)
        else:
            xb = pre  # scale/shift are identity when act is off
    if want_dw:
        # TRANSPOSED xb buffer: the dW dots then contract lanes-of-gsl
        # against sublanes-of-xbb (natural MXU orientation) — the previous
        # layout forced a per-dot rhs transpose (45 of them per block;
        # measured ~3.6 ms/layer)
        xbb[:, :] = xb.T

    li = li_ref[0]

    if WIDE_FWD:
        # wide-gather path (see _fwd_kernel): one full-span dot per dy-group
        slot_of = _fwd_slots(identity)
        if identity is not None:
            s8 = slot_of[identity] * bsz
            vm = (li[identity] != span).astype(gbuf.dtype)  # (1, B)
            gbuf[pl.ds(ht * cout, w2), pl.ds(s8, bsz)] = gyblk_ref[:] * vm
            if ht:
                gbuf[pl.ds(0, ht * cout), pl.ds(s8, bsz)] = jnp.zeros(
                    (ht * cout, bsz), gbuf.dtype
                )
            nrest = whalo2 - ht * cout - w2
            if nrest:
                gbuf[pl.ds(ht * cout + w2, nrest), pl.ds(s8, bsz)] = jnp.zeros(
                    (nrest, bsz), gbuf.dtype
                )
        sites = []
        gstart = 0
        for g in range(3):
            ts = [t for t in (3 * g, 3 * g + 1, 3 * g + 2) if t != identity]
            wdt = len(ts) * bsz
            licat = jnp.concatenate([li[t] for t in ts], axis=-1)  # (1, wdt)
            giota = jax.lax.broadcasted_iota(jnp.int32, (span, wdt), 0)
            oh = (giota == licat).astype(gbuf.dtype)
            for b in range(NBUF):
                sites.append((b, g, ts, oh, gstart, wdt))
            gstart += wdt
        _ladder_dots(win, slot, sites, gbuf, meta_ref, i, identity,
                     span // 128)
        for t in range(9):
            soff = slot_of[t] * bsz
            for gz, zg2e, r0, krows, ncols in _bwd_band_iter(cfg):
                gsl = gbuf[pl.ds(r0, krows), pl.ds(soff, bsz)]
                contrib = jax.lax.dot_general(
                    wb_ref[t, :krows, :ncols], gsl,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (zg2e*c, B)
                if t == 0:
                    acc[pl.ds(gz * zg2 * c, ncols)] = contrib
                else:
                    acc[pl.ds(gz * zg2 * c, ncols)] += contrib
                if want_dw and not SKIP_DW:
                    xsl = xbb[:, pl.ds(gz * zg2 * c, ncols)]
                    dcon = jax.lax.dot_general(
                        gsl, xsl,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (krows, ncols)
                    dw_ref[t, :krows, :ncols] += dcon
        _bwd_epilogue(cfg, gout_ref, acc, xr, relu_m,
                      sc_ref, ds_ref, dsh_ref, w0)
        return

    iota = jax.lax.broadcasted_iota(jnp.int32, (span, bsz), 0)

    for t in range(9):
        if t == identity:
            # inverse of the center tap is the identity map: gy's own block,
            # masked by tap validity (li == span marks invalid lanes)
            vm = (li[t] != span).astype(gbuf.dtype)  # (1, B)
            gbuf[pl.ds(ht * cout, w2)] = gyblk_ref[:] * vm
            if ht:
                gbuf[pl.ds(0, ht * cout)] = jnp.zeros((ht * cout, bsz),
                                                      gbuf.dtype)
            nrest = whalo2 - ht * cout - w2
            if nrest:
                gbuf[pl.ds(ht * cout + w2, nrest)] = jnp.zeros((nrest, bsz),
                                                               gbuf.dtype)
        else:
            g = t // 3
            smin = meta_ref[i * 21 + 3 + t]
            smax = meta_ref[i * 21 + 12 + t]
            onehot = (iota == li[t]).astype(gbuf.dtype)
            for b in range(NBUF):
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
        for gz, zg2e, r0, krows, ncols in _bwd_band_iter(cfg):
            gsl = gbuf[pl.ds(r0, krows)]
            contrib = jax.lax.dot_general(
                wb_ref[t, :krows, :ncols], gsl,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (zg2e*c, B)
            if t == 0:
                acc[pl.ds(gz * zg2 * c, ncols)] = contrib
            else:
                acc[pl.ds(gz * zg2 * c, ncols)] += contrib
            if want_dw:
                # dW: gy-buffer group rows (x) TRANSPOSED xb group lanes
                xsl = xbb[:, pl.ds(gz * zg2 * c, ncols)]
                dcon = jax.lax.dot_general(
                    gsl, xsl,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (krows, ncols)
                dw_ref[t, :krows, :ncols] += dcon

    _bwd_epilogue(cfg, gout_ref, acc, xr, relu_m,
                  sc_ref, ds_ref, dsh_ref, w0)


def _call_bwd(gy, x, sc_x, sh_x, wback, meta, li4, m_in, cfg, want_dw=True):
    """gy (nz_out*cout, Mf_out) padded to haloed DMA space by the kernel;
    x (nz_in*c, Mf_in). Output g_relu (nzp_in*c, Mf_in) + dwacc.

    want_dw=False (split backward's dx-only kernel; requires act=False):
    skips the x block input, the xb transpose and the dW lane contractions,
    and returns g_relu alone."""
    w2, n_out = gy.shape
    blk = cfg["blk_bwd"]
    nblk = m_in // blk
    c, cout = cfg["c"], cfg["cout"]
    whalo2, span = cfg["whalo2"], cfg["span_bwd"]
    nzp_in = cfg["nzp_in"]
    zg2 = cfg["zg2"]
    k2 = bwd_band_slabs(zg2, cfg["z_stride"])
    w0 = cfg["nz_in"] * c
    if not want_dw:
        assert not cfg["act"], "dx-only backward requires act=False"

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # gy table
        pl.BlockSpec((1, 9, 1, blk), lambda i, mt: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((w0, 1), lambda i, mt: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((w0, 1), lambda i, mt: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((9, k2 * cout, zg2 * c), lambda i, mt: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    src = gy
    args = [meta, src, li4, sc_x, sh_x, wback]
    if want_dw:
        in_specs.append(
            pl.BlockSpec((w0, blk), lambda i, mt: (0, i),
                         memory_space=pltpu.VMEM)
        )
        args.append(x)
    identity = cfg["identity"]
    if identity is not None:
        in_specs.append(
            pl.BlockSpec((w2, blk), lambda i, mt: (0, i),
                         memory_space=pltpu.VMEM)
        )
        args.append(gy)

    fae = bool(cfg["act"]) and want_dw and FUSED_AFFINE_BWD

    def kern(meta_ref, src, li_ref, sc_ref, sh_ref, wb_ref, *rest):
        if want_dw:
            xblk_ref = rest[0]
            rest = rest[1:]
        else:
            xblk_ref = None
        if identity is not None:
            gyblk_ref = rest[0]
            rest = rest[1:]
        else:
            gyblk_ref = None
        ds_ref = dsh_ref = None
        if want_dw:
            if fae:
                gout_ref, dw_ref, ds_ref, dsh_ref, win, gbuf, acc, xbb, \
                    sem = rest
            else:
                gout_ref, dw_ref, win, gbuf, acc, xbb, sem = rest
        else:
            gout_ref, win, gbuf, acc, sem = rest
            dw_ref = xbb = None
        _bwd_kernel(cfg, meta_ref, src, li_ref, sc_ref, sh_ref, wb_ref,
                    xblk_ref, gyblk_ref, gout_ref, dw_ref, ds_ref, dsh_ref,
                    win, gbuf, acc, xbb, sem, want_dw=want_dw)

    out_specs = [
        pl.BlockSpec((w0, blk), lambda i, mt: (0, i), memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((w0, m_in), gy.dtype)]
    if want_dw:
        out_specs.append(
            pl.BlockSpec((9, k2 * cout, zg2 * c), lambda i, mt: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((9, k2 * cout, zg2 * c), jnp.float32)
        )
    if fae:
        for _ in range(2):  # dscale / dshift lane-sum accumulators
            out_specs.append(
                pl.BlockSpec((w0, 8), lambda i, mt: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((w0, 8), jnp.float32))
    scratch = [
        pltpu.VMEM((NBUF, 3, whalo2, span), gy.dtype),
        pltpu.VMEM((whalo2, 9 * blk if WIDE_FWD else blk), gy.dtype),
        pltpu.VMEM((w0, blk), jnp.float32),
    ]
    if want_dw:
        scratch.append(pltpu.VMEM((blk, w0), gy.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((NBUF, 3)))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        kern,
        grid_spec=gs,
        out_shape=out_shape,
        interpret=INTERPRET,
    )(*args)
    return res if want_dw else res[0]


# --------------------------------------------------------------------------
# pure-XLA reference (CPU / fallback / oracle)
# --------------------------------------------------------------------------


def _ref_fwd(x, scale, shift, w, idxf, nz_in, z_stride, act):
    """Differentiable reference: relu(bn(x)) -> 9 tap gathers -> z-convs.

    x (nz_in*c, Mf_in); scale/shift (c,); w (3,3,3,c,cout); idxf (Mf_out, 9).
    Returns (nz_out*cout, Mf_out)."""
    mf = x.shape[1]
    c = x.shape[0] // nz_in
    cout = w.shape[-1]
    m_out = idxf.shape[0]
    x3 = x.reshape(nz_in, c, mf)
    if act:
        sc = scale.astype(x.dtype)[None, :, None]
        sh = shift.astype(x.dtype)[None, :, None]
        x3 = jax.nn.relu(x3 * sc + sh)
    halo = jnp.pad(x3, ((1, 1), (0, 0), (0, 0))).reshape((nz_in + 2) * c, mf)
    acc = None
    for t in range(9):
        g = _pg._xla_gather_t(halo, idxf[:, t])
        contrib = jax.lax.conv_general_dilated(
            g.reshape(nz_in + 2, c, m_out),
            w[:, t // 3, t % 3],
            window_strides=(z_stride,),
            padding="VALID",
            dimension_numbers=("WCN", "WIO", "WCN"),
        )
        acc = contrib if acc is None else acc + contrib
    nz_out = -(-nz_in // z_stride)
    return acc.reshape(nz_out * cout, m_out).astype(x.dtype)


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------


def _make_cfg(c, cout, nz_in, z_stride, act, identity_tap, spans=None):
    """spans: optional (span_fwd, span_bwd) per-layer override of the
    global SPAN_* knobs — the down stages have very different window
    needs (probe: down2 346, down3 424, down4 723 at blk 128), and one
    shared span either overpays MACs or silently falls back."""
    zg = fwd_group_size(cout)
    nz_out = -(-nz_in // z_stride)
    nzp_out = -(-nz_out // zg) * zg
    ng = nzp_out // zg
    zg_tail = nz_out - (ng - 1) * zg  # in (0, zg]: last fwd group's slabs
    # REAL window rows (z-groups that overrun nz_out are tail-trimmed in the
    # kernel, so the window / wide gather dots never cover group padding)
    whalo = (z_stride * (nz_out - 1) + 3) * c
    zg2 = bwd_group_size(c, z_stride)
    nzp_in = -(-nz_in // zg2) * zg2
    ng2 = nzp_in // zg2
    zg2_tail = nz_in - (ng2 - 1) * zg2
    goff = zg2 if z_stride == 1 else zg2 // 2
    ht = 1 if z_stride == 1 else 0
    whalo2 = max(
        ((ng2 - 1) * goff + bwd_tail_slabs(zg2_tail, z_stride)) * cout,
        (ht + nz_out) * cout,  # must cover the DMA'd gy rows
    )
    groups = DY_GROUPS
    sp_fwd = spans[0] if spans and spans[0] else None
    assert sp_fwd is None or np.isscalar(sp_fwd)
    spans_g = ((sp_fwd or (SPAN_SUBM if z_stride == 1 else SPAN_DOWN)),) * 3
    return dict(
        c=c, cout=cout, nz_in=nz_in, nz_out=nz_out, nzp_out=nzp_out,
        nzp_in=nzp_in, zg=zg, zg2=zg2, zg_tail=zg_tail, zg2_tail=zg2_tail,
        z_stride=z_stride, act=act,
        identity=identity_tap, whalo=whalo, whalo2=whalo2,
        groups=groups, spans_g=spans_g, ne=False,
        span=max(spans_g),
        span_bwd=(spans[1] if spans and spans[1] else
                  (SPAN_SUBM if z_stride == 1 else SPAN_BWD_DOWN)),
        blk_fwd=BLOCK if z_stride == 1 else BLOCK_DOWN,
        blk_bwd=BLOCK_BWD,
    )


def _fwd_vmem_bytes(cfg):
    """Scoped-VMEM model of the fwd kernel call (all in-spec/out-spec blocks
    double-buffered by the Mosaic pipeline + single-buffered scratch)."""
    eb = 2
    blk = cfg["blk_fwd"]
    whalo, span = cfg["whalo"], cfg["span"]
    w0 = cfg["nz_in"] * cfg["c"]
    w2 = cfg["nz_out"] * cfg["cout"]
    ks = fwd_band_slabs(cfg["zg"], cfg["z_stride"])
    return (
        NBUF * len(cfg["groups"]) * whalo * span * eb  # win scratch
        + whalo * (9 * blk if WIDE_FWD else blk) * eb  # gbuf scratch
        + w2 * blk * 4  # f32 acc scratch
        + 2 * 9 * blk * 4  # meta in-spec
        + 2 * 2 * whalo * 128 * eb  # sc/sh (lane-padded) in-specs
        + 2 * 9 * ks * cfg["c"] * cfg["zg"] * cfg["cout"] * eb  # wband in-spec
        + 2 * w2 * blk * eb  # out
        + 2 * w0 * blk * eb  # identity xblk
    )


def _bwd_vmem_bytes(cfg):
    """Scoped-VMEM model of the combined dx+dw backward call."""
    eb = 2
    blk = cfg["blk_bwd"]
    whalo2, span = cfg["whalo2"], cfg["span_bwd"]
    w0 = cfg["nz_in"] * cfg["c"]
    w2 = cfg["nz_out"] * cfg["cout"]
    k2 = bwd_band_slabs(cfg["zg2"], cfg["z_stride"])
    return (
        NBUF * 3 * whalo2 * span * eb  # win scratch
        + whalo2 * (9 * blk if WIDE_FWD else blk) * eb  # gbuf scratch
        + w0 * blk * (4 + eb)  # f32 acc + xbb scratch
        + 2 * (w0 + w0 + w2) * blk * eb  # gout + xblk + gyblk
        + 2 * 9 * cfg["zg2"] * cfg["c"] * k2 * cfg["cout"] * 4  # dwacc out
    )


# Empirical scoped-VMEM budgets (v5e, 16 MB Mosaic default limit), calibrated
# against observed compile outcomes rather than derived — Mosaic adds stack
# overhead the block model cannot see (r5: down4@nz49 fwd modeled 12.34 MB,
# real "Scoped allocation 16.50M exceeded limit"; the nz=40 chain's largest
# modeled fwd 11.64 MB / bwd 15.96 MB both compile):
#   fwd: good <= 11.64 MB, OOM at 12.34 MB  -> budget 11.8 MB
#   bwd: good <= 12.94 MB (nz=40 chain max), OOM at modeled 14.06 MB
#        (stage3/conv1 bwd @ nz=49: "Scoped allocation 16.19M") -> 13.5 MB
FWD_VMEM_BUDGET = int(11.8 * 2**20)
BWD_VMEM_BUDGET = int(13.5 * 2**20)
MIN_BLK = 32


def _fit_blocks(cfg, m_in, m_out):
    """Halve blk_fwd / blk_bwd (down to MIN_BLK) until the modeled scoped-VMEM
    fits the empirical budgets. Mutates and returns cfg; returns None when even
    the smallest blocks do not fit. Large-nz shape classes (the reference
    flagship z range gives nz=49) need this — the window scratch is
    block-size-independent, but every other term scales with blk."""
    while _fwd_vmem_bytes(cfg) > FWD_VMEM_BUDGET:
        if cfg["blk_fwd"] <= MIN_BLK or m_out % (cfg["blk_fwd"] // 2):
            return None
        cfg["blk_fwd"] //= 2
    while _bwd_vmem_bytes(cfg) > BWD_VMEM_BUDGET:
        if cfg["blk_bwd"] <= MIN_BLK or m_in % (cfg["blk_bwd"] // 2):
            return None
        cfg["blk_bwd"] //= 2
    return cfg


def fused_ok(x_shape, dtype, c, cout, m_out, nz_in, z_stride, spans=None):
    """Static gate for the fused kernel path."""
    if INTERPRET:
        pass
    elif jax.default_backend() == "cpu" or dtype != jnp.bfloat16:
        return False
    cfg = _make_cfg(c, cout, nz_in, z_stride, True, None, spans)
    m_in = x_shape[1]
    cfg = _fit_blocks(cfg, m_in, m_out)
    return (
        cfg is not None
        and c % 8 == 0
        and cout % 8 == 0
        and m_in % cfg["blk_bwd"] == 0
        and m_out % cfg["blk_fwd"] == 0
        and m_in >= cfg["span"]
        and m_out >= cfg["span_bwd"]
        and cfg["whalo"] <= 1024
        and cfg["whalo2"] <= 1024
    )


def _affine_rows(scale, shift, nrows, c, row0, nreal, dtype):
    """Tile per-channel (c,) vectors over rows [row0, row0+nreal), zeros
    elsewhere -> (nrows, 1) column vectors for the kernel's window affine."""
    nz = nreal // c
    sc = jnp.tile(scale.astype(dtype), nz)
    sh = jnp.tile(shift.astype(dtype), nz)
    sc = jnp.pad(sc, (row0, nrows - row0 - nreal))
    sh = jnp.pad(sh, (row0, nrows - row0 - nreal))
    return sc[:, None], sh[:, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _fused_core(x, scale, shift, w, idxf, invf, nz_in, z_stride, act,
                identity_tap, spans=None):
    return _fused_fwd_impl(x, scale, shift, w, idxf, nz_in, z_stride, act,
                           identity_tap, spans)


def _fused_fwd_impl(x, scale, shift, w, idxf, nz_in, z_stride, act,
                    identity_tap, spans=None):
    c = x.shape[0] // nz_in
    cout = w.shape[-1]
    cfg = _make_cfg(c, cout, nz_in, z_stride, act, identity_tap, spans)
    m_out = idxf.shape[0]
    cfg = _fit_blocks(cfg, x.shape[1], m_out) or cfg  # mirror fused_ok's blocks
    meta, li4, overflow = _prologue(idxf, x.shape[1], cfg["span"],
                                    cfg["blk_fwd"])
    sc_h, sh_h = _affine_rows(scale, shift, cfg["whalo"], c, c, nz_in * c,
                              x.dtype)
    wband = band_fwd_weights(w, cfg["zg"], z_stride).astype(x.dtype)
    w2 = cfg["nz_out"] * cout

    def fast():
        return _call_fwd(x, sc_h, sh_h, wband, meta, li4, m_out, cfg)

    def slow():
        return _ref_fwd(x, scale, shift, w, idxf, nz_in, z_stride, act)

    if FORCE_PATH == 1:
        return fast()
    if FORCE_PATH == 2:
        return slow()
    return jax.lax.cond(overflow, slow, fast)


def _fused_vjp_fwd(x, scale, shift, w, idxf, invf, nz_in, z_stride, act,
                   identity_tap, spans=None):
    y = _fused_fwd_impl(x, scale, shift, w, idxf, nz_in, z_stride, act,
                        identity_tap, spans)
    return y, (x, scale, shift, w, idxf, invf)


def _mixed_bwd(x, scale, shift, w, idxf, invf, gy, nz_in, z_stride, act,
               identity_tap):
    """Legacy stacked-gather conv backward + affine/relu chain rule.

    Recomputes the applied activation h = relu(x*scale+shift) (one
    elementwise pass; the fused forward never materialized it), runs the
    tuned scatter-free transposed conv backward from pillar_sparse (ONE
    interleaved inverse gather + a single 9*Cout-channel conv transpose),
    then chains dL/dh through the recomputed relu mask and the affine.
    Output-lane validity is recovered from the forward tap table (a lane
    with no live taps is padding). Measured faster than the in-kernel
    fused backward: its dW lane-contractions cost more MXU issue than the
    stack HBM round-trip they avoid (NOTES.md late-r3 kernel arc)."""
    from .pillar_sparse import _core_t_bwd

    c = x.shape[0] // nz_in
    m_in = x.shape[1]
    xdt = x.dtype
    x3 = x.reshape(nz_in, c, m_in)
    if act:
        scb = scale.astype(xdt)[None, :, None]
        shb = shift.astype(xdt)[None, :, None]
        a3 = x3 * scb + shb
        h3 = jnp.maximum(a3, 0)
    else:
        h3 = x3  # act=False contract: raw input, no affine (see _ref_fwd)
    mask_in = (invf >= 0).any(axis=1)
    h3 = jnp.where(mask_in[None, None, :], h3, 0)
    mask_out = (idxf >= 0).any(axis=1)
    res_c = (h3.reshape(nz_in * c, m_in), w.astype(xdt), idxf, invf, mask_out)
    dh, dw, _, _, _ = _core_t_bwd(nz_in, z_stride, identity_tap, res_c, gy)
    dh3 = dh.reshape(nz_in, c, m_in)
    if act:
        dh3 = jnp.where(a3 > 0, dh3, 0)
        dx = (dh3 * scb).reshape(nz_in * c, m_in)
        g3 = dh3.astype(jnp.float32)
        dscale = (g3 * x3.astype(jnp.float32)).sum(axis=(0, 2)).astype(
            scale.dtype)
        dshift = g3.sum(axis=(0, 2)).astype(shift.dtype)
    else:
        dx = dh
        dscale = jnp.zeros_like(scale)
        dshift = jnp.zeros_like(shift)
    return dx.astype(xdt), dscale, dshift, dw.astype(w.dtype)


def _fused_vjp_bwd(nz_in, z_stride, act, identity_tap, spans, res, gy):
    x, scale, shift, w, idxf, invf = res
    c = x.shape[0] // nz_in
    cout = w.shape[-1]
    cfg = _make_cfg(c, cout, nz_in, z_stride, act, identity_tap, spans)
    m_in = x.shape[1]
    cfg = _fit_blocks(cfg, m_in, idxf.shape[0]) or cfg
    w0 = nz_in * c
    gy = gy.astype(x.dtype)

    if MIXED_BWD and FORCE_PATH != 2:
        return _mixed_bwd(x, scale, shift, w, idxf, invf, gy, nz_in,
                          z_stride, act, identity_tap) + (None, None)

    meta2, li42, ovf2 = _prologue(invf, gy.shape[1], cfg["span_bwd"],
                                  cfg["blk_bwd"])

    def fast():
        wback = band_bwd_weights(w, cfg["zg2"], z_stride).astype(x.dtype)
        sc_x, sh_x = _affine_rows(scale, shift, w0, c, 0, w0, x.dtype)
        res_b = _call_bwd(gy, x, sc_x, sh_x, wback, meta2, li42, m_in, cfg)
        if act and FUSED_AFFINE_BWD:
            # kernel already scaled dx and lane-summed the affine grads
            # (every lane of the (w0, 8) ones-dot holds the full lane-sum)
            dx, dwacc, dsacc, dshacc = res_b
            dscale = (dsacc[:, 0].reshape(nz_in, c).sum(0)
                      .astype(scale.dtype))
            dshift = (dshacc[:, 0].reshape(nz_in, c).sum(0)
                      .astype(shift.dtype))
        elif act:
            g_relu, dwacc = res_b
            scr = jnp.tile(scale.astype(x.dtype), nz_in)[:, None]
            dx = g_relu * scr
            g3 = g_relu.astype(jnp.float32).reshape(nz_in, c, m_in)
            x3 = x.astype(jnp.float32).reshape(nz_in, c, m_in)
            dscale = (g3 * x3).sum(axis=(0, 2)).astype(scale.dtype)
            dshift = g3.sum(axis=(0, 2)).astype(shift.dtype)
        else:
            g_relu, dwacc = res_b
            dx = g_relu
            dscale = jnp.zeros_like(scale)
            dshift = jnp.zeros_like(shift)
        dw = extract_dw(dwacc, c, cout, cfg["zg2"], z_stride, w.dtype)
        return dx.astype(x.dtype), dscale, dshift, dw

    def slow():
        _, vjp = jax.vjp(
            lambda x_, s_, b_, w_: _ref_fwd(x_, s_, b_, w_, idxf, nz_in,
                                            z_stride, act),
            x, scale, shift, w,
        )
        return vjp(gy)

    if FORCE_PATH == 1:
        dx, dscale, dshift, dw = fast()
    elif FORCE_PATH == 2:
        dx, dscale, dshift, dw = slow()
    else:
        dx, dscale, dshift, dw = jax.lax.cond(ovf2, slow, fast)
    return dx, dscale, dshift, dw, None, None


_fused_core.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


# --------------------------------------------------------------------------
# split backward: dW-only kernel + independently DCE-able dx kernel
# --------------------------------------------------------------------------
#
# The shared backward kernel amortizes ONE inverse-table gy gather across the
# dx band dots and the dW lane contractions — optimal when both cotangents
# are live. For the backbone's FIRST conv, dx feeds only the (parameterless)
# voxelizer: in ordinary training it is dead, but the FGSM input-gradient
# path (runtime/pseudo_label.make_perturb_step) does need it. Baking a
# "no input grad" flag into the kernel would silently zero those gradients;
# instead the backward is split into two independent pure kernels so the
# tracer/XLA drop the dx one exactly when nothing consumes it:
#   dW: forward-table xb gather + per-band lane contractions (_call_dw) —
#       ~2.5x cheaper than the shared kernel when c < cout's gy space, since
#       the x windows it gathers are c-channel rather than cout.
#   dx: the shared kernel minus dW (want_dw=False).
# Restricted to act=False (the raw-input first layer): with act=True,
# dscale/dshift would need the dx kernel's g_relu output anyway, defeating
# the split.


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _fused_core_split(x, scale, shift, w, idxf, invf, nz_in, z_stride, act,
                      identity_tap, spans=None):
    return _fused_fwd_impl(x, scale, shift, w, idxf, nz_in, z_stride, act,
                           identity_tap, spans)


def _split_vjp_fwd(x, scale, shift, w, idxf, invf, nz_in, z_stride, act,
                   identity_tap, spans=None):
    y = _fused_fwd_impl(x, scale, shift, w, idxf, nz_in, z_stride, act,
                        identity_tap, spans)
    return y, (x, scale, shift, w, idxf, invf)


def _split_vjp_bwd(nz_in, z_stride, act, identity_tap, spans, res, gy):
    x, scale, shift, w, idxf, invf = res
    assert not act, "split backward is raw-input (act=False) only"
    c = x.shape[0] // nz_in
    cout = w.shape[-1]
    cfg = _make_cfg(c, cout, nz_in, z_stride, act, identity_tap, spans)
    m_in = x.shape[1]
    m_out = idxf.shape[0]
    cfg = _fit_blocks(cfg, m_in, m_out) or cfg
    w0 = nz_in * c
    gy = gy.astype(x.dtype)

    # dW from the forward tables (same prologue as the forward pass: CSE'd)
    meta, li4, ovf = _prologue(idxf, m_in, cfg["span"], cfg["blk_fwd"])
    sc_h, sh_h = _affine_rows(scale, shift, cfg["whalo"], c, c, w0, x.dtype)

    def dw_fast():
        dwacc = _call_dw(x, sc_h, sh_h, gy, meta, li4, m_out, cfg)
        return extract_dw_fwd(dwacc, c, cout, cfg["zg"], z_stride, w.dtype)

    def dw_slow():
        _, vjp = jax.vjp(
            lambda w_: _ref_fwd(x, scale, shift, w_, idxf, nz_in, z_stride,
                                act), w)
        return vjp(gy)[0]

    dw = jax.lax.cond(ovf, dw_slow, dw_fast) if FORCE_PATH != 1 else dw_fast()

    # dx as its own kernel/cond subgraph: dropped by DCE when unused
    meta2, li42, ovf2 = _prologue(invf, gy.shape[1], cfg["span_bwd"],
                                  cfg["blk_bwd"])

    def dx_fast():
        wback = band_bwd_weights(w, cfg["zg2"], z_stride).astype(x.dtype)
        sc_x, sh_x = _affine_rows(scale, shift, w0, c, 0, w0, x.dtype)
        return _call_bwd(gy, x, sc_x, sh_x, wback, meta2, li42, m_in, cfg,
                         want_dw=False)

    def dx_slow():
        _, vjp = jax.vjp(
            lambda x_: _ref_fwd(x_, scale, shift, w, idxf, nz_in, z_stride,
                                act), x)
        return vjp(gy)[0]

    dx = jax.lax.cond(ovf2, dx_slow, dx_fast) if FORCE_PATH != 1 else dx_fast()
    return (dx.astype(x.dtype), jnp.zeros_like(scale), jnp.zeros_like(shift),
            dw, None, None)


_fused_core_split.defvjp(_split_vjp_fwd, _split_vjp_bwd)


def fused_bnconv9_t(x, scale, shift, weights, idxf, invf, nz_in, z_stride=1,
                    identity_tap=None, act=True, split_bwd=False, spans=None,
                    ):
    """Fused relu(x*scale+shift) -> 3x3x3 sparse conv, transposed layout.

    Args:
        x: (nz_in*C, Mf_in) RAW activations (pre-BN), z-major rows,
            batch-folded pillars in lanes. NOT halo-padded.
        scale, shift: (C,) BN apply vectors (inference-form affine; the
            caller derives them from batch or running statistics). Pass
            ones/zeros with act=False for the un-normalized first layer.
        weights: (3, 3, 3, C, Cout), (dz, dy, dx) order.
        idxf / invf: (Mf_out, 9) / (Mf_in, 9) folded forward/inverse tap
            tables (-1 = missing), as produced by the pillar backbones.
        nz_in: input z cells (static). z_stride: 1 or 2.
        identity_tap: 4 for stride-1 submanifold convs (center = self).
        act: apply the affine+relu input activation (False for raw inputs).
    Returns y_raw (nz_out*Cout, Mf_out) — unmasked, un-normalized; invalid
    lanes carry unspecified values (taps never read them; consumers mask).

    Differentiable in (x, scale, shift, weights). Falls back to the pure-XLA
    reference when the static gate fails or a window overflows at runtime.
    """
    c = x.shape[0] // nz_in
    cout = weights.shape[-1]
    if not fused_ok(x.shape, x.dtype, c, cout, idxf.shape[0], nz_in, z_stride,
                    spans):
        return _ref_fwd(x, scale, shift, weights, idxf, nz_in, z_stride, act)
    if split_bwd and not act:
        # raw-input first layer: dW-only + DCE-able dx backward (see
        # _fused_core_split); dscale/dshift are zeros — with act=False the
        # affine is the identity constant, not a parameter
        return _fused_core_split(x, scale, shift, weights, idxf, invf, nz_in,
                                 z_stride, act, identity_tap, spans)
    return _fused_core(x, scale, shift, weights, idxf, invf, nz_in, z_stride,
                       act, identity_tap, spans)

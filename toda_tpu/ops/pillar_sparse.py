"""BEV-sparse / z-dense sparse convolution — the TPU-native 3D backbone substrate.

Motivation (measured on v5e, see git history): XLA TPU gathers move whole memory
tiles per row, so voxel-granular gathers with 16-64 byte rows run at ~1-9 GB/s —
two orders of magnitude below HBM bandwidth — and the 27-tap voxel rulebook needs
millions of them. LiDAR occupancy is the loophole: the z extent is tiny (~40
cells) and semi-dense, so we keep z DENSE and make only the BEV plane sparse:

    features: (P, nz, C)  — P active BEV columns (pillars), dense z
    coords:   (P, 2)      — (y, x), sorted by linearized BEV key
    mask:     (P,)

A 3x3x3 submanifold conv then needs only NINE BEV-neighbor gathers with rows of
nz*C*4 bytes (KBs — full-bandwidth gathers), and the z-axis taps become dense
shifted slices feeding one (P*nz, 3C) x (3C, Cout) GEMM per BEV tap — large,
MXU-shaped matmuls.

Semantics vs CUDA spconv: "submanifold in BEV, regular in z" — active sites are
(all z) x (active columns). Contributions from truly-empty voxels are zero
features, so responses at genuinely active voxels match sparse conv exactly on
the first layer; in deeper layers the receptive field grows densely along z
(a superset of spconv's active set within each column). No checkpoint parity is
owed; tests pin the semantics against dense 3D convolution (exact).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_gather import (
    gather9_stacked_t,
    gather_rows,
    gather_rows_taps,
    gather_rows_taps_t,
    scatter_rows_add,
)
from . import pallas_gather as _pg

INT_MAX = jnp.iinfo(jnp.int32).max


def _compact_by_rank(head, rank, skey, max_out):
    """Values of skey at the head rows, compacted to the front in rank
    order: out[p] = skey[row with head & rank==p], -1 where no such row.

    Replaces the head-row scatter `full((max_out,)).at[rows].set(skey)` —
    a 1-element-per-row serial scatter over ALL input rows (~5 ns/row,
    4.8 ms/step at nuScenes scale for the voxelizer alone) — with one
    2-operand compaction sort: ranks are unique, so after sorting by
    (head ? rank : INT_MAX) the p-th row IS pillar p."""
    n = rank.shape[0]
    key3 = jnp.where(head & (rank < max_out), rank, INT_MAX)
    s3k, s3v = jax.lax.sort([key3, skey], num_keys=1, is_stable=False)
    if n < max_out:
        pad = max_out - n
        s3k = jnp.concatenate([s3k, jnp.full((pad,), INT_MAX, s3k.dtype)])
        s3v = jnp.concatenate([s3v, jnp.zeros((pad,), s3v.dtype)])
    return jnp.where(
        s3k[:max_out] == jnp.arange(max_out, dtype=s3k.dtype),
        s3v[:max_out], -1,
    ).astype(jnp.int32)


@partial(jax.jit, static_argnames=("grid_size", "max_pillars", "nz"))
def voxelize_pillars(points, points_mask, voxel_size, pc_range, grid_size, max_pillars, nz):
    """Points -> z-dense pillar grid by per-cell mean.

    Args:
        grid_size: (gx, gy, gz); nz must equal gz (static).
    Returns dict:
        pillar_features: (P, nz, C) mean point features per (column, z-cell)
        pillar_coords: (P, 2) int32 (y, x), -1 padding, ascending BEV key order
        pillar_mask: (P,)
        cell_counts: (P, nz) int32
    """
    gx, gy, gz = grid_size
    assert gz == nz
    p_pts, c = points.shape
    vsize = jnp.asarray(voxel_size, dtype=points.dtype)
    origin = jnp.asarray(pc_range[:3], dtype=points.dtype)
    ijk = jnp.floor((points[:, :3] - origin) / vsize).astype(jnp.int32)
    valid = (
        points_mask
        & (ijk[:, 0] >= 0) & (ijk[:, 0] < gx)
        & (ijk[:, 1] >= 0) & (ijk[:, 1] < gy)
        & (ijk[:, 2] >= 0) & (ijk[:, 2] < gz)
    )
    bev_key = ijk[:, 1] * gx + ijk[:, 0]
    # pack (bev_key, z) into one int32 sort key (bev_key*gz + z < 2^31 for
    # grids up to 1024^2 x ~40) and fold validity into the INT_MAX sentinel —
    # two fewer sort operands, and cells come out z-sorted within each pillar
    packed = jnp.where(valid, bev_key * gz + ijk[:, 2], INT_MAX)

    # multi-operand sort carries the payload through the sort network — a
    # row-gather of 16-byte point rows after argsort measured ~3 GB/s (tiny-row
    # gather pathology), while lax.sort moves payload at full bandwidth.
    cols = [points[:, j] for j in range(c)]
    sorted_ops = jax.lax.sort([packed, *cols], num_keys=1, is_stable=True)
    spacked = sorted_ops[0]
    svalid = spacked != INT_MAX
    skey = jnp.where(svalid, spacked // gz, INT_MAX)
    sz = jnp.where(svalid, spacked % gz, 0)
    spoints = jnp.stack(sorted_ops[1:], axis=-1)

    prev = jnp.concatenate([jnp.array([-1], dtype=skey.dtype), skey[:-1]])
    head = (skey != prev) & svalid
    pillar_idx = jnp.cumsum(head.astype(jnp.int32)) - 1
    ok = svalid & (pillar_idx < max_pillars)

    cell = jnp.where(ok, pillar_idx * nz + sz, max_pillars * nz)
    # NOTE: merging counts into this scatter as a ones-column was measured
    # 2x SLOWER (the c+1-column payload lands in a worse tiling); keep the
    # two scatters separate.
    feat_sum = (
        jnp.zeros((max_pillars * nz, c), dtype=points.dtype)
        .at[cell]
        .add(spoints, mode="drop")
    )
    counts = (
        jnp.zeros((max_pillars * nz,), dtype=jnp.int32).at[cell].add(1, mode="drop")
    )
    feats = feat_sum / jnp.maximum(counts, 1)[:, None].astype(points.dtype)

    key_of = _compact_by_rank(head, pillar_idx, skey, max_pillars)
    pillar_mask = key_of >= 0
    safe = jnp.where(pillar_mask, key_of, 0)
    coords = jnp.where(
        pillar_mask[:, None],
        jnp.stack([safe // gx, safe % gx], axis=-1),
        -1,
    ).astype(jnp.int32)
    return {
        "pillar_features": feats.reshape(max_pillars, nz, c),
        "pillar_coords": coords,
        "pillar_mask": pillar_mask,
        "cell_counts": counts.reshape(max_pillars, nz),
    }


# Packed-lane pallas scatter for the voxelizer means: True on TPU (set by
# voxelize_pillars_batched's caller gate), forceable in tests.
USE_PACKED_VOXEL_SCATTER = None  # None = auto (TPU only)


def _voxelize_cells(points, points_mask, voxel_size, pc_range, grid_size,
                    max_pillars, nz):
    """Per-sample sort + cell assignment (the front half of voxelize_pillars).

    Returns dict with spoints (Np, c) sorted, cell (Np,) ascending (sentinel
    = max_pillars*nz for dropped), ok, and the pillar coords/mask."""
    gx, gy, gz = grid_size
    p_pts, c = points.shape
    vsize = jnp.asarray(voxel_size, dtype=points.dtype)
    origin = jnp.asarray(pc_range[:3], dtype=points.dtype)
    ijk = jnp.floor((points[:, :3] - origin) / vsize).astype(jnp.int32)
    valid = (
        points_mask
        & (ijk[:, 0] >= 0) & (ijk[:, 0] < gx)
        & (ijk[:, 1] >= 0) & (ijk[:, 1] < gy)
        & (ijk[:, 2] >= 0) & (ijk[:, 2] < gz)
    )
    bev_key = ijk[:, 1] * gx + ijk[:, 0]
    packed = jnp.where(valid, bev_key * gz + ijk[:, 2], INT_MAX)
    cols = [points[:, j] for j in range(c)]
    sorted_ops = jax.lax.sort([packed, *cols], num_keys=1, is_stable=True)
    spacked = sorted_ops[0]
    svalid = spacked != INT_MAX
    skey = jnp.where(svalid, spacked // gz, INT_MAX)
    sz = jnp.where(svalid, spacked % gz, 0)
    spoints = jnp.stack(sorted_ops[1:], axis=-1)

    prev = jnp.concatenate([jnp.array([-1], dtype=skey.dtype), skey[:-1]])
    head = (skey != prev) & svalid
    pillar_idx = jnp.cumsum(head.astype(jnp.int32)) - 1
    ok = svalid & (pillar_idx < max_pillars)
    cell = jnp.where(ok, pillar_idx * nz + sz, max_pillars * nz)

    key_of = _compact_by_rank(head, pillar_idx, skey, max_pillars)
    pillar_mask = key_of >= 0
    safe = jnp.where(pillar_mask, key_of, 0)
    coords = jnp.where(
        pillar_mask[:, None], jnp.stack([safe // gx, safe % gx], axis=-1), -1
    ).astype(jnp.int32)
    return {
        "spoints": spoints, "cell": cell, "ok": ok,
        "pillar_coords": coords, "pillar_mask": pillar_mask,
    }


def _bf16_split2(x):
    """f32 -> (hi, lo) bf16 with x ~= hi + lo (16-bit mantissa; exact for
    ints < 2^16 — counts — and <1 mm relative error for coordinate sums)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def voxelize_pillars_batched(points, points_mask, voxel_size, pc_range,
                             grid_size, max_pillars, nz, transposed_cpad=None):
    """Batched voxelize_pillars with a packed-lane pallas scatter for the
    per-cell sums (the .at[cell].add scatter is latency-bound at ~10 ns per
    update row — measured ~21 ms/step at nuScenes scale).

    Pipeline on the sorted per-sample streams:
      1. segmented Hillis-Steele prefix over runs of equal cell id (log2(Np)
         shift-compare-add passes) -> run totals at each run's LAST row;
      2. ONE compaction sort moves run-lasts to the front in cell order
         (<= 1 contribution per cell, so the span-scatter windows are
         bounded by construction — no overflow fallback on dense scenes);
      3. contributions packed 8 cells/row x 16 lanes as 2-way bf16 splits
         (exact for counts, ~2^-16 relative for coordinate sums), scattered
         by ops.pallas_gather.scatter_rows_add with f32 accumulation.
    """
    bt, p_pts, c = points.shape
    gz = grid_size[2]
    parts = jax.vmap(
        lambda p, m: _voxelize_cells(
            p, m, voxel_size, pc_range, grid_size, max_pillars, nz
        )
    )(points, points_mask)
    spoints, cell, ok = parts["spoints"], parts["cell"], parts["ok"]
    ncell = max_pillars * nz

    use_packed = USE_PACKED_VOXEL_SCATTER
    if use_packed is None:
        use_packed = (
            jax.default_backend() not in ("cpu",)
            and c <= 5
            and p_pts % 128 == 0
            and (ncell // 8) % 128 == 0
            and ncell % 8 == 0
        )
    if not use_packed:
        def mean_one(sp, cl, okk):
            feat_sum = (
                jnp.zeros((ncell, c), dtype=points.dtype).at[cl].add(
                    jnp.where(okk[:, None], sp, 0.0), mode="drop")
            )
            counts = jnp.zeros((ncell,), jnp.int32).at[cl].add(
                okk.astype(jnp.int32), mode="drop")
            return feat_sum, counts

        feat_sum, counts = jax.vmap(mean_one)(spoints, cell, ok)
    else:
        # 1) segmented prefix: payload = [features..., 1]
        pay = jnp.concatenate(
            [jnp.where(ok[..., None], spoints, 0.0),
             ok[..., None].astype(points.dtype)], axis=-1
        )  # (bt, Np, c+1)
        cl = jnp.where(ok, cell, -1)
        d = 1
        while d < p_pts:
            same = cl[:, d:] == cl[:, :-d]
            pay = jnp.concatenate(
                [pay[:, :d],
                 pay[:, d:] + jnp.where(same[..., None], pay[:, :-d], 0.0)],
                axis=1,
            )
            d *= 2
        is_last = jnp.concatenate(
            [cl[:, :-1] != cl[:, 1:], jnp.ones((bt, 1), bool)], axis=1
        ) & ok

        # 2) compaction sort: run-lasts to the front in cell order
        key2 = jnp.where(is_last, cl, INT_MAX)
        ops = [key2] + [pay[..., k] for k in range(c + 1)]
        sorted2 = jax.vmap(lambda *a: jax.lax.sort(list(a), num_keys=1))(*ops)
        ckey = sorted2[0]
        cpay = jnp.stack(sorted2[1:], axis=-1)  # (bt, Np, c+1) run totals
        cvalid = ckey != INT_MAX

        # 3) pack 8 cells/row x 16 lanes (2-way bf16 splits of c+1 <= 6 cols)
        tmpl = jnp.zeros((bt, p_pts, 16), jnp.bfloat16)
        for k in range(c + 1):
            hi, lo = _bf16_split2(cpay[..., k])
            tmpl = tmpl.at[..., 2 * k].set(hi).at[..., 2 * k + 1].set(lo)
        lane_grp = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2) // 16
        exp = jnp.where(
            (lane_grp == (ckey % 8)[..., None]) & cvalid[..., None],
            jnp.tile(tmpl, (1, 1, 8)),
            jnp.bfloat16(0),
        )
        rowid = jnp.where(cvalid, ckey // 8, -1)
        from .pallas_gather import scatter_rows_add

        # NOTE on span: the theoretical worst case is 1024 contributions per
        # 128-row output tile (8 cells/row) but post-compaction windows are
        # tiny in practice (p99 ~44 rows at nuScenes scale). The r3 trace
        # showed the fallback firing EVERY step anyway: the overflow check
        # was counting each sample's invalid tail inside sample-boundary
        # tiles (fixed in pallas_gather._scatter_prologue — valid-row
        # clamp). span=1152 measured no faster than the fallback because
        # it never fixed that; 640 + the clamp takes the fast path.
        out = scatter_rows_add(
            exp, rowid, ncell // 8, out_dtype=jnp.float32, span=640
        )  # (bt, ncell/8, 128)
        from .pallas_gather import unpack_pillars_t, unpack_pillars_t_ok

        if transposed_cpad is not None and unpack_pillars_t_ok(
            nz, c, transposed_cpad, max_pillars
        ):
            # fused unpack: pair-sum + count divide + bf16 + transpose +
            # channel pad in ONE kernel pass (the XLA chain below costs 4+
            # relayout passes over 300+ MB, ~35 ms/step at nuScenes scale)
            xt = unpack_pillars_t(out, nz, c, transposed_cpad, max_pillars)
            return {
                "xt": xt,
                "pillar_coords": parts["pillar_coords"],
                "pillar_mask": parts["pillar_mask"],
            }
        # pair-sum the hi+lo bf16 splits in PACKED lane space first: the
        # direct (bt, ncell, 16) reshape + strided sum measured 9.4 + 8.4
        # ms/step at nuScenes scale (two full-tensor relayout passes of the
        # 8x row-expanded f32 tensor); halving lanes before the row
        # expansion quarters the repack traffic
        o4 = out.reshape(bt, ncell // 8, 64, 2)
        s64 = o4[..., 0] + o4[..., 1]  # (bt, R, 64): 8 cells x 8 lanes
        sums = s64.reshape(bt, ncell, 8)
        feat_sum = sums[..., :c]
        counts = jnp.round(sums[..., c]).astype(jnp.int32)

    feats = feat_sum / jnp.maximum(counts, 1)[..., None].astype(points.dtype)
    return {
        "pillar_features": feats.reshape(bt, max_pillars, nz, c),
        "pillar_coords": parts["pillar_coords"],
        "pillar_mask": parts["pillar_mask"],
        "cell_counts": counts.reshape(bt, max_pillars, nz),
    }


@partial(jax.jit, static_argnames=("bev_shape",))
def build_bev_map(coords, mask, bev_shape):
    """(P, 2) (y, x) -> dense (ny, nx) int32 slot map, -1 empty. 4 MB at 1024^2."""
    ny, nx = bev_shape
    flat = coords[:, 0] * nx + coords[:, 1]
    flat = jnp.where(mask & (coords[:, 0] >= 0), flat, ny * nx)
    p = coords.shape[0]
    idx = jnp.arange(p, dtype=jnp.int32)
    m = jnp.full((ny * nx,), -1, dtype=jnp.int32).at[flat].set(idx, mode="drop")
    return m.reshape(ny, nx)


@partial(jax.jit, static_argnames=("bev_shape", "stride"))
def bev_neighbor_idx(out_coords, out_mask, bev_map, bev_shape, stride=1):
    """(P_out, 2) output sites -> (P_out, 9) input slots of the 3x3 BEV taps, -1 missing."""
    ny, nx = bev_shape
    offs = jnp.asarray(
        [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)], dtype=jnp.int32
    )
    base = out_coords * stride  # standard conv correspondence (k=3, p=1)
    nb = base[:, None, :] + offs[None]
    ok = (
        (nb[..., 0] >= 0) & (nb[..., 0] < ny) & (nb[..., 1] >= 0) & (nb[..., 1] < nx)
    ) & out_mask[:, None]
    flat = jnp.where(ok, nb[..., 0] * nx + nb[..., 1], 0)
    idx = bev_map.reshape(-1)[flat]
    return jnp.where(ok, idx, -1)


def invert_neighbor_idx(neighbor_idx, p_in):
    """Generic inverse of per-tap neighbor tables via scatter.

    neighbor_idx (..., P_out, T) -> (..., P_in, T) where inv[i, t] = the j
    with neighbor_idx[j, t] == i, else -1. Valid because each tap's map is
    injective (distinct outputs have distinct tap-t inputs). Slow path — the
    backbone supplies analytic inverses (tap mirroring / coarse searchsorted).
    """
    t = neighbor_idx.shape[-1]
    p_out = neighbor_idx.shape[-2]

    def one(idx):
        j = jnp.arange(p_out, dtype=jnp.int32)
        safe = jnp.where(idx >= 0, idx, p_in)
        return jnp.full((p_in + 1,), -1, jnp.int32).at[safe].set(j, mode="drop")[:p_in]

    flat = neighbor_idx.reshape(-1, p_out, t)
    inv = jax.vmap(jax.vmap(one, in_axes=-1, out_axes=-1))(flat)
    return inv.reshape(neighbor_idx.shape[:-2] + (p_in, t))


def _grouped_gathers(table, idx9, identity_tap):
    """Yield (tap, gathered rows) with taps grouped by BEV row offset (dy):
    a group's 3 taps differ only by +-1 column, so one fused window DMA
    serves all three with a tight (~block-sized) span."""
    out = []
    for grp_base in (0, 3, 6):
        grp = [t for t in range(grp_base, grp_base + 3) if t != identity_tap]
        if not grp:
            continue
        gs = gather_rows_taps(table, idx9[:, :, grp])
        out.extend(zip(grp, gs))
    return out


def _conv_fwd_impl(features, weights, neighbor_idx, out_mask, z_stride, identity_tap):
    bt, p_in, nz, c = features.shape
    p_out = neighbor_idx.shape[1]
    nz_out = -(-nz // z_stride)
    w = (nz + 2) * c
    wpad = -(-w // 128) * 128

    halo = jnp.pad(features, ((0, 0), (0, 0), (1, 1), (0, 0)))
    flat = halo.reshape(bt, p_in, w)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, wpad - w)))

    def tap_conv(g, dy, dx):
        g = g[..., :w].reshape(-1, nz + 2, c)
        # NOTE: no preferred_element_type — its VJP makes an f32 cotangent meet
        # bf16 operands in the conv transpose; TPU MXU accumulates f32 anyway.
        return jax.lax.conv_general_dilated(
            g,
            weights[:, dy, dx],  # (3, C, Cout)
            window_strides=(z_stride,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    acc = None
    for t, g in _grouped_gathers(flat, neighbor_idx, identity_tap):
        contrib = tap_conv(g, *divmod(t, 3))
        acc = contrib if acc is None else acc + contrib
    if identity_tap is not None:
        acc = acc + tap_conv(flat, *divmod(identity_tap, 3))
    acc = acc.reshape(bt, p_out, nz_out, -1)
    return jnp.where(out_mask[:, :, None, None], acc, 0.0)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _pillar_conv3d_core(features, weights, neighbor_idx, inv_idx, out_mask,
                        z_stride, identity_tap):
    return _conv_fwd_impl(features, weights, neighbor_idx, out_mask, z_stride,
                          identity_tap)


def _core_fwd(features, weights, neighbor_idx, inv_idx, out_mask, z_stride,
              identity_tap):
    out = _conv_fwd_impl(features, weights, neighbor_idx, out_mask, z_stride,
                         identity_tap)
    return out, (features, weights, neighbor_idx, inv_idx, out_mask)


def _core_bwd(z_stride, identity_tap, res, ob):
    """Backward with NO scatter: each tap's transpose is a gather by the
    tap's inverse table (the maps are injective), and the gather commutes
    with the per-row z-transpose — so the whole features-cotangent is one
    more fused multi-tap gather on the output cotangent.
    """
    features, weights, neighbor_idx, inv_idx, out_mask = res
    bt, p_in, nz, c = features.shape
    p_out, cout = neighbor_idx.shape[1], weights.shape[-1]
    nz_out = -(-nz // z_stride)
    w = (nz + 2) * c
    wpad = -(-w // 128) * 128
    w2 = nz_out * cout
    w2pad = -(-w2 // 128) * 128

    ob = jnp.where(out_mask[:, :, None, None], ob, 0).astype(features.dtype)
    obflat = jnp.pad(ob.reshape(bt, p_out, w2), ((0, 0), (0, 0), (0, w2pad - w2)))

    def tap_conv_of_g(g_flat2, dy, dx, wts):
        g = g_flat2[..., :w].reshape(-1, nz + 2, c)
        return jax.lax.conv_general_dilated(
            g, wts[:, dy, dx], window_strides=(z_stride,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    g_struct = jax.ShapeDtypeStruct((bt, p_in, wpad), features.dtype)
    halo = jnp.pad(features, ((0, 0), (0, 0), (1, 1), (0, 0)))
    flat = jnp.pad(halo.reshape(bt, p_in, w), ((0, 0), (0, 0), (0, wpad - w)))

    # ---- ONE fused gather of ob by the inverse tables feeds BOTH cotangents:
    #   features: x_bar = sum_t C_t^T(gob_t)   (gather commutes with the
    #       per-row z-transpose, and scatter-by-idx == gather-by-inverse)
    #   weights:  sum_m g_t[m] (x) ob[m] == sum_i x[i] (x) gob_t[i]
    #       (injectivity) — so no forward-gather recompute is needed.
    acc_flat = None
    wbar = jnp.zeros_like(weights)

    def accumulate(t, gob_r, acc_flat, wbar):
        dy, dx = divmod(t, 3)
        fT = jax.linear_transpose(
            lambda gf: tap_conv_of_g(gf, dy, dx, weights), g_struct
        )
        (gbar,) = fT(gob_r)
        acc_flat = gbar if acc_flat is None else acc_flat + gbar
        _, vjp_w = jax.vjp(lambda wt: tap_conv_of_g(flat, dy, dx, wt), weights)
        wbar = wbar + vjp_w(gob_r)[0]
        return acc_flat, wbar

    for t, gob in _grouped_gathers(obflat, inv_idx, identity_tap):
        acc_flat, wbar = accumulate(
            t, gob[..., :w2].reshape(-1, nz_out, cout), acc_flat, wbar
        )
    if identity_tap is not None:
        acc_flat, wbar = accumulate(
            identity_tap, ob.reshape(-1, nz_out, cout), acc_flat, wbar
        )
    fbar = acc_flat[..., :w].reshape(bt, p_in, nz + 2, c)[:, :, 1:-1, :]

    return fbar.astype(features.dtype), wbar, None, None, None


_pillar_conv3d_core.defvjp(_core_fwd, _core_bwd)


# --------------------------------------------------------------------------
# transposed-layout conv: pillars in lanes end to end
# --------------------------------------------------------------------------
#
# XLA's preferred layout for the tiny-C z-convs has the pillar dim MINOR; the
# row-major gather forced a layout conversion on each side of every conv
# (~150 ms/step measured). This path keeps activations as flatT (nz*C, Mf)
# with Mf = batch-folded pillars in lanes: the Pallas gather windows are lane
# slices, the conv runs in its native "WCN" layout, and reshapes between
# layers only split/merge MAJOR dims (free).


def _grouped_gathers_t(tableT, idx9, identity_tap, span=None):
    out = []
    for grp_base in (0, 3, 6):
        grp = [t for t in range(grp_base, grp_base + 3) if t != identity_tap]
        if not grp:
            continue
        gs = gather_rows_taps_t(tableT, idx9[:, grp], span)
        out.extend(zip(grp, gs))
    return out


def _conv_fwd_impl_t(flatT, weights, idxf, maskf, nz, z_stride, identity_tap):
    cout = weights.shape[-1]
    c = flatT.shape[0] // nz
    mf = flatT.shape[1]
    nz_out = -(-nz // z_stride)
    haloT = jnp.pad(flatT, ((c, c), (0, 0)))  # z halo = C rows top/bottom

    # strided (downsample) convs advance input indices at ~stride^2 rows per
    # output row, so their group windows need the wider span
    span = None if z_stride == 1 else 4 * _pg.BLOCK_T
    if (
        z_stride == 1  # strided stacked windows (3x wide span) exceed VMEM
        and c % 16 == 0
        and _pg._pallas_ok_t(flatT.dtype, mf, idxf.shape[0], (nz + 2) * c)
    ):
        # stacked fast path: one kernel gathers all 9 taps ([t][z][c] rows),
        # then ONE conv with (taps, z) as two spatial dims — no add chain,
        # no nine small convs. (The center tap rides the window like any
        # other; the identity shortcut only matters for the backward.
        # c % 16: the per-tap output row ranges must be sublane-tile aligned.)
        stacked = gather9_stacked_t(
            haloT, idxf, span, identity_tap=identity_tap
        )  # (9*(nz+2)*c, Mf_out)
        g4 = stacked.reshape(9, nz + 2, c, -1)
        w9 = weights.transpose(1, 2, 0, 3, 4).reshape(9, 3, c, cout)
        acc = jax.lax.conv_general_dilated(
            g4,
            w9,
            window_strides=(1, z_stride),
            padding="VALID",
            dimension_numbers=("UWCN", "UWIO", "UWCN"),
        )[0]  # (nz_out, Cout, Mf_out)
        acc = jnp.where(maskf[None, None, :], acc, 0.0)
        return acc.reshape(nz_out * cout, -1)

    def tap_conv(gT, dy, dx):
        g3 = gT.reshape(nz + 2, c, -1)  # free: splits the MAJOR dim
        return jax.lax.conv_general_dilated(
            g3,
            weights[:, dy, dx],  # (3, C, Cout)
            window_strides=(z_stride,),
            padding="VALID",
            dimension_numbers=("WCN", "WIO", "WCN"),
        )  # (nz_out, Cout, Mf)

    acc = None
    for t, gT in _grouped_gathers_t(haloT, idxf, identity_tap, span):
        contrib = tap_conv(gT, *divmod(t, 3))
        acc = contrib if acc is None else acc + contrib
    if identity_tap is not None:
        acc = acc + tap_conv(haloT, *divmod(identity_tap, 3))
    acc = jnp.where(maskf[None, None, :], acc, 0.0)
    return acc.reshape(nz_out * cout, -1)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _pillar_conv3d_t_core(flatT, weights, idxf, invf, maskf, nz, z_stride,
                          identity_tap):
    return _conv_fwd_impl_t(flatT, weights, idxf, maskf, nz, z_stride, identity_tap)


def _core_t_fwd(flatT, weights, idxf, invf, maskf, nz, z_stride, identity_tap):
    out = _conv_fwd_impl_t(flatT, weights, idxf, maskf, nz, z_stride, identity_tap)
    return out, (flatT, weights, idxf, invf, maskf)


def _core_t_bwd(nz, z_stride, identity_tap, res, ob):
    """Same scatter-free backward as _core_bwd, in the transposed layout."""
    flatT, weights, idxf, invf, maskf = res
    c = flatT.shape[0] // nz
    cout = weights.shape[-1]
    nz_out = -(-nz // z_stride)
    mf_in = flatT.shape[1]
    mf_out = ob.shape[1]
    w2 = nz_out * cout

    ob = jnp.where(maskf[None, :], ob, 0).astype(flatT.dtype)  # (nz_out*cout, Mf_out)
    haloT = jnp.pad(flatT, ((c, c), (0, 0)))

    if cout % 16 == 0 and _pg._pallas_ok_t(ob.dtype, mf_out, mf_in, w2):
        # stacked backward, mirroring the forward: ONE interleaved inverse
        # gather feeds both cotangents through a single 9*Cout-channel conv.
        #   E(x)[zo, t*cout+co] = C_t(x)[zo, co]  (one conv, output channels
        #   stacked over taps);  x_bar = E^T(gob),  wbar = dE/dW^T(gob)
        # where gob[zo, t*cout+co, i] = ob[zo, co, inv_t(i)].
        gobI = gather9_stacked_t(
            ob, invf, None, cout, identity_tap=identity_tap
        )  # (nz_out*9cout, Mf_in)
        g3 = gobI.reshape(nz_out, 9 * cout, mf_in)
        w_e = weights.transpose(0, 3, 1, 2, 4).reshape(3, c, 9 * cout)

        def conv_e(xflat, wts):
            return jax.lax.conv_general_dilated(
                xflat.reshape(nz + 2, c, -1), wts, window_strides=(z_stride,),
                padding="VALID", dimension_numbers=("WCN", "WIO", "WCN"),
            )

        fT = jax.linear_transpose(
            lambda xf: conv_e(xf, w_e),
            jax.ShapeDtypeStruct(((nz + 2) * c, mf_in), flatT.dtype),
        )
        (acc,) = fT(g3)
        _, vjp_we = jax.vjp(lambda wts: conv_e(haloT, wts), w_e)
        wbar_e = vjp_we(g3)[0]  # (3, c, 9cout)
        wbar = wbar_e.reshape(3, c, 3, 3, cout).transpose(0, 2, 3, 1, 4)
        fbar = acc[c:-c, :]
        return fbar.astype(flatT.dtype), wbar, None, None, None

    def tap_conv(gT, dy, dx, wts):
        g3 = gT.reshape(nz + 2, c, -1)
        return jax.lax.conv_general_dilated(
            g3, wts[:, dy, dx], window_strides=(z_stride,), padding="VALID",
            dimension_numbers=("WCN", "WIO", "WCN"),
        )

    g_struct = jax.ShapeDtypeStruct(((nz + 2) * c, mf_in), flatT.dtype)
    acc = None
    wbar = jnp.zeros_like(weights)

    def accumulate(t, gob3, acc, wbar):
        dy, dx = divmod(t, 3)
        fT = jax.linear_transpose(lambda gf: tap_conv(gf, dy, dx, weights), g_struct)
        (gbar,) = fT(gob3)
        acc = gbar if acc is None else acc + gbar
        _, vjp_w = jax.vjp(lambda wt: tap_conv(haloT, dy, dx, wt), weights)
        wbar = wbar + vjp_w(gob3)[0]
        return acc, wbar

    for t, gob in _grouped_gathers_t(ob, invf, identity_tap):
        acc, wbar = accumulate(t, gob.reshape(nz_out, cout, mf_in), acc, wbar)
    if identity_tap is not None:
        acc, wbar = accumulate(identity_tap, ob.reshape(nz_out, cout, -1), acc, wbar)
    fbar = acc[c:-c, :]  # un-halo

    return fbar.astype(flatT.dtype), wbar, None, None, None


_pillar_conv3d_t_core.defvjp(_core_t_fwd, _core_t_bwd)


def pillar_conv3d_t(flatT, idxf, weights, maskf, nz, z_stride=1,
                    identity_tap=None, inv_idx_f=None):
    """Transposed-layout 3x3x3 conv.

    Args:
        flatT: (nz*C, Mf) activations, Mf = batch-folded pillars in lanes
        idxf: (Mf_out, 9) batch-folded per-tap neighbor tables (-1 missing)
        weights: (3, 3, 3, C, Cout) (dz, dy, dx)
        maskf: (Mf_out,)
        nz: z cells (static)
        inv_idx_f: (Mf_in, 9) folded inverse tables (required for the fast
            custom-VJP backward; derived by scatter when absent)
    Returns (nz_out*Cout, Mf_out).
    """
    if inv_idx_f is None:
        inv = invert_neighbor_idx(idxf[None], flatT.shape[1])[0]
    else:
        inv = inv_idx_f
    return _pillar_conv3d_t_core(
        flatT, weights, idxf, inv, maskf, nz, z_stride, identity_tap
    )


def pillar_conv3d(features, neighbor_idx, weights, out_mask, z_stride=1,
                  identity_tap=None, inv_neighbor_idx=None):
    """3x3x3 conv: 9 wide-row BEV gathers + z-window slices + 9 GEMMs.

    Args:
        features: (P_in, nz, C) or batched (B, P_in, nz, C)
        neighbor_idx: (P_out, 9) / (B, P_out, 9) into P_in (-1 = missing)
        weights: (3, 3, 3, C, Cout) in (dz, dy, dx) order
        out_mask: (P_out,) / (B, P_out)
        z_stride: 1 or 2 (z downsampling; SAME-style pad 1)
        identity_tap: tap index whose neighbor map is the identity (the center
            tap of a stride-1 submanifold conv) — skips that gather entirely.
        inv_neighbor_idx: (P_in, 9) / (B, P_in, 9) per-tap inverse tables
            (inv[i, t] = j with neighbor_idx[j, t] == i). Derived by scatter
            when absent; the backbone passes analytic inverses (mirrored taps
            for submanifold convs, coarse searchsorted for strided ones).
    Returns: (P_out, nz_out, Cout) / (B, ...), nz_out = ceil(nz / z_stride)

    The gathers ride ops/pallas_gather.gather_rows_taps: per-tap neighbor
    indices are monotone over the key-sorted pillar sets, so each 128-row
    block of ALL NINE taps reads one contiguous window — one span-DMA + nine
    one-hot MXU matmuls instead of XLA's ~60 ns/row serial gathers. The
    backward pass is the same shape (see _core_bwd): no scatter anywhere.
    Rows are padded to a lane multiple (128) because Mosaic HBM slices must
    be lane-aligned; the conv's GEMM never sees the pad.

    Replaces spconv's CUDA rulebook gather-GEMM-scatter (reference
    pcdet/models/backbones_3d/spconv_backbone.py via spconv.SubMConv3d).
    """
    if features.ndim == 3:  # unbatched convenience form (tests, small tools)
        return pillar_conv3d(
            features[None],
            neighbor_idx[None],
            weights,
            out_mask[None],
            z_stride,
            identity_tap,
            None if inv_neighbor_idx is None else inv_neighbor_idx[None],
        )[0]
    if inv_neighbor_idx is None:
        inv_neighbor_idx = invert_neighbor_idx(neighbor_idx, features.shape[1])
    return _pillar_conv3d_core(
        features, weights, neighbor_idx, inv_neighbor_idx, out_mask,
        z_stride, identity_tap,
    )


@partial(jax.jit, static_argnames=("stride", "max_out", "bev_shape"))
def bev_downsample_sites(coords, mask, stride, max_out, bev_shape):
    """Occupied coarse BEV cells, ascending key order (same convention as
    sparse_ops.sparse_downsample_sites, 2D)."""
    ny, nx = bev_shape
    oy, ox = -(-ny // stride), -(-nx // stride)
    coarse = jnp.where(mask[:, None], coords // stride, -1)
    key = coarse[:, 0] * ox + coarse[:, 1]
    key = jnp.where(mask, key, INT_MAX)
    skey = jnp.sort(key)
    prev = jnp.concatenate([jnp.array([-1], dtype=skey.dtype), skey[:-1]])
    head = (skey != prev) & (skey != INT_MAX)
    out_idx = jnp.cumsum(head.astype(jnp.int32)) - 1
    uniq = _compact_by_rank(head, out_idx, skey, max_out)
    out_mask = uniq >= 0
    safe = jnp.where(out_mask, uniq, 0)
    out_coords = jnp.where(
        out_mask[:, None], jnp.stack([safe // ox, safe % ox], axis=-1), -1
    ).astype(jnp.int32)
    return out_coords, out_mask


@partial(jax.jit, static_argnames=("bev_shape",))
def pillars_to_dense(features, coords, mask, bev_shape):
    """(P, nz, C) -> (ny, nx, nz, C) dense."""
    ny, nx = bev_shape
    p, nz, c = features.shape
    flat = jnp.where(mask & (coords[:, 0] >= 0), coords[:, 0] * nx + coords[:, 1], ny * nx)
    dense = (
        jnp.zeros((ny * nx, nz, c), dtype=features.dtype)
        .at[flat]
        .set(features, mode="drop")
    )
    return dense.reshape(ny, nx, nz, c)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dense_scatter_diff(featflat, flat, n):
    """Sorted-unique-key scatter to a dense table via the span kernel.
    (bt, P, W), (bt, P) -> (bt, n, W); -1 keys dropped. The .at[].set
    form lowered to ~4.5 ms/step of XLA scatter fusions (fwd + u32 bwd)
    at bench scale; keys are sorted so the Pallas span scatter applies,
    and the exact VJP is a row gather."""
    return scatter_rows_add(featflat, flat, n)


def _dense_scatter_fwd(featflat, flat, n):
    return scatter_rows_add(featflat, flat, n), flat


def _dense_scatter_bwd(n, flat, gbar):
    return gather_rows(gbar, flat), None


_dense_scatter_diff.defvjp(_dense_scatter_fwd, _dense_scatter_bwd)


def pillars_to_dense_batched(features, coords, mask, bev_shape):
    """(Bt, P, nz, C) -> (Bt, ny, nx, nz, C) dense, span-kernel scatter.

    Pillar keys are sorted and unique per sample by construction, so
    scatter-add equals scatter-set and the monotone span property holds."""
    ny, nx = bev_shape
    bt, p, nz, c = features.shape
    flat = jnp.where(
        mask & (coords[..., 0] >= 0),
        coords[..., 0] * nx + coords[..., 1],
        -1,
    ).astype(jnp.int32)
    dense = _dense_scatter_diff(
        features.reshape(bt, p, nz * c), flat, ny * nx
    )
    return dense.reshape(bt, ny, nx, nz, c).astype(features.dtype)


def _merge_ranks_multi(segments):
    """Rank queries among keys for SEVERAL independent (key, enc, kmax)
    problems with ONE lax.sort pair (sorts are fixed-cost-heavy on TPU; a
    merged sort of n1+n2 elements beats two sorts). Each segment's values are
    offset into a disjoint range, so ranks separate per segment after the
    global cumsum: rank_in_segment = global_key_rank - #keys of earlier
    segments. Returns a list of per-segment query ranks."""
    if RANK_VIA_SEARCHSORTED:
        return [_merge_ranks(key, enc, kmax) for key, enc, kmax in segments]
    vals, slots = [], []
    sizes = []
    offset = 0
    keys_before = []
    nkeys_cum = 0
    for key, enc, kmax in segments:
        stride = 2 * kmax + 4
        kenc = jnp.where(key == INT_MAX, stride - 1, 2 * key + 1)
        seg_vals = jnp.concatenate([kenc, jnp.clip(enc, 0, stride - 2)])
        vals.append(seg_vals + offset)
        sizes.append((key.shape[0], enc.shape[0]))
        keys_before.append(nkeys_cum)
        nkeys_cum += key.shape[0]
        offset += stride
    allv = jnp.concatenate(vals)
    n = allv.shape[0]
    slots = jnp.arange(n, dtype=jnp.int32)
    svals, sslots = jax.lax.sort([allv, slots], num_keys=1, is_stable=True)
    iskey = (svals & 1).astype(jnp.int32)
    ranks = jnp.cumsum(iskey) - iskey
    _, ranks_un = jax.lax.sort([sslots, ranks], num_keys=1)
    out = []
    pos = 0
    for (nk, nq), kb in zip(sizes, keys_before):
        pos += nk
        out.append(ranks_un[pos : pos + nq] - kb)
        pos += nq
    return out


# 1 = rank queries among keys via jnp.searchsorted (one binary-search
# fusion) instead of the merge-sort pair. Keys are already sorted and the
# parity encoding makes left==right, so both are exact; which is faster is
# hardware-dependent (sorts are fixed-cost-heavy, searchsorted is
# latency-bound) — A/B on chip via this knob.
RANK_VIA_SEARCHSORTED = int(os.environ.get("TODA_RANK_SEARCHSORTED", "0"))
# down-table rank-window geometry (bev_down_tables_batched): span of the
# windowed compare-count and queries per block. Work scales with span.
RANK_SPAN_DOWNF = int(os.environ.get("TODA_RANK_SPAN_DOWNF", "704"))
RANK_SPAN_DOWNI = int(os.environ.get("TODA_RANK_SPAN_DOWNI", "384"))
RANK_QBLK_DOWN = int(os.environ.get("TODA_RANK_QBLK_DOWN", "128"))


def _merge_ranks(key, enc, kmax):
    """Rank encoded queries among the sorted keys WITHOUT scalar gathers.

    key (P,) int32 ascending, INT_MAX = padding; enc (Q,) EVEN encodes where
    rank(2q) = #keys < q. Implementation: parity-encode keys (2k+1) and merge
    with the query encodes in ONE lax.sort; ranks are an exclusive cumsum of
    the key flags; un-permute with a second sort. Everything rides lax.sort
    (vectorized radix) — no element gathers/scatters, which are latency-bound
    at ~10 ns/element on TPU. Callers exploit left(q+1) == right(q) to cover
    triplets of consecutive queries with 4 encodes instead of 6.
    """
    p, q = key.shape[0], enc.shape[0]
    kenc = jnp.where(key == INT_MAX, 2 * kmax + 3, 2 * key + 1)
    encc = jnp.clip(enc, 0, 2 * kmax + 2)
    if RANK_VIA_SEARCHSORTED:
        # keys odd / queries even -> no ties; #kenc < enc == #key < enc//2
        return jnp.searchsorted(kenc, encc, side="left").astype(jnp.int32)
    vals = jnp.concatenate([kenc, encc])
    slots = jnp.arange(p + q, dtype=jnp.int32)
    svals, sslots = jax.lax.sort([vals, slots], num_keys=1, is_stable=True)
    iskey = (svals & 1).astype(jnp.int32)
    ranks = jnp.cumsum(iskey) - iskey
    _, ranks_un = jax.lax.sort([sslots, ranks], num_keys=1)
    return ranks_un[p:]


def _window_ranks(key, enc2d, kmax, span, qblk=128):
    """Windowed rank count: for each query column (ascending over sites),
    rank = #key-encodes < enc, counted inside a span-window of the sorted
    key array around a coarse-estimated start. Replaces the lax.sort pair of
    _merge_ranks (the sorts measured ~33 ms/step combined at nuScenes bs8)
    with pure fused compare-reduces + one tiny one-hot window dot.

    key (P,) i32 ascending, INT_MAX = pad; enc2d (Q, S) EVEN encodes (query
    q -> 2q). Returns (ranks (Q, S) i32, overflow bool). Exact whenever
    every query's rank lies within [64*t, 64*t + span) of its block's
    coarse start t — `overflow` reports violations at runtime so callers
    can lax.cond into the exact sort path.

    Why exact: with t = #(coarse < block_min) over coarse = kenc[63::64],
    all keys at index < 64*t are < block_min <= q (keys ascending), so they
    are all counted by the 64*t base; the window covers indices
    [64*t, 64*t+span); `covered` certifies no key beyond the window is < q.
    """
    p = key.shape[0]
    q_, s = enc2d.shape
    sent = 2 * kmax + 3
    kenc = jnp.where(key == INT_MAX, sent, 2 * key + 1)
    q = jnp.clip(enc2d, 0, 2 * kmax + 2)
    nw = span // 64
    k64 = jnp.pad(kenc.reshape(p // 64, 64), ((0, nw - 1), (0, 0)),
                  constant_values=sent)
    win_tab = jnp.concatenate(
        [k64[j : j + p // 64] for j in range(nw)], axis=1
    ).astype(jnp.float32)  # (p/64, span); encodes < 2^24 are exact in f32
    coarse = kenc[63::64]  # (p/64,)
    nqb = q_ // qblk
    qb = q.reshape(nqb, qblk, s)
    qmin = qb.min(axis=1)  # (nqb, s) — NOT row 0: clipped invalid tails may
    qmax = qb.max(axis=1)  # break per-block ascending order
    t = jnp.sum(coarse[None, None, :] < qmin[:, :, None], axis=-1)
    lo = jnp.minimum(t, p // 64 - 1).astype(jnp.int32)
    # window rows via one-hot f32 dot (row gathers are latency-bound ~60ns).
    # HIGHEST precision: the default TPU f32 dot is a single bf16 pass,
    # which would round the ~2^21 key encodes (measured: silently wrong
    # ranks, overflow check fooled too)
    oh = (lo.reshape(-1)[:, None]
          == jnp.arange(p // 64, dtype=jnp.int32)[None]).astype(jnp.float32)
    win = jax.lax.dot(oh, win_tab,
                      precision=jax.lax.Precision.HIGHEST
                      ).reshape(nqb, s, span)
    qf = qb.astype(jnp.float32)
    cnt = jnp.sum(
        (win[:, None, :, :] < qf[:, :, :, None]), axis=-1, dtype=jnp.int32
    )  # (nqb, 128, s)
    ranks = 64 * lo[:, None, :] + cnt
    covered = (qmax <= win[..., -1]) | (64 * lo + span >= p)
    return ranks.reshape(q_, s), ~jnp.all(covered)


def _ranks_auto(key, enc2d, kmax, span):
    """_merge_ranks semantics for per-column query matrices: windowed count
    when shapes allow, exact sort fallback on window overflow."""
    q_, s = enc2d.shape
    if q_ % 128 != 0 or key.shape[0] % 64 != 0 or key.shape[0] < span:
        return _merge_ranks(key, enc2d.reshape(-1), kmax).reshape(q_, s)
    ranks, overflow = _window_ranks(key, enc2d, kmax, span)
    return jax.lax.cond(
        overflow,
        lambda: _merge_ranks(key, enc2d.reshape(-1), kmax).reshape(q_, s),
        lambda: ranks,
    )


def _ranks_of_queries(key, nbkey, kmax):
    """(left, right) ranks of each query: #keys < q and #keys <= q."""
    q = 2 * jnp.clip(nbkey, 0, kmax)
    r = _merge_ranks(key, jnp.concatenate([q, q + 2]), kmax)
    n = nbkey.shape[0]
    return r[:n], r[n:]


def _tap_offsets():
    return jnp.asarray(
        [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)], dtype=jnp.int32
    )


def _ranks_auto_batched(keys, enc3, kmax, span, qblk=128):
    """Batched _merge_ranks semantics: keys (B, P), enc3 (B, Q, S) with each
    query column ascending per sample. ONE overflow cond across the whole
    batch — crucially NOT under vmap (lax.cond under vmap lowers to select
    and executes BOTH branches, paying the sorts AND the windows).
    qblk: queries per window block — smaller blocks need smaller spans and
    the compare-count work scales with qblk*span per block."""
    b, q_, s = enc3.shape
    p = keys.shape[1]

    def slow():
        return jax.vmap(
            lambda k, e: _merge_ranks(k, e.reshape(-1), kmax).reshape(q_, s)
        )(keys, enc3)

    if q_ % qblk != 0 or p % 64 != 0 or p < span:
        return slow()
    ranks, ovf = jax.vmap(lambda k, e: _window_ranks(k, e, kmax, span, qblk))(
        keys, enc3)
    return jax.lax.cond(jnp.any(ovf), slow, lambda: ranks)


def _subm_parts(in_coords, in_mask, out_coords, out_mask, bev_shape, stride,
                subm):
    """Per-sample elementwise half of bev_neighbor_idx_sorted: key array,
    rank-query encodes, and tap validity (vmappable, no sort/cond)."""
    ny, nx = bev_shape
    key = jnp.where(
        in_mask, in_coords[:, 0] * nx + in_coords[:, 1], INT_MAX
    ).astype(jnp.int32)
    offs = _tap_offsets()
    base = out_coords * stride
    nb = base[:, None, :] + offs[None]
    ok = (
        (nb[..., 0] >= 0) & (nb[..., 0] < ny) & (nb[..., 1] >= 0) & (nb[..., 1] < nx)
    ) & out_mask[:, None]
    dys = (-1, 1) if subm else (-1, 0, 1)
    # per dy the three column taps query CONSECUTIVE keys (q-1, q, q+1), so
    # left(q+1) == right(q) and 4 encodes {2q-2, 2q, 2q+2, 2q+4} rank the
    # whole triplet
    base_key = out_coords[:, 0] * stride * nx + out_coords[:, 1] * stride
    encs = []
    for dy in dys:
        q = base_key + dy * nx
        encs.append(jnp.stack([2 * q - 2, 2 * q, 2 * q + 2, 2 * q + 4], axis=1))
    enc = jnp.stack(encs, axis=1)  # (P_out, ndy, 4)
    return key, enc, ok


def _subm_assemble(r, key, ok, out_mask, stride, subm):
    """Per-sample assembly half: ranks -> (P_out, 9) neighbor table."""
    dys = (-1, 1) if subm else (-1, 0, 1)
    p_in = key.shape[0]
    cols = {}
    for j, dy in enumerate(dys):
        for k, dx in enumerate((-1, 0, 1)):
            t = (dy + 1) * 3 + (dx + 1)
            hit = r[:, j, k + 1] > r[:, j, k]
            cols[t] = jnp.where(ok[:, t] & hit, r[:, j, k], -1).astype(jnp.int32)
    if subm:
        # center = self; +-1 column = shift-compare against the adjacent slot
        iota = jnp.arange(p_in, dtype=jnp.int32)
        cols[4] = jnp.where(out_mask, iota, -1)
        adj = key[1:] == key[:-1] + 1
        nxt_hit = jnp.concatenate([adj, jnp.zeros((1,), bool)])
        prv_hit = jnp.concatenate([jnp.zeros((1,), bool), adj])
        cols[5] = jnp.where(ok[:, 5] & nxt_hit, iota + 1, -1)
        cols[3] = jnp.where(ok[:, 3] & prv_hit, iota - 1, -1)
    return jnp.stack([cols[t] for t in range(9)], axis=1)


@partial(jax.jit, static_argnames=("bev_shape", "stride"))
def bev_neighbor_idx_sorted_batched(in_coords, in_mask, out_coords, out_mask,
                                    bev_shape, stride=1):
    """Batched neighbor tables (leading batch dim on every array arg): the
    rank stage runs once over the batch with a single overflow cond (see
    _ranks_auto_batched). Same semantics as vmap(bev_neighbor_idx_sorted)."""
    ny, nx = bev_shape
    subm = stride == 1 and out_coords.shape[1] == in_coords.shape[1]
    key, enc, ok = jax.vmap(
        lambda ic, im, oc, om: _subm_parts(ic, im, oc, om, bev_shape, stride,
                                           subm)
    )(in_coords, in_mask, out_coords, out_mask)
    b, po, ndy, four = enc.shape
    # spans: measured per-128-query rank spreads (tools/probe_group_spans.py
    # need8) + 64 alignment slack; overflow falls back to the exact sort
    r = _ranks_auto_batched(key, enc.reshape(b, po, ndy * 4), ny * nx,
                            192 if stride == 1 else 448,
                            qblk=64)
    r = r.reshape(b, po, ndy, 4)
    return jax.vmap(
        lambda rr, kk, oo, om: _subm_assemble(rr, kk, oo, om, stride, subm)
    )(r, key, ok, out_mask)


@partial(jax.jit, static_argnames=("bev_shape", "stride"))
def bev_neighbor_idx_sorted(in_coords, in_mask, out_coords, out_mask, bev_shape,
                            stride=1):
    """Neighbor table via windowed rank counts on the (sorted) input BEV keys.

    Replaces build_bev_map + bev_neighbor_idx: the dense (ny*nx) slot map costs
    a large scatter and a tiny-element gather (both latency-bound); ranks ride
    _window_ranks (fused compare-counts; exact sort fallback on window
    overflow). For the submanifold case (stride 1, identical sets) the center
    tap is the identity and the +-1-column taps are shift-compares, so only
    the six row taps need ranks. Requires in_coords ascending by BEV key (the
    voxelizer/downsampler convention). Batched callers should prefer
    bev_neighbor_idx_sorted_batched (single overflow cond, no cond-under-vmap
    double evaluation).
    """
    return bev_neighbor_idx_sorted_batched(
        in_coords[None], in_mask[None], out_coords[None], out_mask[None],
        bev_shape, stride)[0]


def _inv_parts(coarse_coords, coarse_mask, fine_coords, fine_mask,
               coarse_bev_shape):
    """Per-sample elementwise half of bev_inv_neighbor_idx_sorted."""
    ny, nx = coarse_bev_shape
    key = jnp.where(
        coarse_mask, coarse_coords[:, 0] * nx + coarse_coords[:, 1], INT_MAX
    ).astype(jnp.int32)
    offs = jnp.asarray(
        [(dy, dx) for dy in (0, 1, 2) for dx in (0, 1, 2)], dtype=jnp.int32
    )
    num = fine_coords[:, None, :] - (offs[None] - 1)  # 2*coarse = fine - (d-1)
    integral = (num % 2 == 0).all(axis=-1)
    o = num // 2
    ok = (
        integral
        & (o[..., 0] >= 0) & (o[..., 0] < ny) & (o[..., 1] >= 0) & (o[..., 1] < nx)
        & fine_mask[:, None]
    )
    # per dy, the (<=2) integral x-candidates are CONSECUTIVE coarse keys
    # (fx odd -> (fx-1)/2 and (fx+1)/2; fx even -> fx/2), so one triplet of
    # encodes {2q0, 2q0+2, 2q0+4} with q0 = oy*nx + (fx-1)//2 ranks them all
    fx = fine_coords[:, 1]
    o0x = (fx - 1) // 2
    encs = []
    for dy in (0, 1, 2):
        oy = (fine_coords[:, 0] - (dy - 1)) // 2
        q0 = oy * nx + o0x
        encs.append(jnp.stack([2 * q0, 2 * q0 + 2, 2 * q0 + 4], axis=1))
    enc = jnp.stack(encs, axis=1)  # (P_f, 3, 3)
    return key, enc, ok, o, o0x


def _inv_assemble(r, ok, o, o0x):
    cols = []
    for t in range(9):
        dy, dx = divmod(t, 3)
        ox = o[:, t, 1]
        sel = jnp.clip(ox - o0x, 0, 1)  # which consecutive candidate
        left = jnp.where(sel == 0, r[:, dy, 0], r[:, dy, 1])
        right = jnp.where(sel == 0, r[:, dy, 1], r[:, dy, 2])
        cols.append(jnp.where(ok[:, t] & (right > left), left, -1).astype(jnp.int32))
    return jnp.stack(cols, axis=1)


@partial(jax.jit, static_argnames=("coarse_bev_shape",))
def bev_inv_neighbor_idx_sorted_batched(coarse_coords, coarse_mask,
                                        fine_coords, fine_mask,
                                        coarse_bev_shape):
    """Batched transposed-conv table (see bev_inv_neighbor_idx_sorted)."""
    ny, nx = coarse_bev_shape
    key, enc, ok, o, o0x = jax.vmap(
        lambda cc, cm, fc, fm: _inv_parts(cc, cm, fc, fm, coarse_bev_shape)
    )(coarse_coords, coarse_mask, fine_coords, fine_mask)
    b, pf = enc.shape[:2]
    r = _ranks_auto_batched(key, enc.reshape(b, pf, 9), ny * nx, 256,
                            qblk=64)
    return jax.vmap(_inv_assemble)(r.reshape(b, pf, 3, 3), ok, o, o0x)


@partial(jax.jit, static_argnames=("coarse_bev_shape",))
def bev_inv_neighbor_idx_sorted(coarse_coords, coarse_mask, fine_coords, fine_mask,
                                coarse_bev_shape):
    """Transposed-conv neighbor table: for each FINE site, the coarse input
    slots of the 9 (dy, dx) taps of a k=3 s=2 p=1 conv — slot valid only when
    fine = 2*coarse + d - 1 has an integral, in-bounds, active coarse solution.

    Used by the UNet decoder's inverse sparse conv (reference
    spconv.SparseInverseConv3d in pcdet/models/backbones_3d/spconv_unet.py).
    Returns (P_fine, 9) int32, -1 = missing.
    """
    return bev_inv_neighbor_idx_sorted_batched(
        coarse_coords[None], coarse_mask[None], fine_coords[None],
        fine_mask[None], coarse_bev_shape)[0]


@partial(jax.jit, static_argnames=("bev_shape", "coarse_bev_shape"))
def bev_down_tables_batched(fine_coords, fine_mask, coarse_coords, coarse_mask,
                            bev_shape, coarse_bev_shape):
    """Both downsample-stage tables — the k=3 s=2 forward neighbor table
    (coarse outputs -> fine inputs) AND its inverse (fine -> coarse slots of
    the transposed conv) — from windowed rank counts (sort-free; exact
    rank-merge sort fallback on window overflow, decided ONCE per batch).
    Batched: every array arg carries a leading batch dim."""
    ny, nx = bev_shape
    fkey, enc_f, ok_f = jax.vmap(
        lambda fc, fm, cc, cm: _subm_parts(fc, fm, cc, cm, bev_shape, 2,
                                           False)
    )(fine_coords, fine_mask, coarse_coords, coarse_mask)
    ckey, enc_i, ok_i, o, o0x = jax.vmap(
        lambda cc, cm, fc, fm: _inv_parts(cc, cm, fc, fm, coarse_bev_shape)
    )(coarse_coords, coarse_mask, fine_coords, fine_mask)
    b, pc = enc_f.shape[:2]
    pf = enc_i.shape[1]
    # down-forward rank spreads reach ~620 per 128-query block
    # (tools/probe_group_spans.py); 64-query blocks roughly halve the
    # spread, and the compare-count work scales with span (knobs for
    # on-chip A/B; overflow falls back to the exact sort either way)
    r_f = _ranks_auto_batched(fkey, enc_f.reshape(b, pc, 12), ny * nx,
                              RANK_SPAN_DOWNF, qblk=RANK_QBLK_DOWN)
    r_i = _ranks_auto_batched(ckey, enc_i.reshape(b, pf, 9),
                              coarse_bev_shape[0] * coarse_bev_shape[1],
                              RANK_SPAN_DOWNI, qblk=RANK_QBLK_DOWN)
    nbr = jax.vmap(
        lambda rr, kk, oo, om: _subm_assemble(rr, kk, oo, om, 2, False)
    )(r_f.reshape(b, pc, 3, 4), fkey, ok_f, coarse_mask)
    inv = jax.vmap(_inv_assemble)(r_i.reshape(b, pf, 3, 3), ok_i, o, o0x)
    return nbr, inv


@partial(jax.jit, static_argnames=("bev_shape", "coarse_bev_shape"))
def bev_down_tables(fine_coords, fine_mask, coarse_coords, coarse_mask,
                    bev_shape, coarse_bev_shape):
    """Per-sample convenience form of bev_down_tables_batched."""
    nbr, inv = bev_down_tables_batched(
        fine_coords[None], fine_mask[None], coarse_coords[None],
        coarse_mask[None], bev_shape, coarse_bev_shape)
    return nbr[0], inv[0]


def pillar_inv_conv3d(coarse_features, inv_neighbor_idx, weights, fine_mask, nz_fine):
    """Transposed 3x3x3 s=2 conv: coarse stage -> the (known) fine active set.

    Args:
        coarse_features: (P_c, nz_c, C)
        inv_neighbor_idx: (P_f, 9) into P_c (from bev_inv_neighbor_idx_sorted)
        weights: (3, 3, 3, C, Cout) in (dz, dy, dx) order
        fine_mask: (P_f,)
        nz_fine: fine z cell count (static)
    Returns: (P_f, nz_fine, Cout)

    z transpose: fine z = 2*zc + dz - 1 — implemented as static interleaved
    adds (even slots from dz=1, odd from dz=0/2).
    """
    if coarse_features.ndim == 3:
        return pillar_inv_conv3d(
            coarse_features[None], inv_neighbor_idx[None], weights,
            fine_mask[None], nz_fine,
        )[0]
    bt, p_c, nz_c, c = coarse_features.shape
    p_f = inv_neighbor_idx.shape[1]
    cout = weights.shape[-1]
    w = nz_c * c
    wpad = -(-w // 128) * 128
    flat = jnp.pad(coarse_features.reshape(bt, p_c, w), ((0, 0), (0, 0), (0, wpad - w)))

    out = jnp.zeros((bt, p_f, nz_fine, cout), dtype=coarse_features.dtype)
    for t in range(9):
        dy, dx = divmod(t, 3)
        g = gather_rows(flat, inv_neighbor_idx[:, :, t])
        g = g[..., :w].reshape(bt, p_f, nz_c, c)
        for dz in range(3):
            vals = g @ weights[dz, dy, dx]  # (B, P_f, nz_c, Cout)
            if dz == 1:  # zf = 2*zc (even slots)
                n = min(nz_c, (nz_fine + 1) // 2)
                out = out.at[:, :, 0 : 2 * n : 2, :].add(vals[:, :, :n])
            else:  # zf = 2*zc + dz - 1 (odd slots)
                zc0 = 1 if dz == 0 else 0  # dz=0: zf=2zc-1 needs zc>=1
                zf0 = 2 * zc0 + dz - 1
                n = min(nz_c - zc0, max((nz_fine - zf0 + 1) // 2, 0))
                if n > 0:
                    out = out.at[:, :, zf0 : zf0 + 2 * n : 2, :].add(
                        vals[:, :, zc0 : zc0 + n]
                    )
    return jnp.where(fine_mask[:, :, None, None], out, 0.0)

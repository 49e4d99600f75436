"""Probe the fused kernel's PER-DY-GROUP window needs vs block size.

Mirrors ops/pallas_fused_conv._prologue exactly: for each output block of
`blk` lanes and each dy group, the window is [align(lo), align(lo)+span);
reports the minimal legal span (max over blocks/groups of idx - align(lo) + 1)
for 128-aligned and 8-aligned starts, per block size, per stage and for the
stride-2 down tables.  Decides BLOCK/SPAN_* (gather MACs scale with span,
independent of blk — smaller blocks shrink spans).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/probe_group_spans.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def group_need(folded, blk, align):
    """folded (M, 9) folded tap table; returns minimal legal span for
    per-dy-group windows with `align`-aligned starts."""
    m = folded.shape[0] - folded.shape[0] % blk
    t = folded[:m].reshape(-1, blk, 9)
    need = 0
    for g in range(3):
        grp = t[:, :, 3 * g : 3 * g + 3].reshape(len(t), -1)
        v = grp >= 0
        any_v = v.any(1)
        lo = np.where(v, grp, 1 << 30).min(1)
        lo = np.where(any_v, (lo // align) * align, 0)
        hi = np.where(v, grp, -1).max(1)
        n = np.where(any_v, hi - lo + 1, 0)
        need = max(need, int(n.max()))
    return need


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from toda_tpu.ops.pillar_sparse import (
        bev_down_tables,
        bev_downsample_sites,
        bev_neighbor_idx_sorted,
        voxelize_pillars,
    )

    _, _, arrays, bs = bench.build_bench(4)
    pts = np.concatenate([np.asarray(b["points"]) for b in arrays]) \
        if isinstance(arrays, list) else np.asarray(arrays["points"])
    pmask = np.concatenate([np.asarray(b["points_mask"]) for b in arrays]) \
        if isinstance(arrays, list) else np.asarray(arrays["points_mask"])
    bs = pts.shape[0]
    nx = ny = 1024
    nz = 40
    caps = [32768, 16384, 8192, 4096]

    vox = jax.vmap(
        lambda p, m: voxelize_pillars(
            p, m, (0.1, 0.1, 0.2), (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
            grid_size=(nx, ny, nz), max_pillars=caps[0], nz=nz,
        )
    )(jnp.asarray(pts), jnp.asarray(pmask))
    coords = np.asarray(vox["pillar_coords"])
    mask = np.asarray(vox["pillar_mask"])
    print(f"samples={bs}, active pillars: {mask.sum(1)}")

    blks = [128, 256, 384, 512]
    bev_shape = (ny, nx)
    cur_c, cur_m = coords, mask
    for si in range(4):
        p = cur_c.shape[1]
        nbr = np.stack([
            np.asarray(bev_neighbor_idx_sorted(
                jnp.asarray(cur_c[b]), jnp.asarray(cur_m[b]),
                jnp.asarray(cur_c[b]), jnp.asarray(cur_m[b]), bev_shape, 1))
            for b in range(bs)
        ])
        folded = np.concatenate(
            [np.where(nbr[b] >= 0, nbr[b] + b * p, -1) for b in range(bs)])
        # subm: inverse table = mirrored taps on the same table -> same needs
        for blk in blks:
            n128 = group_need(folded, blk, 128)
            n8 = group_need(folded, blk, 8)
            print(f"stage{si+1} subm blk={blk}: need128={n128} need8={n8}")
        if si == 3:
            break
        p_out = caps[si + 1]
        new_c, new_m, nbrs, invs = [], [], [], []
        coarse_shape = (-(-bev_shape[0] // 2), -(-bev_shape[1] // 2))
        for b in range(bs):
            c2, m2 = bev_downsample_sites(
                jnp.asarray(cur_c[b]), jnp.asarray(cur_m[b]), 2, p_out,
                bev_shape)
            nb, iv = bev_down_tables(
                jnp.asarray(cur_c[b]), jnp.asarray(cur_m[b]), c2, m2,
                bev_shape, coarse_shape)
            new_c.append(np.asarray(c2)); new_m.append(np.asarray(m2))
            nbrs.append(np.asarray(nb)); invs.append(np.asarray(iv))
        foldf = np.concatenate(
            [np.where(nbrs[b] >= 0, nbrs[b] + b * p, -1) for b in range(bs)])
        foldi = np.concatenate(
            [np.where(invs[b] >= 0, invs[b] + b * p_out, -1) for b in range(bs)])
        for blk in blks:
            nf128 = group_need(foldf, blk, 128)
            nf8 = group_need(foldf, blk, 8)
            ni128 = group_need(foldi, blk, 128)
            ni8 = group_need(foldi, blk, 8)
            print(f"  down{si+2} blk={blk}: fwd need128={nf128} need8={nf8} | "
                  f"bwd need128={ni128} need8={ni8}")
        cur_c, cur_m = np.stack(new_c), np.stack(new_m)
        bev_shape = coarse_shape

    print("done")


if __name__ == "__main__":
    main()

"""Probe PARITY-SPLIT window needs for the stride-2 down convs.

Idea: permute each fine table into (y&1, x&1)-plane-major order (within a
plane, fine-key order == coarse-key order, so the permutation is a stable
4-way partition = pure cumsum). Down-conv taps then group by the plane they
land in — ((4,), (3,5), (1,7), (0,2), (6,8)) with the corner plane split per
a-row — and each group's window in the permuted table is slope-1, so the
span should drop from ~620 (current dy-grouping over the unpermuted table)
to ~subm levels. This probe measures the actual per-group window need on
the bench workload, plus the needs for the backward (inverse) table with
the queries in permuted order.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/probe_parity_spans.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

# parity grouping of the 9 taps (t = (dy+1)*3 + (dx+1)): plane of tap =
# (par(dy), par(dx)), par(0)=0, par(+-1)=1; the (1,1) corner plane is split
# into its two a-rows (dy=-1 vs dy=+1) to keep each group a single-row span
PARITY_GROUPS = ((4,), (3, 5), (1, 7), (0, 2), (6, 8))
DY_GROUPS = ((0, 1, 2), (3, 4, 5), (6, 7, 8))


def parity_dest(coords, mask):
    """Per-sample destination lane of each site under the plane-major
    permutation (stable partition by plane id; invalid sites parked after
    all valid ones, preserving order)."""
    p = coords.shape[0]
    plane = (coords[:, 0] & 1) * 2 + (coords[:, 1] & 1)
    plane = np.where(mask, plane, 4)
    dest = np.zeros(p, np.int64)
    offset = 0
    for pl in range(5):
        sel = plane == pl
        dest[sel] = offset + np.arange(sel.sum())
        offset += sel.sum()
    return dest


def group_need(folded, blk, align, groups):
    m = folded.shape[0] - folded.shape[0] % blk
    t = folded[:m].reshape(-1, blk, 9)
    needs = []
    empties = []
    for ts in groups:
        grp = t[:, :, list(ts)].reshape(len(t), -1)
        v = grp >= 0
        any_v = v.any(1)
        lo = np.where(v, grp, 1 << 30).min(1)
        lo = np.where(any_v, (lo // align) * align, 0)
        hi = np.where(v, grp, -1).max(1)
        n = np.where(any_v, hi - lo + 1, 0)
        needs.append(int(n.max()))
        empties.append(float((~any_v).mean()))
    return needs, empties


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from toda_tpu.ops.pillar_sparse import (
        bev_down_tables,
        bev_downsample_sites,
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
    cur_c = np.asarray(vox["pillar_coords"])
    cur_m = np.asarray(vox["pillar_mask"])
    print(f"samples={bs}, active pillars: {cur_m.sum(1)}")

    bev_shape = (ny, nx)
    for si in range(3):
        p = cur_c.shape[1]
        p_out = caps[si + 1]
        coarse_shape = (-(-bev_shape[0] // 2), -(-bev_shape[1] // 2))
        new_c, new_m = [], []
        nbrp_f, invp_f, nbr_f, inv_f = [], [], [], []
        for b in range(bs):
            c2, m2 = bev_downsample_sites(
                jnp.asarray(cur_c[b]), jnp.asarray(cur_m[b]), 2, p_out,
                bev_shape)
            nb, iv = bev_down_tables(
                jnp.asarray(cur_c[b]), jnp.asarray(cur_m[b]), c2, m2,
                bev_shape, coarse_shape)
            nb, iv = np.asarray(nb), np.asarray(iv)
            dest = parity_dest(cur_c[b], cur_m[b])
            gidx = np.argsort(dest, kind="stable")
            nb_p = np.where(nb >= 0, dest[np.clip(nb, 0, p - 1)], -1)
            iv_p = iv[gidx]
            new_c.append(np.asarray(c2)); new_m.append(np.asarray(m2))
            nbrp_f.append(np.where(nb_p >= 0, nb_p + b * p, -1))
            invp_f.append(np.where(iv_p >= 0, iv_p + b * p_out, -1))
            nbr_f.append(np.where(nb >= 0, nb + b * p, -1))
            inv_f.append(np.where(iv >= 0, iv + b * p_out, -1))
        nbrp = np.concatenate(nbrp_f)
        invp = np.concatenate(invp_f)
        nbr0 = np.concatenate(nbr_f)
        inv0 = np.concatenate(inv_f)
        for blk in (128, 256):
            cur_n, cur_e = group_need(nbr0, blk, 128, DY_GROUPS)
            par_n, par_e = group_need(nbrp, blk, 128, PARITY_GROUPS)
            print(f"down{si+2} fwd blk={blk}: dy-need128={cur_n} "
                  f"parity-need128={par_n} parity-empty={par_e}")
            ci_n, ci_e = group_need(inv0, blk, 128, DY_GROUPS)
            pi_n, pi_e = group_need(invp, blk, 128, DY_GROUPS)
            pp_n, pp_e = group_need(invp, blk, 128, PARITY_GROUPS)
            print(f"down{si+2} bwd blk={blk}: dy-need128={ci_n} "
                  f"permuted-dy-need128={pi_n} (empty={pi_e}) "
                  f"permuted-parity-need128={pp_n} (empty={pp_e})")
        cur_c, cur_m = np.stack(new_c), np.stack(new_m)
        bev_shape = coarse_shape

    print("done")


if __name__ == "__main__":
    main()

"""Probe the parity PERMUTATION gather's window needs on the bench workload.

The permutation gather (gather_rows_taps_t over gidxf) reads slope-~4 source
streams; each 256-lane destination block must fit one PERM_SPAN window or the
whole gather falls back to the XLA take for the batch. This prints the exact
need per down stage so TODA_PERM_SPAN is set from measurement, plus the
parity down-table needs at the kernel block (validates DEFAULT_PARITY_SPANS).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/probe_perm_span.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from toda_tpu.models.backbones_3d.pillar_sparse_backbone import (
        build_parity_fold,
        fold_idx,
    )
    from toda_tpu.ops import pallas_fused_conv as pfc
    from toda_tpu.ops.pillar_sparse import (
        bev_down_tables_batched,
        bev_downsample_sites,
        voxelize_pillars,
    )

    _, _, arrays, _ = bench.build_bench(4)
    pts = np.concatenate([np.asarray(b["points"]) for b in arrays])
    pmask = np.concatenate([np.asarray(b["points_mask"]) for b in arrays])
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
    coords = jnp.asarray(vox["pillar_coords"])
    mask = jnp.asarray(vox["pillar_mask"])

    bev_shape = (ny, nx)
    for si in range(3):
        p = coords.shape[1]
        p_out = caps[si + 1]
        pblk = 256
        p_p = p + 4 * pblk
        gidxf, destf = build_parity_fold(coords, mask, pblk=pblk)
        g = np.asarray(gidxf).reshape(-1, 256)
        v = g >= 0
        any_v = v.any(1)
        lo = np.where(v, g, 1 << 30).min(1)
        lo = np.where(any_v, (lo // 128) * 128, 0)
        hi = np.where(v, g, -1).max(1)
        need = np.where(any_v, hi - lo + 1, 0)
        print(f"stage{si+1}->down{si+2} perm gather: need128={need.max()} "
              f"(PERM_SPAN={pfc._pg.PERM_SPAN}) "
              f"empty-block-frac={float((~any_v).mean()):.3f}")

        coarse_shape = (-(-bev_shape[0] // 2), -(-bev_shape[1] // 2))
        nc, nm = jax.vmap(
            lambda c_, m_: bev_downsample_sites(c_, m_, 2, p_out, bev_shape)
        )(coords, mask)
        nbr, _ = bev_down_tables_batched(coords, mask, nc, nm, bev_shape,
                                         coarse_shape)
        nbrf = np.asarray(fold_idx(nbr, p))
        destf_np = np.asarray(destf)
        idxp = np.where(nbrf >= 0, destf_np[np.clip(nbrf, 0, bs * p - 1)], -1)
        blk = pfc.BLOCK_DOWN
        t = idxp.reshape(-1, blk, 9)
        needs = []
        for ts in pfc.PARITY_GROUPS:
            grp = t[:, :, list(ts)].reshape(len(t), -1)
            gv = grp >= 0
            av = gv.any(1)
            lo = np.where(gv, grp, 1 << 30).min(1)
            lo = np.where(av, (lo // 128) * 128, 0)
            hi = np.where(gv, grp, -1).max(1)
            needs.append(int(np.where(av, hi - lo + 1, 0).max()))
        spans = pfc.DEFAULT_PARITY_SPANS[min(si, 2)]
        ok = all(n <= s for n, s in zip(needs, spans))
        print(f"  down{si+2} parity table needs={needs} spans={spans} "
              f"fits={ok}")
        coords, mask = nc, nm
        bev_shape = coarse_shape

    print("done")


if __name__ == "__main__":
    main()

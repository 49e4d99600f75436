"""Measure within-block index spans of the conv neighbor tables on the real
bench workload — decides window sizes for the span kernels.

Run: python tools/probe_spans.py   (CPU is fine: JAX_PLATFORMS=cpu)
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
    from toda_tpu.ops.pillar_sparse import (
        bev_downsample_sites,
        bev_neighbor_idx,
        bev_neighbor_idx_sorted,
        build_bev_map,
        voxelize_pillars,
    )

    _, _, arrays, bs = bench.build_bench(4)
    pts, pmask = np.asarray(arrays["points"]), np.asarray(arrays["points_mask"])
    nx = ny = 1024
    nz = 40
    caps = [32768, 16384, 8192, 4096]

    vox = jax.vmap(
        lambda p, m: voxelize_pillars(
            p, m, (0.1, 0.1, 0.2), (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
            grid_size=(nx, ny, nz), max_pillars=caps[0], nz=nz,
        )
    )(jnp.asarray(pts), jnp.asarray(pmask))
    coords, mask = np.asarray(vox["pillar_coords"]), np.asarray(vox["pillar_mask"])
    print(f"active pillars per sample: {mask.sum(1)}")

    def spans(idx, block):
        m = idx.shape[0]
        mpad = m - m % block
        blk = idx[:mpad].reshape(-1, block)
        v = blk >= 0
        hi = np.where(v, blk, -1).max(1)
        lo = np.where(v, blk, 1 << 30).min(1)
        s = np.where(hi >= 0, hi - lo + 1, 0)
        return s.max(), np.percentile(s, 99)

    bev_shape = (ny, nx)
    cur_coords, cur_mask = coords, mask
    for si in range(4):
        nbr = np.stack([
            np.asarray(bev_neighbor_idx_sorted(
                jnp.asarray(cur_coords[b]), jnp.asarray(cur_mask[b]),
                jnp.asarray(cur_coords[b]), jnp.asarray(cur_mask[b]), bev_shape, 1))
            for b in range(bs)
        ])
        # union across taps per block (the fused kernel's requirement), batch-folded
        p = nbr.shape[1]
        folded = np.concatenate([
            np.where(nbr[b] >= 0, nbr[b] + b * p, -1) for b in range(bs)
        ])  # (bs*p, 9)
        u_max, u_p99 = spans(folded.reshape(folded.shape[0], -1).reshape(-1, 9 * 128)[: (bs * p // 128) * 1].reshape(-1, 9 * 128), 9 * 128) if False else (0, 0)
        blkv = folded.reshape(-1, 128, 9)
        v = blkv >= 0
        hi = np.where(v, blkv, -1).reshape(len(blkv), -1).max(1)
        lo = np.where(v, blkv, 1 << 30).reshape(len(blkv), -1).min(1)
        s = np.where(hi >= 0, hi - lo + 1, 0)
        pertap_max = 0
        for t in range(9):
            mx, _ = spans(folded[:, t], 128)
            pertap_max = max(pertap_max, mx)
        print(f"stage{si+1}: P={p} union span max={s.max()} p99={np.percentile(s,99):.0f} "
              f"p90={np.percentile(s,90):.0f}; per-tap max={pertap_max}")
        if si == 3:
            break
        new_c, new_m = [], []
        for b in range(bs):
            c2, m2 = bev_downsample_sites(
                jnp.asarray(cur_coords[b]), jnp.asarray(cur_mask[b]), 2,
                caps[si + 1], bev_shape)
            new_c.append(np.asarray(c2)); new_m.append(np.asarray(m2))
        # downsample conv spans (stride 2, in=fine out=coarse)
        nbr2 = np.stack([
            np.asarray(bev_neighbor_idx_sorted(
                jnp.asarray(cur_coords[b]), jnp.asarray(cur_mask[b]),
                jnp.asarray(new_c[b]), jnp.asarray(new_m[b]), bev_shape, 2))
            for b in range(bs)
        ])
        p_in = cur_coords.shape[1]
        folded2 = np.concatenate([
            np.where(nbr2[b] >= 0, nbr2[b] + b * p_in, -1) for b in range(bs)
        ])
        blkv = folded2.reshape(-1, 128, 9)
        v = blkv >= 0
        hi = np.where(v, blkv, -1).reshape(len(blkv), -1).max(1)
        lo = np.where(v, blkv, 1 << 30).reshape(len(blkv), -1).min(1)
        s = np.where(hi >= 0, hi - lo + 1, 0)
        print(f"  down{si+2}: union span max={s.max()} p99={np.percentile(s,99):.0f}")
        cur_coords, cur_mask = np.stack(new_c), np.stack(new_m)
        bev_shape = (-(-bev_shape[0] // 2), -(-bev_shape[1] // 2))

    print("done")


if __name__ == "__main__":
    main()

"""Pillar-sparse (BEV-sparse, z-dense) conv vs dense 3D conv golden tests."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from toda_tpu.ops.pillar_sparse import (
    bev_downsample_sites,
    bev_neighbor_idx,
    build_bev_map,
    pillar_conv3d,
    pillars_to_dense,
    voxelize_pillars,
)

NY, NX, NZ = 10, 12, 8


def random_pillars(rng, p_cap=32, c=4, n=18):
    flat = rng.choice(NY * NX, size=n, replace=False)
    coords = np.stack([flat // NX, flat % NX], 1).astype(np.int32)
    order = np.argsort(coords[:, 0] * NX + coords[:, 1])
    coords = coords[order]
    coords = np.concatenate([coords, -np.ones((p_cap - n, 2), np.int32)])
    mask = np.zeros(p_cap, bool)
    mask[:n] = True
    feats = rng.randn(p_cap, NZ, c).astype(np.float32) * mask[:, None, None]
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask)


def dense_golden(feats, coords, mask, w, strides=(1, 1, 1)):
    dense = pillars_to_dense(feats, coords, mask, (NY, NX))  # (NY, NX, NZ, C)
    x = jnp.transpose(dense, (2, 0, 1, 3))[None]  # (1, NZ, NY, NX, C)
    wk = jnp.asarray(w)  # (3,3,3,C,Cout) dz,dy,dx
    out = jax.lax.conv_general_dilated(
        x, wk.reshape(3, 3, 3, w.shape[3], w.shape[4]),
        window_strides=strides, padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out[0]  # (NZ', NY', NX', Cout)


def test_pillar_conv_matches_dense(rng):
    feats, coords, mask = random_pillars(rng)
    w = (rng.randn(3, 3, 3, 4, 6) * 0.2).astype(np.float32)
    bmap = build_bev_map(coords, mask, (NY, NX))
    nbr = bev_neighbor_idx(coords, mask, bmap, (NY, NX), 1)
    out = np.asarray(pillar_conv3d(feats, nbr, jnp.asarray(w), mask))
    golden = np.asarray(dense_golden(feats, coords, mask, w))  # (NZ, NY, NX, 6)
    cc, mm = np.asarray(coords), np.asarray(mask)
    for i in range(len(cc)):
        if mm[i]:
            np.testing.assert_allclose(
                out[i], golden[:, cc[i, 0], cc[i, 1], :], atol=1e-4,
            )


def test_pillar_conv_strided_matches_dense(rng):
    feats, coords, mask = random_pillars(rng)
    w = (rng.randn(3, 3, 3, 4, 5) * 0.2).astype(np.float32)
    oc, om = bev_downsample_sites(coords, mask, 2, 16, (NY, NX))
    bmap = build_bev_map(coords, mask, (NY, NX))
    nbr = bev_neighbor_idx(oc, om, bmap, (NY, NX), 2)
    out = np.asarray(pillar_conv3d(feats, nbr, jnp.asarray(w), om, z_stride=2))
    golden = np.asarray(dense_golden(feats, coords, mask, w, strides=(2, 2, 2)))
    occ, omm = np.asarray(oc), np.asarray(om)
    for i in range(len(occ)):
        if omm[i]:
            np.testing.assert_allclose(
                out[i], golden[:, occ[i, 0], occ[i, 1], :], atol=1e-4,
            )


def test_downsample_sites(rng):
    feats, coords, mask = random_pillars(rng)
    oc, om = bev_downsample_sites(coords, mask, 2, 16, (NY, NX))
    want = {tuple(c // 2) for c in np.asarray(coords)[np.asarray(mask)]}
    got = {tuple(c) for c in np.asarray(oc)[np.asarray(om)]}
    assert got == want


def test_voxelize_pillars_mean(rng):
    pts = rng.uniform(0, 4, (300, 4)).astype(np.float32)
    pts[:, 1] = rng.uniform(-2, 2, 300)
    pts[:, 2] = rng.uniform(-1, 1, 300)
    mask = rng.rand(300) > 0.1
    out = voxelize_pillars(
        jnp.asarray(pts), jnp.asarray(mask), (0.5, 0.5, 0.25),
        (0.0, -2.0, -1.0, 4.0, 2.0, 1.0), grid_size=(8, 8, 8),
        max_pillars=64, nz=8,
    )
    feats = np.asarray(out["pillar_features"])
    coords = np.asarray(out["pillar_coords"])
    counts = np.asarray(out["cell_counts"])
    pmask = np.asarray(out["pillar_mask"])
    # golden: group points by (y, x, z)
    cells = {}
    for i, p in enumerate(pts):
        if not mask[i]:
            continue
        ijk = np.floor((p[:3] - np.array([0.0, -2.0, -1.0])) / np.array([0.5, 0.5, 0.25])).astype(int)
        if (ijk < 0).any() or (ijk >= 8).any():
            continue
        cells.setdefault((ijk[1], ijk[0], ijk[2]), []).append(p)  # (y, x, z)
    got_cols = {tuple(c) for c in coords[pmask]}
    want_cols = {(y, x) for (y, x, z) in cells}
    assert got_cols == want_cols
    slot = {tuple(c): i for i, c in enumerate(coords) if pmask[i]}
    for (y, x, z), plist in cells.items():
        i = slot[(y, x)]
        assert counts[i, z] == len(plist)
        np.testing.assert_allclose(feats[i, z], np.mean(plist, axis=0), atol=1e-5)
    # empty cells are zero
    for i in range(64):
        if pmask[i]:
            empty = counts[i] == 0
            assert (feats[i][empty] == 0).all()


def test_inverse_conv_is_transpose_of_downsample():
    """<conv(x), y>_coarse == <x, conv_T(y)>_fine for the stride-2 pair."""
    import jax.numpy as jnp
    from toda_tpu.ops.pillar_sparse import (
        bev_downsample_sites,
        bev_inv_neighbor_idx_sorted,
        bev_neighbor_idx_sorted,
        pillar_conv3d,
        pillar_inv_conv3d,
    )

    rng = np.random.RandomState(0)
    ny = nx = 16
    nz, c, cout = 8, 3, 5
    keys = np.sort(rng.choice(ny * nx, size=40, replace=False))
    coords = np.stack([keys // nx, keys % nx], axis=-1).astype(np.int32)
    p = 48
    pad = p - len(coords)
    coords = np.concatenate([coords, -np.ones((pad, 2), np.int32)])
    mask = np.arange(p) < 40

    coarse_coords, coarse_mask = bev_downsample_sites(
        jnp.asarray(coords), jnp.asarray(mask), 2, 32, (ny, nx)
    )
    fwd_nbr = bev_neighbor_idx_sorted(
        jnp.asarray(coords), jnp.asarray(mask), coarse_coords, coarse_mask,
        (ny, nx), stride=2,
    )
    inv_nbr = bev_inv_neighbor_idx_sorted(
        coarse_coords, coarse_mask, jnp.asarray(coords), jnp.asarray(mask),
        (ny // 2, nx // 2),
    )
    w = jnp.asarray(rng.randn(3, 3, 3, c, cout).astype(np.float32))
    x = jnp.asarray(rng.randn(p, nz, c).astype(np.float32))
    x = x * np.asarray(mask)[:, None, None]
    nz_c = nz // 2
    y = jnp.asarray(rng.randn(32, nz_c, cout).astype(np.float32))
    y = y * np.asarray(coarse_mask)[:, None, None]

    fx = pillar_conv3d(x, fwd_nbr, w, coarse_mask, z_stride=2)  # (32, nz_c, cout)
    # NOTE the inverse maps cout->...: transpose weights' channel dims and flip taps
    w_t = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    # <conv(x), y> vs <x, conv_T(y)> — conv_T built from the SAME w via the
    # inverse table (which already encodes the transposed correspondence, so
    # weights are passed UNFLIPPED with swapped channels)
    w_inv = w.transpose(0, 1, 2, 4, 3)
    bx = pillar_inv_conv3d(y, inv_nbr, w_inv, jnp.asarray(mask), nz)
    lhs = float((fx * y).sum())
    rhs = float((x * bx).sum())
    assert abs(lhs - rhs) < 1e-2 * max(abs(lhs), 1.0), (lhs, rhs)


def test_sorted_neighbor_tables_match_map_based():
    """Rank-merge tables (no scalar gathers) == dense-map tables, for subm
    (stride 1) and strided cases, with padding and boundary sites."""
    from toda_tpu.ops.pillar_sparse import (
        bev_downsample_sites,
        bev_neighbor_idx,
        bev_neighbor_idx_sorted,
        build_bev_map,
    )

    rng = np.random.RandomState(42)
    NY = NX = 24
    for trial in range(3):
        p = 96
        n_occ = rng.randint(30, 80)
        keys = np.sort(rng.choice(NY * NX, size=n_occ, replace=False))
        coords = np.full((p, 2), -1, np.int32)
        coords[:n_occ, 0] = keys // NX
        coords[:n_occ, 1] = keys % NX
        mask = np.zeros(p, bool)
        mask[:n_occ] = True
        cj, mj = jnp.asarray(coords), jnp.asarray(mask)

        bmap = build_bev_map(cj, mj, (NY, NX))
        want = np.asarray(bev_neighbor_idx(cj, mj, bmap, (NY, NX), 1))
        got = np.asarray(bev_neighbor_idx_sorted(cj, mj, cj, mj, (NY, NX), 1))
        np.testing.assert_array_equal(got, want)

        oc, om = bev_downsample_sites(cj, mj, 2, 64, (NY, NX))
        want2 = np.asarray(bev_neighbor_idx(oc, om, bmap, (NY, NX), 2))
        got2 = np.asarray(bev_neighbor_idx_sorted(cj, mj, oc, om, (NY, NX), 2))
        np.testing.assert_array_equal(got2, want2)



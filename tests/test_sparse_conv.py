"""Sparse conv vs dense conv golden tests (exact equality up to fp tolerance)."""

import numpy as np
import jax
import jax.numpy as jnp

from toda_tpu.ops.sparse_ops import (
    build_coord_map,
    gather_neighbor_idx,
    scatter_to_dense,
    sparse_downsample_sites,
    sparse_gather_conv,
)

GRID = (6, 8, 8)  # (nz, ny, nx)


def random_sparse(rng, v_cap=40, c=4):
    nz, ny, nx = GRID
    n = 25
    # unique coords
    flat = rng.choice(nz * ny * nx, size=n, replace=False)
    coords = np.stack([flat // (ny * nx), (flat // nx) % ny, flat % nx], 1).astype(np.int32)
    coords = np.concatenate([coords, -np.ones((v_cap - n, 3), np.int32)])
    mask = np.zeros(v_cap, bool)
    mask[:n] = True
    feats = rng.randn(v_cap, c).astype(np.float32) * mask[:, None]
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask)


def dense_conv_golden(feats, coords, mask, weights, stride=1):
    """lax 3D conv on the densified grid with explicit SAME-style padding."""
    dense = scatter_to_dense(feats, coords, mask, GRID)  # (nz, ny, nx, C)
    x = dense[None]  # NDHWC
    w = jnp.asarray(weights).reshape(3, 3, 3, feats.shape[-1], -1)  # DHWIO
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3, padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out[0]


def test_subm_conv_matches_dense(rng):
    feats, coords, mask = random_sparse(rng)
    k, cin, cout = 27, 4, 6
    w = rng.randn(k, cin, cout).astype(np.float32) * 0.2

    cmap = build_coord_map(coords, mask, GRID)
    nbr = gather_neighbor_idx(coords, mask, cmap, GRID, 3, 1)
    out = np.asarray(sparse_gather_conv(feats, nbr, jnp.asarray(w)))

    golden = np.asarray(dense_conv_golden(feats, coords, mask, w))
    cc = np.asarray(coords)
    mm = np.asarray(mask)
    for i in range(len(cc)):
        if mm[i]:
            np.testing.assert_allclose(
                out[i], golden[cc[i, 0], cc[i, 1], cc[i, 2]], atol=1e-4
            )


def test_downsample_sites_are_occupied_cells(rng):
    feats, coords, mask = random_sparse(rng)
    oc, om = sparse_downsample_sites(coords, mask, 2, 32, GRID)
    oc, om = np.asarray(oc), np.asarray(om)
    want = {tuple(c // 2) for c in np.asarray(coords)[np.asarray(mask)]}
    got = {tuple(c) for c in oc[om]}
    assert got == want


def test_strided_conv_matches_dense(rng):
    feats, coords, mask = random_sparse(rng)
    k, cin, cout = 27, 4, 5
    w = rng.randn(k, cin, cout).astype(np.float32) * 0.2

    oc, om = sparse_downsample_sites(coords, mask, 2, 32, GRID)
    cmap = build_coord_map(coords, mask, GRID)
    nbr = gather_neighbor_idx(oc, om, cmap, GRID, 3, 2)
    out = np.asarray(sparse_gather_conv(feats, nbr, jnp.asarray(w)))

    golden = np.asarray(dense_conv_golden(feats, coords, mask, w, stride=2))
    occ, omm = np.asarray(oc), np.asarray(om)
    for i in range(len(occ)):
        if omm[i]:
            np.testing.assert_allclose(
                out[i], golden[occ[i, 0], occ[i, 1], occ[i, 2]], atol=1e-4
            )


def test_coord_map_lookup(rng):
    feats, coords, mask = random_sparse(rng)
    cmap = np.asarray(build_coord_map(coords, mask, GRID))
    cc, mm = np.asarray(coords), np.asarray(mask)
    for i in range(len(cc)):
        if mm[i]:
            assert cmap[cc[i, 0], cc[i, 1], cc[i, 2]] == i
    assert (cmap == -1).sum() == np.prod(GRID) - mm.sum()

"""Voxelizer tests vs a straightforward numpy reference."""

import numpy as np
import jax.numpy as jnp

from toda_tpu.ops import voxelize, dynamic_voxelize

VOXEL_SIZE = (0.5, 0.5, 0.25)
PC_RANGE = (0.0, -2.0, -1.0, 4.0, 2.0, 1.0)
GRID = (8, 8, 8)  # (4/0.5, 4/0.5, 2/0.25)


def numpy_voxelize(points, mask):
    """Golden: dict voxel_key(zyx) -> list of point rows (in order)."""
    vox = {}
    for i, p in enumerate(points):
        if not mask[i]:
            continue
        ijk = np.floor((p[:3] - np.array(PC_RANGE[:3])) / np.array(VOXEL_SIZE)).astype(int)
        if (ijk < 0).any() or (ijk >= np.array(GRID)).any():
            continue
        vox.setdefault(tuple(ijk[::-1]), []).append(i)
    return vox


def test_voxelize_matches_golden(rng):
    pts = rng.uniform(-1, 5, (200, 4)).astype(np.float32)
    mask = rng.rand(200) > 0.1
    out = voxelize(jnp.asarray(pts), jnp.asarray(mask), VOXEL_SIZE, PC_RANGE,
                   grid_size=GRID, max_voxels=128, max_points_per_voxel=8)
    golden = numpy_voxelize(pts, mask)

    coords = np.asarray(out["voxel_coords"])
    nump = np.asarray(out["voxel_num_points"])
    voxels = np.asarray(out["voxels"])
    vmask = np.asarray(out["voxel_mask"])

    assert vmask.sum() == len(golden)
    got = {}
    for v in range(128):
        if not vmask[v]:
            assert (coords[v] == -1).all()
            continue
        got[tuple(coords[v])] = v
    assert set(got.keys()) == set(golden.keys())
    for key, rows in golden.items():
        v = got[key]
        assert nump[v] == min(len(rows), 8)
        want_pts = pts[rows[:8]]
        np.testing.assert_allclose(
            np.sort(voxels[v, : nump[v]], axis=0), np.sort(want_pts, axis=0), atol=1e-5
        )
        # padding slots are zero
        assert (voxels[v, nump[v]:] == 0).all()


def test_voxel_cap_respected(rng):
    pts = rng.uniform(0, 4, (500, 4)).astype(np.float32)
    pts[:, 1] = rng.uniform(-2, 2, 500)
    pts[:, 2] = rng.uniform(-1, 1, 500)
    mask = np.ones(500, bool)
    out = voxelize(jnp.asarray(pts), jnp.asarray(mask), VOXEL_SIZE, PC_RANGE,
                   grid_size=GRID, max_voxels=16, max_points_per_voxel=4)
    assert np.asarray(out["voxel_mask"]).sum() <= 16
    assert (np.asarray(out["voxel_num_points"]) <= 4).all()


def test_dynamic_voxelize_consistent(rng):
    pts = rng.uniform(-1, 5, (200, 4)).astype(np.float32)
    mask = rng.rand(200) > 0.1
    hard = voxelize(jnp.asarray(pts), jnp.asarray(mask), VOXEL_SIZE, PC_RANGE,
                    grid_size=GRID, max_voxels=128, max_points_per_voxel=64)
    dyn = dynamic_voxelize(jnp.asarray(pts), jnp.asarray(mask), VOXEL_SIZE, PC_RANGE,
                           grid_size=GRID, max_voxels=128)
    np.testing.assert_array_equal(np.asarray(hard["voxel_coords"]),
                                  np.asarray(dyn["voxel_coords"]))
    np.testing.assert_array_equal(np.asarray(hard["voxel_num_points"]),
                                  np.asarray(dyn["voxel_num_points"]))
    # per-point ids agree where points are kept by both
    pvh = np.asarray(hard["point_voxel_idx"])
    pvd = np.asarray(dyn["point_voxel_idx"])
    keep = (pvh >= 0) & (pvd >= 0)
    np.testing.assert_array_equal(pvh[keep], pvd[keep])


def test_batched_voxelizer_packed_path_matches_plain():
    """The packed-lane scatter path (segmented prefix + compaction + 2-way
    bf16 packing) must reproduce the plain per-sample scatter means."""
    import jax
    import jax.numpy as jnp

    from toda_tpu.ops import pillar_sparse as ps

    rng = np.random.RandomState(0)
    bt, n = 2, 1024
    pts = rng.uniform(-7.5, 7.5, size=(bt, n, 4)).astype(np.float32)
    mask = np.ones((bt, n), bool)
    mask[:, 950:] = False
    args = dict(
        voxel_size=(0.5, 0.5, 1.0), pc_range=(-8, -8, -4, 8, 8, 4),
        grid_size=(32, 32, 8), max_pillars=512, nz=8,
    )

    old = ps.USE_PACKED_VOXEL_SCATTER
    try:
        ps.USE_PACKED_VOXEL_SCATTER = False
        ref = ps.voxelize_pillars_batched(jnp.asarray(pts), jnp.asarray(mask), **args)
        ps.USE_PACKED_VOXEL_SCATTER = True
        got = ps.voxelize_pillars_batched(jnp.asarray(pts), jnp.asarray(mask), **args)
    finally:
        ps.USE_PACKED_VOXEL_SCATTER = old

    np.testing.assert_array_equal(
        np.asarray(ref["pillar_mask"]), np.asarray(got["pillar_mask"])
    )
    np.testing.assert_array_equal(
        np.asarray(ref["cell_counts"]), np.asarray(got["cell_counts"])
    )
    np.testing.assert_allclose(
        np.asarray(got["pillar_features"]), np.asarray(ref["pillar_features"]),
        rtol=5e-4, atol=5e-4,  # 2-way bf16 split: ~2^-16 relative on sums
    )
    # batched no-pack path must equal the original per-sample voxelizer
    one = ps.voxelize_pillars(
        jnp.asarray(pts[0]), jnp.asarray(mask[0]), **args
    )
    np.testing.assert_allclose(
        np.asarray(ref["pillar_features"][0]), np.asarray(one["pillar_features"]),
        rtol=1e-6,
    )

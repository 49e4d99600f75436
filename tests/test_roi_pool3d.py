"""RoI pooling op tests."""

import numpy as np
import jax.numpy as jnp

from toda_tpu.ops.roi_pool3d import roiaware_pool3d, roipoint_pool3d


def test_roiaware_pool_counts(rng):
    # points on a grid inside one axis-aligned box
    box = np.array([[0, 0, 0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    pts = rng.uniform(-0.99, 0.99, (500, 3)).astype(np.float32)
    feats = rng.randn(500, 4).astype(np.float32)
    mask = np.ones(500, bool)
    pooled, occ = roiaware_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                  jnp.asarray(mask), jnp.asarray(box), out_size=2)
    occ = np.asarray(occ)
    assert occ.shape == (1, 2, 2, 2)
    assert occ.sum() == 500  # every point lands in exactly one cell
    # max pool of cell matches golden
    pooled = np.asarray(pooled)
    cell = ((pts + 1.0) // 1.0).astype(int).clip(0, 1)
    golden = np.full((2, 2, 2, 4), -np.inf)
    for i in range(500):
        x, y, z = cell[i]
        golden[x, y, z] = np.maximum(golden[x, y, z], feats[i])
    np.testing.assert_allclose(pooled[0], golden, atol=1e-5)


def test_roiaware_rotation(rng):
    # rotated box: point at global (1, 0) with box yaw pi/2 lands at local (0, -1)
    box = np.array([[0, 0, 0, 1.0, 3.0, 2.0, np.pi / 2]], np.float32)
    pts = np.array([[1.0, 0.0, 0.0]], np.float32)
    feats = np.ones((1, 1), np.float32)
    pooled, occ = roiaware_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                  jnp.ones(1, bool), jnp.asarray(box), out_size=3)
    occ = np.asarray(occ)[0]
    assert occ.sum() == 1
    # local x ~ 0 -> middle x-cell; local y = -1 -> first y-cell
    assert occ[1, 0, 1] == 1


def test_roipoint_pool(rng):
    box = np.array([[0, 0, 0, 2.0, 2.0, 2.0, 0.0],
                    [50, 50, 0, 1.0, 1.0, 1.0, 0.0]], np.float32)
    pts = rng.uniform(-0.9, 0.9, (100, 3)).astype(np.float32)
    feats = rng.randn(100, 2).astype(np.float32)
    pooled, empty = roipoint_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                    jnp.ones(100, bool), jnp.asarray(box),
                                    num_sampled_points=16)
    pooled, empty = np.asarray(pooled), np.asarray(empty)
    assert not empty[0] and empty[1]
    assert pooled.shape == (2, 16, 5)
    assert (pooled[1] == 0).all()
    # all pooled points of roi0 are inside the box
    assert (np.abs(pooled[0, :, :3]) <= 1.0 + 1e-5).all()

"""pointnet2-family op tests vs numpy goldens."""

import numpy as np
import jax.numpy as jnp

from toda_tpu.ops.pointnet2_ops import (
    ball_query,
    farthest_point_sampling,
    interpolation_weights,
    query_and_group,
    three_interpolate,
    three_nn,
)


def test_fps_spreads(rng):
    # two tight clusters far apart: FPS must pick from both early
    a = rng.normal(0, 0.1, (50, 3))
    b = rng.normal(10, 0.1, (50, 3))
    pts = np.concatenate([a, b]).astype(np.float32)
    mask = np.ones(100, bool)
    idx = np.asarray(farthest_point_sampling(jnp.asarray(pts), jnp.asarray(mask), 4))
    groups = {int(i >= 50) for i in idx[:2]}
    assert groups == {0, 1}


def test_fps_ignores_invalid(rng):
    pts = rng.uniform(-5, 5, (40, 3)).astype(np.float32)
    mask = np.zeros(40, bool)
    mask[:10] = True
    idx = np.asarray(farthest_point_sampling(jnp.asarray(pts), jnp.asarray(mask), 8))
    assert (idx < 10).all()


def test_ball_query_radius(rng):
    xyz = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    q = xyz[:4] + 0.01
    idx, cnt = ball_query(1.0, 16, jnp.asarray(xyz), jnp.ones(200, bool),
                          jnp.asarray(q), jnp.ones(4, bool))
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for i in range(4):
        d = np.linalg.norm(xyz[idx[i, :cnt[i]]] - q[i], axis=1)
        assert (d < 1.0).all()
        # golden count
        want = min(int((np.linalg.norm(xyz - q[i], axis=1) < 1.0).sum()), 16)
        assert cnt[i] == want


def test_three_nn_interpolate(rng):
    known = rng.uniform(-5, 5, (30, 3)).astype(np.float32)
    feats = rng.randn(30, 8).astype(np.float32)
    unknown = known[:5] + 0.001  # essentially on top of known points
    d, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known), jnp.ones(30, bool))
    w = interpolation_weights(d)
    out = np.asarray(three_interpolate(jnp.asarray(feats), idx, w))
    np.testing.assert_allclose(out, feats[:5], atol=1e-2)


def test_query_and_group_relative(rng):
    xyz = rng.uniform(-3, 3, (100, 3)).astype(np.float32)
    feats = rng.randn(100, 4).astype(np.float32)
    q = xyz[:3]
    grouped, valid = query_and_group(
        2.0, 8, jnp.asarray(xyz), jnp.ones(100, bool),
        jnp.asarray(q), jnp.ones(3, bool), jnp.asarray(feats),
    )
    grouped, valid = np.asarray(grouped), np.asarray(valid)
    assert grouped.shape == (3, 8, 7)
    # self is in its own ball with relative coord ~0
    for i in range(3):
        assert valid[i, 0]
        norms = np.linalg.norm(grouped[i, valid[i], :3], axis=1)
        assert norms.min() < 1e-5
        assert (norms < 2.0).all()

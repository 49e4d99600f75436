"""pillar_conv3d custom VJP (scatter-free backward) vs autodiff of a plain
take-based reference implementation — gradients must match to fp tolerance
for stride-1 submanifold and stride-2 downsample convs, with and without the
identity-tap shortcut, batched and unbatched.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toda_tpu.ops.pillar_sparse import (
    bev_downsample_sites,
    bev_inv_neighbor_idx_sorted,
    bev_neighbor_idx,
    bev_neighbor_idx_sorted,
    build_bev_map,
    invert_neighbor_idx,
    pillar_conv3d,
    voxelize_pillars,
)


def _reference_conv(features, neighbor_idx, weights, out_mask, z_stride):
    """Plain jnp implementation (take + conv1d), fully autodiffable."""
    p_in, nz, c = features.shape
    p_out = neighbor_idx.shape[0]
    padded = jnp.pad(features, ((0, 1), (1, 1), (0, 0)))
    flat = padded.reshape(p_in + 1, (nz + 2) * c)
    acc = None
    for t in range(9):
        dy, dx = divmod(t, 3)
        idx = neighbor_idx[:, t]
        g = jnp.take(flat, jnp.where(idx >= 0, idx, p_in), axis=0)
        g = g.reshape(p_out, nz + 2, c)
        contrib = jax.lax.conv_general_dilated(
            g, weights[:, dy, dx], window_strides=(z_stride,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        acc = contrib if acc is None else acc + contrib
    return jnp.where(out_mask[:, None, None], acc, 0.0)


def _setup(seed=0, p=64, nz=6, c=4, cout=5, ny=16, nx=16):
    rng = np.random.RandomState(seed)
    n_occ = p - 8
    flat_keys = np.sort(rng.choice(ny * nx, size=n_occ, replace=False))
    coords = np.full((p, 2), -1, np.int32)
    coords[:n_occ, 0] = flat_keys // nx
    coords[:n_occ, 1] = flat_keys % nx
    mask = np.zeros(p, bool)
    mask[:n_occ] = True
    feats = rng.randn(p, nz, c).astype(np.float32) * mask[:, None, None]
    w = rng.randn(3, 3, 3, c, cout).astype(np.float32) * 0.2
    return (jnp.asarray(feats), jnp.asarray(coords.astype(np.int32)),
            jnp.asarray(mask), jnp.asarray(w), (ny, nx))


@pytest.mark.parametrize("identity_tap", [None, 4])
def test_subm_grads_match_reference(identity_tap):
    feats, coords, mask, w, bev_shape = _setup()
    bmap = build_bev_map(coords, mask, bev_shape)
    nbr = bev_neighbor_idx(coords, mask, bmap, bev_shape, 1)
    inv = nbr[:, ::-1]

    def loss_custom(f, wt):
        out = pillar_conv3d(f, nbr, wt, mask, 1, identity_tap, inv)
        return (out * jnp.sin(jnp.arange(out.size).reshape(out.shape) * 0.1)).sum()

    def loss_ref(f, wt):
        out = _reference_conv(f, nbr, wt, mask, 1)
        return (out * jnp.sin(jnp.arange(out.size).reshape(out.shape) * 0.1)).sum()

    o_c = loss_custom(feats, w)
    o_r = loss_ref(feats, w)
    np.testing.assert_allclose(np.asarray(o_c), np.asarray(o_r), rtol=1e-5)

    gc_f, gc_w = jax.grad(loss_custom, argnums=(0, 1))(feats, w)
    gr_f, gr_w = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gr_f), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_w), np.asarray(gr_w), rtol=2e-5, atol=1e-5)


def test_downsample_grads_match_reference():
    feats, coords, mask, w, bev_shape = _setup(seed=3)
    coarse_shape = (bev_shape[0] // 2, bev_shape[1] // 2)
    out_coords, out_mask = bev_downsample_sites(coords, mask, 2, 48, bev_shape)
    bmap = build_bev_map(coords, mask, bev_shape)
    nbr = bev_neighbor_idx(out_coords, out_mask, bmap, bev_shape, 2)
    inv = bev_inv_neighbor_idx_sorted(out_coords, out_mask, coords, mask, coarse_shape)

    # analytic inverse must equal the brute-force scatter inverse
    inv_bf = invert_neighbor_idx(nbr, feats.shape[0])
    np.testing.assert_array_equal(np.asarray(inv), np.asarray(inv_bf))

    def loss_custom(f, wt):
        out = pillar_conv3d(f, nbr, wt, out_mask, 2, None, inv)
        return (out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.05)).sum()

    def loss_ref(f, wt):
        out = _reference_conv(f, nbr, wt, out_mask, 2)
        return (out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.05)).sum()

    np.testing.assert_allclose(
        np.asarray(loss_custom(feats, w)), np.asarray(loss_ref(feats, w)), rtol=1e-5
    )
    gc_f, gc_w = jax.grad(loss_custom, argnums=(0, 1))(feats, w)
    gr_f, gr_w = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gr_f), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_w), np.asarray(gr_w), rtol=2e-5, atol=1e-5)


def test_batched_grads_and_default_inverse():
    f1, c1, m1, w, bev_shape = _setup(seed=5)
    f2, c2, m2, _, _ = _setup(seed=6)
    feats = jnp.stack([f1, f2])
    coords = jnp.stack([c1, c2])
    mask = jnp.stack([m1, m2])
    bmap = jax.vmap(lambda c, m: build_bev_map(c, m, bev_shape))(coords, mask)
    nbr = jax.vmap(lambda c, m, b: bev_neighbor_idx(c, m, b, bev_shape, 1))(
        coords, mask, bmap
    )

    def loss_custom(f, wt):  # no inv given -> derived by scatter
        out = pillar_conv3d(f, nbr, wt, mask, 1, 4)
        return (out ** 2).sum()

    def loss_ref(f, wt):
        outs = [
            _reference_conv(f[b], nbr[b], wt, mask[b], 1) for b in range(2)
        ]
        return sum((o ** 2).sum() for o in outs)

    np.testing.assert_allclose(
        np.asarray(loss_custom(feats, w)), np.asarray(loss_ref(feats, w)), rtol=1e-5
    )
    gc_f, gc_w = jax.grad(loss_custom, argnums=(0, 1))(feats, w)
    gr_f, gr_w = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gr_f), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_w), np.asarray(gr_w), rtol=2e-5, atol=1e-5)


def test_real_pillars_subm_grads():
    # via the voxelizer, so coords follow the production sorted-key convention
    rng = np.random.RandomState(7)
    pts = rng.uniform(-3, 3, size=(500, 4)).astype(np.float32)
    vox = voxelize_pillars(
        jnp.asarray(pts), jnp.ones(500, bool), (0.5, 0.5, 1.0),
        (-3.0, -3.0, -3.0, 3.0, 3.0, 3.0), grid_size=(12, 12, 6),
        max_pillars=128, nz=6,
    )
    feats, coords, mask = (
        vox["pillar_features"], vox["pillar_coords"], vox["pillar_mask"]
    )
    nbr = bev_neighbor_idx_sorted(coords, mask, coords, mask, (12, 12), 1)
    inv = nbr[:, ::-1]
    w = (rng.randn(3, 3, 3, 4, 8) * 0.2).astype(np.float32)

    def loss_custom(f, wt):
        return (pillar_conv3d(f, nbr, wt, mask, 1, 4, inv) ** 2).sum()

    def loss_ref(f, wt):
        return (_reference_conv(f, nbr, wt, mask, 1) ** 2).sum()

    np.testing.assert_allclose(
        np.asarray(loss_custom(feats, jnp.asarray(w))),
        np.asarray(loss_ref(feats, jnp.asarray(w))), rtol=1e-5,
    )
    gc = jax.grad(loss_custom)(feats, jnp.asarray(w))
    gr = jax.grad(loss_ref)(feats, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gr), rtol=2e-5, atol=1e-5)


def test_transposed_conv_matches_rowmajor():
    from toda_tpu.ops.pillar_sparse import pillar_conv3d_t

    feats, coords, mask, w, bev_shape = _setup(seed=11)
    p, nz, c = feats.shape
    bmap = build_bev_map(coords, mask, bev_shape)
    nbr = bev_neighbor_idx(coords, mask, bmap, bev_shape, 1)
    inv = nbr[:, ::-1]

    ref = pillar_conv3d(feats, nbr, w, mask, 1, 4, inv)  # (P, nz, Cout)

    flatT = jnp.asarray(feats).transpose(1, 2, 0).reshape(nz * c, p)
    outT = pillar_conv3d_t(flatT, nbr, jnp.asarray(w), mask, nz, 1, 4, inv)
    cout = w.shape[-1]
    got = outT.reshape(nz, cout, p).transpose(2, 0, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=1e-5)

    # gradients too
    def loss_t(fT, wt):
        return (pillar_conv3d_t(fT, nbr, wt, mask, nz, 1, 4, inv) ** 2).sum()

    def loss_r(f, wt):
        return (pillar_conv3d(f, nbr, wt, mask, 1, 4, inv) ** 2).sum()

    gt_f, gt_w = jax.grad(loss_t, argnums=(0, 1))(flatT, jnp.asarray(w))
    gr_f, gr_w = jax.grad(loss_r, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    gt_f_r = gt_f.reshape(nz, c, p).transpose(2, 0, 1)
    np.testing.assert_allclose(np.asarray(gt_f_r), np.asarray(gr_f), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt_w), np.asarray(gr_w), rtol=2e-5, atol=1e-5)


def test_transposed_downsample_conv_matches_rowmajor():
    from toda_tpu.ops.pillar_sparse import pillar_conv3d_t

    feats, coords, mask, w, bev_shape = _setup(seed=12)
    p, nz, c = feats.shape
    coarse_shape = (bev_shape[0] // 2, bev_shape[1] // 2)
    out_coords, out_mask = bev_downsample_sites(coords, mask, 2, 48, bev_shape)
    bmap = build_bev_map(coords, mask, bev_shape)
    nbr = bev_neighbor_idx(out_coords, out_mask, bmap, bev_shape, 2)
    inv = bev_inv_neighbor_idx_sorted(out_coords, out_mask, coords, mask, coarse_shape)

    ref = pillar_conv3d(feats, nbr, w, out_mask, 2, None, inv)
    flatT = jnp.asarray(feats).transpose(1, 2, 0).reshape(nz * c, p)
    outT = pillar_conv3d_t(flatT, nbr, jnp.asarray(w), out_mask, nz, 2, None, inv)
    nz_out = -(-nz // 2)
    cout = w.shape[-1]
    got = outT.reshape(nz_out, cout, -1).transpose(2, 0, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=1e-5)


def test_stacked_paths_interpret_match_reference(monkeypatch):
    """Force the stacked fwd conv + stacked bwd (interleaved inverse gather,
    9*Cout-channel conv) through the Pallas interpreter and pin values and
    gradients against the plain take-based reference."""
    from toda_tpu.ops import pallas_gather as pg
    from toda_tpu.ops.pillar_sparse import pillar_conv3d_t

    monkeypatch.setattr(pg, "INTERPRET", True)
    rng = np.random.RandomState(21)
    p, nz, c, cout = 512, 4, 16, 16
    ny = nx = 64
    n_occ = p - 20
    keys = np.sort(rng.choice(ny * nx, size=n_occ, replace=False))
    coords = np.full((p, 2), -1, np.int32)
    coords[:n_occ, 0] = keys // nx
    coords[:n_occ, 1] = keys % nx
    mask = np.zeros(p, bool)
    mask[:n_occ] = True
    feats = (rng.randn(p, nz, c) * mask[:, None, None]).astype(np.float32)
    w = (rng.randn(3, 3, 3, c, cout) * 0.2).astype(np.float32)

    cj, mj = jnp.asarray(coords), jnp.asarray(mask)
    nbr = bev_neighbor_idx_sorted(cj, mj, cj, mj, (ny, nx), 1)
    inv = nbr[:, ::-1]
    flatT = jnp.asarray(feats).transpose(1, 2, 0).reshape(nz * c, p)

    def loss_t(fT, wt):
        return (pillar_conv3d_t(fT, nbr, wt, mj, nz, 1, None, inv) ** 2).sum()

    def loss_ref(f, wt):
        return (_reference_conv(f, nbr, wt, mj, 1) ** 2).sum()

    np.testing.assert_allclose(
        float(loss_t(flatT, jnp.asarray(w))),
        float(loss_ref(jnp.asarray(feats), jnp.asarray(w))), rtol=1e-5,
    )
    gt_f, gt_w = jax.grad(loss_t, argnums=(0, 1))(flatT, jnp.asarray(w))
    gr_f, gr_w = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    gt_f_r = gt_f.reshape(nz, c, p).transpose(2, 0, 1)
    np.testing.assert_allclose(np.asarray(gt_f_r), np.asarray(gr_f), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gt_w), np.asarray(gr_w), rtol=3e-4, atol=1e-4)

"""Parity-plane permutation for the stride-2 down convs.

Pins: (1) parity_destinations is the stable plane-major partition, (2) the
permuted down conv — permuted input table + composed tap tables — computes
exactly the same coarse outputs as the unpermuted path, (3) permute_lanes_t
round-trips and back-propagates through the inverse permutation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from toda_tpu.ops.pillar_sparse import (
    bev_down_tables,
    bev_downsample_sites,
    parity_destinations,
    parity_permutation_batched,
    permute_lanes_t,
    pillar_conv3d_t,
)


def _sorted_coords(rng, p, ny, nx, n_active):
    keys = rng.choice(ny * nx, size=n_active, replace=False)
    keys.sort()
    coords = np.full((p, 2), -1, np.int32)
    coords[:n_active, 0] = keys // nx
    coords[:n_active, 1] = keys % nx
    mask = np.zeros((p,), bool)
    mask[:n_active] = True
    return jnp.asarray(coords), jnp.asarray(mask)


def test_parity_destinations_is_stable_plane_partition():
    rng = np.random.default_rng(0)
    ny = nx = 32
    coords, mask = _sorted_coords(rng, 512, ny, nx, 400)
    dest = np.asarray(parity_destinations(coords, mask))
    c, m = np.asarray(coords), np.asarray(mask)
    plane = np.where(m, (c[:, 0] & 1) * 2 + (c[:, 1] & 1), 4)
    # reference: numpy stable argsort by plane
    order = np.argsort(plane, kind="stable")
    ref_dest = np.empty_like(dest)
    ref_dest[order] = np.arange(len(order))
    np.testing.assert_array_equal(dest, ref_dest)
    # bijection
    assert len(np.unique(dest)) == len(dest)
    # within-plane order preserved and equals coarse order
    for p in range(4):
        rows = np.where(plane == p)[0]
        d = dest[rows]
        assert (np.diff(d) > 0).all()
        a, b = c[rows, 0] >> 1, c[rows, 1] >> 1
        ckey = a * ((nx + 1) // 2) + b
        assert (np.diff(ckey) > 0).all()


def test_parity_permutation_batched_inverse():
    rng = np.random.default_rng(1)
    cs, ms = [], []
    for b in range(3):
        c, m = _sorted_coords(rng, 256, 24, 24, 150 + 30 * b)
        cs.append(c)
        ms.append(m)
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    dest, gidx = parity_permutation_batched(coords, mask)
    d, g = np.asarray(dest), np.asarray(gidx)
    for b in range(3):
        np.testing.assert_array_equal(g[b][d[b]], np.arange(256))
        np.testing.assert_array_equal(d[b][g[b]], np.arange(256))


def test_permuted_down_conv_matches_unpermuted():
    """Down conv on the plane-major-permuted table with composed tap tables
    == the plain path, exactly (same gathers, reassociated indices)."""
    rng = np.random.default_rng(2)
    ny = nx = 48
    p, p_out, nz, c, cout = 1024, 1024, 5, 16, 32
    coords, mask = _sorted_coords(rng, p, ny, nx, int(p * 0.9))
    oc, om = bev_downsample_sites(coords, mask, 2, p_out, (ny, nx))
    cshape = (-(-ny // 2), -(-nx // 2))
    nbr, inv = bev_down_tables(coords, mask, oc, om, (ny, nx), cshape)

    x = jnp.asarray(rng.standard_normal((nz * c, p)), jnp.float32)
    x = jnp.where(mask[None, :], x, 0.0)
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, 3, c, cout)), jnp.float32)

    y_ref = pillar_conv3d_t(x, nbr, w, om, nz, 2, None, inv)

    dest, gidx = parity_permutation_batched(coords[None], mask[None])
    dest, gidx = dest[0], gidx[0]
    x_p = x[:, gidx]
    nbr_p = jnp.where(nbr >= 0, dest[jnp.clip(nbr, 0, p - 1)], -1)
    inv_p = inv[gidx]
    y_p = pillar_conv3d_t(x_p, nbr_p, w, om, nz, 2, None, inv_p)
    np.testing.assert_allclose(
        np.asarray(y_p), np.asarray(y_ref), atol=1e-5, rtol=1e-5)

    # gradients also agree (dx comes back in permuted order -> un-permute)
    def loss(fn, xx):
        y = fn(xx)
        return jnp.sum(y**2)

    gx_ref = jax.grad(
        lambda xx: loss(lambda v: pillar_conv3d_t(v, nbr, w, om, nz, 2, None,
                                                  inv), xx))(x)
    gx_p = jax.grad(
        lambda xx: loss(lambda v: pillar_conv3d_t(v, nbr_p, w, om, nz, 2,
                                                  None, inv_p), xx))(x_p)
    np.testing.assert_allclose(
        np.asarray(gx_p[:, dest]), np.asarray(gx_ref), atol=1e-4, rtol=1e-4)


def test_batch_folded_parity_composition():
    """The backbone's folded (gidxf, destf) arrays: composing the folded
    down table through destf and gathering the folded activation through
    gidxf must reproduce the plain folded down conv for a 2-sample batch
    (pins the p_p vs p_in offset bookkeeping)."""
    from toda_tpu.models.backbones_3d.pillar_sparse_backbone import (
        build_parity_fold,
        fold_idx,
    )

    rng = np.random.default_rng(7)
    ny = nx = 48
    p, p_out, nz, c, cout, bt = 512, 512, 5, 8, 8, 2
    cs, ms, ns, vs, ocs, oms = [], [], [], [], [], []
    for b in range(bt):
        coords, mask = _sorted_coords(rng, p, ny, nx, 300 + 60 * b)
        oc, om = bev_downsample_sites(coords, mask, 2, p_out, (ny, nx))
        nbr, inv = bev_down_tables(coords, mask, oc, om, (ny, nx),
                                   (ny // 2, nx // 2))
        cs.append(coords); ms.append(mask); ns.append(nbr); vs.append(inv)
        ocs.append(oc); oms.append(om)
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    nbrf = fold_idx(jnp.stack(ns), p)
    invf = fold_idx(jnp.stack(vs), p_out)
    omf = jnp.stack(oms).reshape(-1)
    pblk = 128
    gidxf, destf = build_parity_fold(coords, mask, pblk=pblk)
    p_p = p + 4 * pblk
    assert destf.shape == (bt * p,) and gidxf.shape == (bt * p_p,)

    x = jnp.asarray(rng.standard_normal((nz * c, bt * p)), jnp.float32)
    x = jnp.where(jnp.stack(ms).reshape(-1)[None, :], x, 0.0)
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, 3, c, cout)), jnp.float32)

    y_ref = pillar_conv3d_t(x, nbrf, w, omf, nz, 2, None, invf)
    xp = jnp.where(gidxf[None, :] >= 0,
                   x[:, jnp.clip(gidxf, 0)], 0.0)
    nbr_p = jnp.where(nbrf >= 0, destf[jnp.clip(nbrf, 0)], -1)
    inv_p_rows = jnp.where(gidxf[:, None] >= 0,
                           invf[jnp.clip(gidxf, 0)], -1)
    y_p = pillar_conv3d_t(xp, nbr_p, w, omf, nz, 2, None, inv_p_rows)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_permute_lanes_t_roundtrip_and_grad():
    rng = np.random.default_rng(3)
    w, m = 16, 512
    x = jnp.asarray(rng.standard_normal((w, m)), jnp.float32)
    perm = rng.permutation(m).astype(np.int32)
    gidxf = jnp.asarray(perm)
    destf = jnp.zeros((m,), jnp.int32).at[gidxf].set(jnp.arange(m, dtype=jnp.int32))
    y = permute_lanes_t(x, gidxf, destf)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x)[:, perm])
    # grad of sum(y * r) w.r.t. x is r un-permuted
    r = jnp.asarray(rng.standard_normal((w, m)), jnp.float32)
    g = jax.grad(lambda v: jnp.sum(permute_lanes_t(v, gidxf, destf) * r))(x)
    np.testing.assert_allclose(np.asarray(g)[:, perm], np.asarray(r),
                               atol=1e-6)

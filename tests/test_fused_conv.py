"""Fused BN+ReLU+gather9+conv kernel vs the pure-XLA reference.

Runs the Pallas kernels in interpreter mode on CPU with shrunken window
spans; scenarios are built so the spans do NOT overflow (asserted), i.e. the
fast path is actually exercised, not the fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toda_tpu.ops import pallas_fused_conv as pfc
from toda_tpu.ops.pillar_sparse import (
    bev_down_tables,
    bev_downsample_sites,
    bev_neighbor_idx_sorted,
)

INT_MAX = np.iinfo(np.int32).max


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pfc, "INTERPRET", True)
    yield


def _sorted_coords(rng, p, ny, nx, n_active):
    keys = rng.choice(ny * nx, size=n_active, replace=False)
    keys.sort()
    coords = np.full((p, 2), -1, np.int32)
    coords[:n_active, 0] = keys // nx
    coords[:n_active, 1] = keys % nx
    mask = np.zeros((p,), bool)
    mask[:n_active] = True
    return jnp.asarray(coords), jnp.asarray(mask)


def _subm_setup(rng, p=1024, ny=40, nx=32, nz=5, c=16, cout=16):
    coords, mask = _sorted_coords(rng, p, ny, nx, int(p * 0.9))
    idx = bev_neighbor_idx_sorted(coords, mask, coords, mask, (ny, nx), 1)
    inv = idx[:, ::-1]
    x = jnp.asarray(rng.standard_normal((nz * c, p)), jnp.float32)
    x = jnp.where(mask[None, :], x, 0.0).astype(jnp.bfloat16)
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, 3, c, cout)), jnp.bfloat16)
    scale = jnp.asarray(0.5 + rng.random(c), jnp.bfloat16)
    shift = jnp.asarray(0.2 * rng.standard_normal(c), jnp.bfloat16)
    return x, scale, shift, w, idx, inv, mask


def _down_setup(rng, p=1024, p_out=1024, ny=48, nx=48, nz=5, c=16, cout=32):
    coords, mask = _sorted_coords(rng, p, ny, nx, int(p * 0.9))
    oc, om = bev_downsample_sites(coords, mask, 2, p_out, (ny, nx))
    cshape = (-(-ny // 2), -(-nx // 2))
    idx, inv = bev_down_tables(coords, mask, oc, om, (ny, nx), cshape)
    x = jnp.asarray(rng.standard_normal((nz * c, p)), jnp.float32)
    x = jnp.where(mask[None, :], x, 0.0).astype(jnp.bfloat16)
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, 3, c, cout)), jnp.bfloat16)
    scale = jnp.asarray(0.5 + rng.random(c), jnp.bfloat16)
    shift = jnp.asarray(0.2 * rng.standard_normal(c), jnp.bfloat16)
    return x, scale, shift, w, idx, inv, mask, om, coords


def _no_overflow(idx, n, span):
    _, _, ovf = pfc._prologue(idx, n, span)
    assert not bool(ovf), "test scenario overflowed the window span"


def _masked_close(a, b, mask, tol):
    a = np.asarray(a, np.float32) * np.asarray(mask)[None, :]
    b = np.asarray(b, np.float32) * np.asarray(mask)[None, :]
    np.testing.assert_allclose(a, b, atol=tol, rtol=tol)


@pytest.mark.parametrize("act,identity", [(True, 4), (True, None), (False, 4)])
def test_fused_subm_forward(act, identity):
    rng = np.random.default_rng(0)
    nz, c, cout = 5, 16, 16
    x, scale, shift, w, idx, inv, mask = _subm_setup(rng, nz=nz, c=c, cout=cout)
    if not act:
        # contract: act=False callers pass identity affine (raw first layer)
        scale = jnp.ones((c,), jnp.bfloat16)
        shift = jnp.zeros((c,), jnp.bfloat16)
    _no_overflow(idx, x.shape[1], pfc.SPAN_SUBM)
    y = pfc.fused_bnconv9_t(x, scale, shift, w, idx, inv, nz, 1, identity, act)
    ref = pfc._ref_fwd(x, scale, shift, w, idx, nz, 1, act)
    assert y.shape == ref.shape == (nz * cout, x.shape[1])
    _masked_close(y, ref, mask, 0.1)


@pytest.mark.parametrize("mixed", [0, 1])
def test_fused_subm_grads(monkeypatch, mixed):
    monkeypatch.setattr(pfc, "MIXED_BWD", mixed)
    rng = np.random.default_rng(1)
    nz, c, cout = 5, 16, 16
    x, scale, shift, w, idx, inv, mask = _subm_setup(rng, nz=nz, c=c, cout=cout)
    _no_overflow(idx, x.shape[1], pfc.SPAN_SUBM)
    _no_overflow(inv, x.shape[1], pfc.SPAN_SUBM)
    r = jnp.asarray(rng.standard_normal((nz * cout, x.shape[1])), jnp.float32)
    r = (r * mask[None, :]).astype(jnp.bfloat16)

    def loss_fused(x_, s_, b_, w_):
        y = pfc.fused_bnconv9_t(x_, s_, b_, w_, idx, inv, nz, 1, 4, True)
        return jnp.sum((y * r).astype(jnp.float32))

    def loss_ref(x_, s_, b_, w_):
        y = pfc._ref_fwd(x_, s_, b_, w_, idx, nz, 1, True)
        return jnp.sum((y * r).astype(jnp.float32))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, scale, shift, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, scale, shift, w)
    # dx: only valid lanes are meaningful (invalid lanes never feed real
    # outputs in either path, but the reference zeros them via the gather)
    _masked_close(gf[0], gr[0], mask, 0.1)
    for a, b, name in [(gf[1], gr[1], "dscale"), (gf[2], gr[2], "dshift")]:
        # bf16 sums over ~80k O(1) products: sqrt(n)*ulp ~ 2 absolute
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2.0, rtol=0.05, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(gf[3], np.float32), np.asarray(gr[3], np.float32),
        atol=0.5, rtol=0.05, err_msg="dW",
    )


@pytest.mark.parametrize("mixed", [0, 1])
def test_fused_down_forward_and_grads(monkeypatch, mixed):
    monkeypatch.setattr(pfc, "MIXED_BWD", mixed)
    rng = np.random.default_rng(2)
    nz, c, cout = 5, 16, 32
    x, scale, shift, w, idx, inv, mask, om, _ = _down_setup(rng, nz=nz, c=c,
                                                            cout=cout)
    _no_overflow(idx, x.shape[1], pfc.SPAN_DOWN)
    _no_overflow(inv, idx.shape[0], pfc.SPAN_BWD_DOWN)
    y = pfc.fused_bnconv9_t(x, scale, shift, w, idx, inv, nz, 2, None, True)
    ref = pfc._ref_fwd(x, scale, shift, w, idx, nz, 2, True)
    nz_out = -(-nz // 2)
    assert y.shape == ref.shape == (nz_out * cout, idx.shape[0])
    _masked_close(y, ref, om, 0.1)

    r = jnp.asarray(rng.standard_normal(y.shape), jnp.float32)
    r = (r * om[None, :]).astype(jnp.bfloat16)

    def loss(fn):
        def f(x_, s_, b_, w_):
            yy = fn(x_, s_, b_, w_)
            return jnp.sum((yy * r).astype(jnp.float32))
        return f

    gf = jax.grad(
        loss(lambda *a: pfc.fused_bnconv9_t(*a, idx, inv, nz, 2, None, True)),
        argnums=(0, 1, 2, 3),
    )(x, scale, shift, w)
    gr = jax.grad(
        loss(lambda *a: pfc._ref_fwd(*a, idx, nz, 2, True)),
        argnums=(0, 1, 2, 3),
    )(x, scale, shift, w)
    _masked_close(gf[0], gr[0], mask, 0.1)
    np.testing.assert_allclose(np.asarray(gf[3], np.float32),
                               np.asarray(gr[3], np.float32),
                               atol=0.5, rtol=0.05)


def test_band_weights_roundtrip():
    # extract_dw must be the exact adjoint bookkeeping of band_bwd placement:
    # feeding dwacc built from a known outer-product structure recovers dW.
    rng = np.random.default_rng(3)
    c, cout, zg2, s = 8, 16, 4, 1
    w = jnp.asarray(rng.standard_normal((3, 3, 3, c, cout)), jnp.float32)
    band = pfc.band_bwd_weights(w, zg2, s)
    assert band.shape == (9, pfc.bwd_band_slabs(zg2, s) * cout, zg2 * c)
    # every forward band entry appears transposed in the backward band
    fwd = pfc.band_fwd_weights(w, pfc.fwd_group_size(cout), s)
    assert fwd.shape[1] == pfc.fwd_band_slabs(pfc.fwd_group_size(cout), s) * c


# --------------------------------------------------------------------------
# block-level: fused-flow orchestration == legacy applied-tensor flow
# --------------------------------------------------------------------------


def _block_setup(rng, p=1024, ny=40, nx=32, nz=5, c=16):
    coords, mask = _sorted_coords(rng, p, ny, nx, int(p * 0.9))
    idx = bev_neighbor_idx_sorted(coords, mask, coords, mask, (ny, nx), 1)
    x = jnp.asarray(rng.standard_normal((nz * c, p)), jnp.float32)
    x = jnp.where(mask[None, :], x, 0.0).astype(jnp.bfloat16)
    return x, idx, mask


@pytest.mark.parametrize("interpret", [False, True])
def test_subm_block_fused_flow_matches_legacy(monkeypatch, interpret):
    """The affine-chaining re-association must reproduce the legacy
    conv->BN->relu flow exactly: same outputs, same updated BN stats.
    interpret=False exercises the CPU fallback chain (apply + legacy conv);
    interpret=True runs the real fused kernels in interpreter mode."""
    from toda_tpu.models.backbones_3d.pillar_sparse_backbone import (
        PillarSubMBlockT,
        apply_affine_t,
        identity_affine,
    )

    monkeypatch.setattr(pfc, "INTERPRET", interpret)
    rng = np.random.default_rng(7)
    nz, c = 5, 16
    x, idx, mask = _block_setup(rng, nz=nz, c=c)
    if interpret:
        _no_overflow(idx, x.shape[1], pfc.SPAN_SUBM)
    blk = PillarSubMBlockT(out_channels=16, nz=nz)
    params = blk.init(jax.random.PRNGKey(0), x, idx, mask, training=True)

    y_legacy, st_legacy = blk.apply(
        params, x, idx, mask, training=True, mutable=["batch_stats"]
    )
    (raw, aff), st_fused = blk.apply(
        params, x, idx, mask, training=True, fused_in=identity_affine(c),
        mutable=["batch_stats"],
    )
    y_fused = apply_affine_t(raw, aff, mask, nz)

    np.testing.assert_allclose(
        np.asarray(y_fused, np.float32), np.asarray(y_legacy, np.float32),
        atol=0.15 if interpret else 1e-5, rtol=0.1 if interpret else 1e-5,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-2, rtol=2e-2
        ),
        st_fused["batch_stats"], st_legacy["batch_stats"],
    )


@pytest.mark.parametrize("interpret", [False, True])
def test_residual_block_fused_flow_matches_legacy(monkeypatch, interpret):
    """The fused residual block (both convs on the raw+affine chain, one
    combined apply+add+relu join) must reproduce the legacy applied-tensor
    residual flow: same outputs, same updated BN stats."""
    from toda_tpu.models.backbones_3d.pillar_sparse_backbone import (
        PillarSubMBlockT,
        apply_affine_t,
        identity_affine,
    )

    monkeypatch.setattr(pfc, "INTERPRET", interpret)
    rng = np.random.default_rng(13)
    nz, c = 5, 16
    x, idx, mask = _block_setup(rng, nz=nz, c=c)
    if interpret:
        _no_overflow(idx, x.shape[1], pfc.SPAN_SUBM)
    blk = PillarSubMBlockT(out_channels=16, nz=nz, residual=True)
    params = blk.init(jax.random.PRNGKey(1), x, idx, mask, training=True)

    y_legacy, st_legacy = blk.apply(
        params, x, idx, mask, training=True, mutable=["batch_stats"]
    )
    (out, aff), st_fused = blk.apply(
        params, x, idx, mask, training=True, fused_in=identity_affine(c),
        mutable=["batch_stats"],
    )
    # residual blocks return an applied tensor with an identity affine
    assert aff[2] is False
    y_fused = apply_affine_t(out, aff, mask, nz)

    np.testing.assert_allclose(
        np.asarray(y_fused, np.float32), np.asarray(y_legacy, np.float32),
        atol=0.15 if interpret else 1e-5, rtol=0.1 if interpret else 1e-5,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-2, rtol=2e-2
        ),
        st_fused["batch_stats"], st_legacy["batch_stats"],
    )


@pytest.mark.parametrize(
    "tail_split,fused_affine",
    [(4, 1), (0, 1), (2, 0), (1, 0)],
)
def test_fused_kernel_knob_matrix(monkeypatch, tail_split, fused_affine):
    """The kernel-path knobs (predicated tail-sub dots, in-kernel affine
    backward) must all agree with the XLA reference on forward AND
    gradients, in any combination."""
    monkeypatch.setattr(pfc, "TAIL_SPLIT", tail_split)
    monkeypatch.setattr(pfc, "FUSED_AFFINE_BWD", fused_affine)
    rng = np.random.default_rng(7)
    nz, c, cout = 5, 16, 16
    x, scale, shift, w, idx, inv, mask = _subm_setup(rng, nz=nz, c=c,
                                                     cout=cout)
    # f32: the knob paths only change dot grouping / accumulation order, so
    # in f32 they must agree to float noise (bf16 order-rounding on the
    # dscale/dshift sums reaches ~4 abs and would mask a real defect)
    x, w = x.astype(jnp.float32), w.astype(jnp.float32)
    scale, shift = scale.astype(jnp.float32), shift.astype(jnp.float32)
    _no_overflow(idx, x.shape[1], pfc.SPAN_SUBM)
    _no_overflow(inv, x.shape[1], pfc.SPAN_SUBM)
    r = jnp.asarray(rng.standard_normal((nz * cout, x.shape[1])), jnp.float32)
    r = r * jnp.asarray(mask, jnp.float32)[None, :]

    def loss_fused(x_, s_, b_, w_):
        y = pfc.fused_bnconv9_t(x_, s_, b_, w_, idx, inv, nz, 1, 4, True)
        return jnp.sum((y * r).astype(jnp.float32))

    def loss_ref(x_, s_, b_, w_):
        y = pfc._ref_fwd(x_, s_, b_, w_, idx, nz, 1, True)
        return jnp.sum((y * r).astype(jnp.float32))

    yf = pfc.fused_bnconv9_t(x, scale, shift, w, idx, inv, nz, 1, 4, True)
    yr = pfc._ref_fwd(x, scale, shift, w, idx, nz, 1, True)
    _masked_close(yf, yr, mask, 1e-3)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, scale, shift, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, scale, shift, w)
    _masked_close(gf[0], gr[0], mask, 1e-3)
    for a, b, name in [(gf[1], gr[1], "dscale"), (gf[2], gr[2], "dshift")]:
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-2, rtol=1e-3, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(gf[3], np.float32), np.asarray(gr[3], np.float32),
        atol=1e-2, rtol=1e-3, err_msg="dW",
    )

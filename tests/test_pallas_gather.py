"""Span-gather/scatter kernels: logic via the Pallas interpreter (CPU) and
the XLA fallback paths; exactness of the one-hot formulation.

The real-TPU lowering/perf is exercised by tools/microbench_spanhot.py and
bench.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toda_tpu.ops import pallas_gather as pg


def _mk(n=1536, m=1024, w=256, miss=0.2, dtype=np.float32, seed=0):
    rng = np.random.RandomState(seed)
    table = rng.randn(n, w).astype(dtype)
    base = np.sort(np.clip(np.arange(m) + rng.randint(-3, 4, size=m) + n // 4, 0, n - 1))
    idx = np.where(rng.rand(m) < miss, -1, base).astype(np.int32)
    return table, idx


def _ref_gather(table, idx):
    out = table[np.clip(idx, 0, None)].astype(np.float32)
    out[idx < 0] = 0
    return out


def _ref_scatter(g, idx, n):
    out = np.zeros((n, g.shape[1]), np.float32)
    np.add.at(out, idx[idx >= 0], g[idx >= 0].astype(np.float32))
    return out


def test_xla_fallback_gather_scatter():
    table, idx = _mk()
    got = pg.gather_rows(jnp.asarray(table), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(got), _ref_gather(table, idx), rtol=1e-6)
    g = np.random.RandomState(1).randn(idx.shape[0], table.shape[1]).astype(np.float32)
    s = pg.scatter_rows_add(jnp.asarray(g), jnp.asarray(idx), table.shape[0])
    np.testing.assert_allclose(np.asarray(s), _ref_scatter(g, idx, table.shape[0]), rtol=1e-5)


def test_interpret_kernels_match_fallback(monkeypatch):
    monkeypatch.setattr(pg, "INTERPRET", True)
    table, idx = _mk(n=1536, m=512, w=256)
    tj, ij = jnp.asarray(table), jnp.asarray(idx)
    lo, li, overflow = pg._gather_prologue(ij, table.shape[0])
    assert not bool(overflow)
    got = pg._pallas_gather(tj, lo, li, idx.shape[0])
    np.testing.assert_allclose(np.asarray(got), _ref_gather(table, idx), rtol=1e-5)

    g = np.random.RandomState(2).randn(512, 256).astype(np.float32)
    c, tgt_win, soflow = pg._scatter_prologue(ij, table.shape[0], 512)
    assert not bool(soflow)
    s = pg._pallas_scatter(jnp.asarray(g), tgt_win, c, table.shape[0])
    np.testing.assert_allclose(np.asarray(s), _ref_scatter(g, idx, table.shape[0]), rtol=1e-5)


def test_gather_overflow_falls_back():
    # scrambled indices violate the span property -> must still be exact
    table, idx = _mk(n=4096, m=1024, w=128)
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 4096, size=1024).astype(np.int32)
    idx[rng.rand(1024) < 0.3] = -1
    got = pg.gather_rows(jnp.asarray(table), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(got), _ref_gather(table, idx), rtol=1e-6)
    s = pg.scatter_rows_add(
        jnp.asarray(np.abs(np.random.randn(1024, 128)).astype(np.float32)),
        jnp.asarray(idx),
        4096,
    )
    assert np.isfinite(np.asarray(s)).all()


def test_gather_vjp_matches_scatter():
    table, idx = _mk(n=1024, m=512, w=128)
    tj, ij = jnp.asarray(table), jnp.asarray(idx)

    def loss(t):
        g = pg.gather_rows(t, ij)
        return (g * jnp.arange(1, g.size + 1, dtype=g.dtype).reshape(g.shape)).sum()

    grad = jax.grad(loss)(tj)
    gbar = np.arange(1, 512 * 128 + 1, dtype=np.float32).reshape(512, 128)
    np.testing.assert_allclose(np.asarray(grad), _ref_scatter(gbar, idx, 1024), rtol=1e-5)


def test_batched_gather_and_grad():
    rng = np.random.RandomState(5)
    bt, n, m, w = 3, 512, 256, 128
    table = rng.randn(bt, n, w).astype(np.float32)
    idx = np.sort(rng.randint(0, n, size=(bt, m)).astype(np.int32), axis=1)
    idx[rng.rand(bt, m) < 0.2] = -1
    got = np.asarray(pg.gather_rows(jnp.asarray(table), jnp.asarray(idx)))
    for b in range(bt):
        np.testing.assert_allclose(got[b], _ref_gather(table[b], idx[b]), rtol=1e-6)

    def loss(t):
        return (pg.gather_rows(t, jnp.asarray(idx)) ** 2).sum()

    grad = np.asarray(jax.grad(loss)(jnp.asarray(table)))
    for b in range(bt):
        np.testing.assert_allclose(
            grad[b], _ref_scatter(2 * _ref_gather(table[b], idx[b]), idx[b], n), rtol=1e-5
        )


def test_stacked9_interpret_matches_fallback(monkeypatch):
    """The 9-tap stacked kernel (3 dy-group windows, [t][rows] output) must
    equal the per-tap XLA fallback, through the Pallas interpreter."""
    rng = np.random.RandomState(9)
    w, n, m = 32, 1024, 512
    tableT = jnp.asarray(rng.randn(w, n).astype(np.float32))
    base = np.sort(np.clip(np.arange(m) + rng.randint(-2, 3, size=m) + 200, 40, n - 40)
                   ).astype(np.int32)
    idx = np.stack([np.clip(base + d, 0, n - 1) for d in
                    (-33, -32, -31, -1, 0, 1, 31, 32, 33)], axis=1)
    idx[rng.rand(m, 9) < 0.2] = -1
    ij = jnp.asarray(idx)

    want = np.concatenate(
        [np.asarray(pg._xla_gather_t(tableT, ij[:, t])) for t in range(9)], axis=0
    )
    monkeypatch.setattr(pg, "INTERPRET", True)
    lo3, li4, overflow = pg._stacked_prologue(ij, n, pg.SPAN_T)
    assert not bool(overflow)
    got = np.asarray(pg._pallas_gather9_stacked(tableT, lo3, li4, m, pg.SPAN_T))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_scatter_prologue_ignores_invalid_tails(monkeypatch):
    """Batched (flattened) scatters carry each sample's invalid tail
    (idx=-1) between samples. The overflow check must count only VALID
    window rows — the raw searchsorted bound of a sample-boundary tile
    spans the whole tail, which forced the XLA fallback scatter on every
    voxelizer step at nuScenes scale despite tiny true windows."""
    rng = np.random.RandomState(11)
    n_per, m_per, w, bt = 1024, 2048, 128, 2
    idx_parts, g_parts = [], []
    for b in range(bt):
        u = 300  # valid compacted entries at the front, rest invalid tail
        vals = np.sort(rng.choice(n_per, size=u, replace=False)).astype(np.int32)
        seg = np.full((m_per,), -1, np.int32)
        seg[:u] = vals + b * n_per
        idx_parts.append(seg)
        g_parts.append(rng.randn(m_per, w).astype(np.float32))
    idx = np.concatenate(idx_parts)
    g = np.concatenate(g_parts)
    n = bt * n_per

    c, tgt_win, overflow = pg._scatter_prologue(jnp.asarray(idx), n, idx.size)
    assert not bool(overflow), "boundary-tile invalid tails must not overflow"

    monkeypatch.setattr(pg, "INTERPRET", True)
    s = pg._pallas_scatter(jnp.asarray(g), tgt_win, c, n)
    np.testing.assert_allclose(np.asarray(s), _ref_scatter(g, idx, n), rtol=1e-5)


def test_unpack_pillars_t_matches_reference(monkeypatch):
    """The fused voxelizer-unpack kernel (pair-sum + count divide + bf16 +
    transpose + channel pad in one pass) must match the pure-XLA reference
    bit-exactly: the selector and permutation dots are 0/1 selections
    accumulated in f32."""
    rng = np.random.RandomState(3)
    bt, p, nz, c, cpad = 2, 256, 16, 4, 8
    r = p * nz // 8
    raw = np.zeros((bt, r, 128), np.float32)
    for g in range(8):
        # bf16-split hi/lo pairs for the feature columns, integer counts
        feats = rng.randn(bt, r, c).astype(np.float32) * 3
        hi = np.asarray(jnp.asarray(feats).astype(jnp.bfloat16), np.float32)
        lo = np.asarray(jnp.asarray(feats - hi).astype(jnp.bfloat16), np.float32)
        for k in range(c):
            raw[:, :, g * 16 + 2 * k] = hi[..., k]
            raw[:, :, g * 16 + 2 * k + 1] = lo[..., k]
        raw[:, :, g * 16 + 2 * c] = rng.randint(0, 5, (bt, r)).astype(np.float32)
    out = jnp.asarray(raw)
    want = pg.unpack_pillars_t_ref(out, nz, c, cpad, p)
    monkeypatch.setattr(pg, "INTERPRET_FORCED", True)
    got = pg._unpack_impl(out, nz, c, cpad, p)
    np.testing.assert_array_equal(np.float32(got), np.float32(want))

    # VJP goes through the reference path (adversarial-gradient contexts)
    _, vjp = jax.vjp(lambda o: pg.unpack_pillars_t(o, nz, c, cpad, p), out)
    (do,) = vjp(jnp.ones_like(want))
    assert do.shape == out.shape

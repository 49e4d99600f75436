"""Loss / box-coder unit tests."""

import numpy as np
import jax
import jax.numpy as jnp

from toda_tpu.utils import loss_utils
from toda_tpu.utils.box_coder_utils import ResidualCoder


def test_residual_coder_roundtrip(rng):
    coder = ResidualCoder()
    boxes = np.zeros((16, 7), dtype=np.float32)
    boxes[:, :3] = rng.uniform(-10, 10, (16, 3))
    boxes[:, 3:6] = rng.uniform(1, 5, (16, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 16)
    anchors = boxes + rng.uniform(-0.5, 0.5, boxes.shape).astype(np.float32)
    anchors[:, 3:6] = np.abs(anchors[:, 3:6]) + 0.5
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    dec = coder.decode(enc, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(dec), boxes, atol=1e-3)


def test_residual_coder_sincos_roundtrip(rng):
    coder = ResidualCoder(encode_angle_by_sincos=True)
    boxes = np.zeros((8, 7), dtype=np.float32)
    boxes[:, :3] = rng.uniform(-5, 5, (8, 3))
    boxes[:, 3:6] = rng.uniform(1, 4, (8, 3))
    boxes[:, 6] = rng.uniform(-np.pi / 2, np.pi / 2, 8)
    anchors = boxes.copy()
    anchors[:, 6] = 0
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(anchors))
    assert enc.shape[-1] == 8
    dec = coder.decode(enc, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(dec)[:, :6], boxes[:, :6], atol=1e-4)
    np.testing.assert_allclose(
        np.sin(np.asarray(dec)[:, 6]), np.sin(boxes[:, 6]), atol=1e-4
    )


def test_focal_loss_perfect_prediction_small():
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])[None]
    targets = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])[None]
    weights = jnp.ones((1, 2))
    loss = loss_utils.sigmoid_focal_cls_loss(logits, targets, weights)
    assert float(loss.sum()) < 1e-3


def test_focal_loss_grad_finite():
    def f(logits):
        t = jnp.asarray([[1.0, 0.0]])
        w = jnp.ones((1,))
        return loss_utils.sigmoid_focal_cls_loss(logits, t, w).sum()

    g = jax.grad(f)(jnp.zeros((1, 2)))
    assert np.isfinite(np.asarray(g)).all()


def test_centernet_focal_loss_behavior():
    gt = jnp.zeros((1, 8, 8, 1)).at[0, 4, 4, 0].set(1.0)
    good = jnp.full((1, 8, 8, 1), 0.01).at[0, 4, 4, 0].set(0.99)
    bad = jnp.full((1, 8, 8, 1), 0.5)
    l_good = float(loss_utils.focal_loss_centernet(good, gt))
    l_bad = float(loss_utils.focal_loss_centernet(bad, gt))
    assert l_good < l_bad


def test_reg_loss_centernet_gather():
    pred = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    ind = jnp.asarray([[1, 0], [2, 0]])
    target = jnp.stack([pred[0, 1], pred[0, 0], pred[1, 2], pred[1, 0]]).reshape(2, 2, 3)
    mask = jnp.asarray([[True, True], [True, False]])
    loss = loss_utils.reg_loss_centernet(pred, target, ind, mask)
    assert float(loss) < 1e-6

"""PointRCNN (PointNet2MSG + PointHeadBox + PointRCNNHead) and AnchorHeadMulti
end-to-end: train steps + predict on the synthetic fixture."""

import numpy as np
import jax.numpy as jnp

from toda_tpu.config import EDict, cfg_from_yaml_file
from toda_tpu.datasets import build_dataloader
from toda_tpu.models import build_network
from toda_tpu.runtime.train_utils import (
    create_train_state,
    make_train_step,
    select_batch_arrays,
)


def _run(cfg_path, expect_keys=()):
    np.random.seed(0)
    cfg = cfg_from_yaml_file(cfg_path, EDict())
    cfg.DATA_CONFIG.NUM_SCENES = 4
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    state, _ = create_train_state(bundle, cfg.OPTIMIZATION, total_steps=10,
                                  example_batch=batch)
    step = make_train_step(bundle)
    losses, tb = [], {}
    for b in loader:
        arrays = {k: jnp.asarray(v) for k, v in select_batch_arrays(b).items()}
        state, tb = step(state, arrays)
        losses.append(float(tb["loss"]))
    assert np.isfinite(losses).all(), losses
    for k in expect_keys:
        assert k in tb, (k, sorted(tb))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dets = bundle.predict(variables, {
        "points": jnp.asarray(batch["points"]),
        "points_mask": jnp.asarray(batch["points_mask"]),
    })
    assert np.isfinite(np.asarray(dets["pred_boxes"])).all()
    return dets


def test_pointrcnn_trains_and_predicts():
    dets = _run(
        "tools/cfgs/synthetic_models/pointrcnn_synthetic.yaml",
        expect_keys=("point_loss_cls", "point_loss_box", "rcnn_loss_cls"),
    )
    assert dets["pred_boxes"].shape[-1] == 7


def test_anchor_head_multi_trains_and_predicts():
    dets = _run(
        "tools/cfgs/synthetic_models/second_multihead_synthetic.yaml",
        expect_keys=("h0_rpn_loss_cls", "h1_rpn_loss_cls"),
    )
    labels = np.asarray(dets["pred_labels"])
    assert labels.max() <= 2  # global class ids from both heads


def test_parta2_trains_and_predicts():
    dets = _run(
        "tools/cfgs/synthetic_models/parta2_synthetic.yaml",
        expect_keys=("point_loss_cls", "point_loss_part", "rcnn_loss_cls"),
    )
    assert dets["pred_boxes"].shape[-1] == 7


def test_voxelrcnn_trains_and_predicts():
    dets = _run(
        "tools/cfgs/synthetic_models/voxelrcnn_synthetic.yaml",
        expect_keys=("rcnn_loss_cls", "rcnn_loss_reg"),
    )
    assert dets["pred_boxes"].shape[-1] == 7


def test_pointrcnn_rcnn_loss_does_not_backprop_into_backbone():
    """The reference PointRCNN head pools RoI point features under
    torch.no_grad() (pointrcnn_head.py:116): the rcnn loss trains the head's
    own layers only — the PointNet2 backbone and the point head receive ZERO
    gradient through the pooled features (they are trained by the point-head
    losses alone)."""
    import jax

    np.random.seed(0)
    cfg = cfg_from_yaml_file(
        "tools/cfgs/synthetic_models/pointrcnn_synthetic.yaml", EDict())
    cfg.DATA_CONFIG.NUM_SCENES = 2
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in select_batch_arrays(batch).items()}
    arrays["batch_size"] = arrays["points"].shape[0]
    variables = bundle.init(jax.random.PRNGKey(0), arrays)

    from toda_tpu.models.roi_heads.roi_utils import roi_losses

    def rcnn_only(params):
        out, _ = bundle.module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            arrays, training=True, mutable=["batch_stats"],
            rngs={"sampling": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)},
        )
        out = dict(out)
        out["batch_size"] = arrays["batch_size"]
        loss, _ = roi_losses(out, cfg.MODEL.ROI_HEAD.LOSS_CONFIG, bundle.roi_box_coder)
        return loss

    grads = jax.jit(jax.grad(rcnn_only))(variables["params"])
    for sub in ("backbone_3d", "point_head"):
        if sub not in grads:
            continue
        leaves = jax.tree_util.tree_leaves(grads[sub])
        leak = max((float(jnp.abs(g).max()) for g in leaves), default=0.0)
        assert leak == 0.0, f"rcnn loss leaks gradient into {sub} (max |g| = {leak})"
    head_leaves = jax.tree_util.tree_leaves(grads["roi_head"])
    assert max(float(jnp.abs(g).max()) for g in head_leaves) > 0.0

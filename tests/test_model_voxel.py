"""SECOND (sparse backbone) and CenterPoint end-to-end: forward/loss/train-step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toda_tpu.config import EDict, cfg_from_yaml_file
from toda_tpu.datasets import build_dataloader
from toda_tpu.models import build_network
from toda_tpu.runtime.train_utils import (
    create_train_state,
    make_train_step,
    select_batch_arrays,
)


def shrink(cfg):
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [-16.0, -16.0, -3.0, 16.0, 16.0, 1.0]
    cfg.DATA_CONFIG.DATA_PROCESSOR[2].NUM_POINTS = {"train": 2048, "test": 2048}
    cfg.DATA_CONFIG.DATA_PROCESSOR[3].VOXEL_SIZE = [0.5, 0.5, 0.5]
    cfg.DATA_CONFIG.DATA_PROCESSOR[3].MAX_NUMBER_OF_VOXELS = {"train": 2048, "test": 2048}
    cfg.DATA_CONFIG.NUM_SCENES = 4
    cfg.DATA_CONFIG.NUM_OBJECTS = [2, 4]
    cfg.MODEL.BACKBONE_3D.CHANNELS = [8, 16, 16, 16]
    cfg.MODEL.BACKBONE_3D.MAX_PILLARS = 2048
    cfg.MODEL.BACKBONE_3D.OUT_CHANNELS = 32
    cfg.MODEL.BACKBONE_2D.LAYER_NUMS = [1, 1]
    cfg.MODEL.BACKBONE_2D.LAYER_STRIDES = [1, 2]
    cfg.MODEL.BACKBONE_2D.NUM_FILTERS = [32, 64]
    cfg.MODEL.BACKBONE_2D.UPSAMPLE_STRIDES = [1, 2]
    cfg.MODEL.BACKBONE_2D.NUM_UPSAMPLE_FILTERS = [32, 32]
    if "NMS_CONFIG" in cfg.MODEL.POST_PROCESSING:
        cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 128
        cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 32
    cfg.MODEL.POST_PROCESSING.MAX_OBJ_PER_SAMPLE = 64
    return cfg


def run_model(cfg_path):
    np.random.seed(0)
    cfg = shrink(cfg_from_yaml_file(cfg_path, EDict()))
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    state, _ = create_train_state(bundle, cfg.OPTIMIZATION, total_steps=10,
                                  example_batch=batch)
    step = make_train_step(bundle)
    losses = []
    for i, b in enumerate(loader):
        arrays = {k: jnp.asarray(v) for k, v in select_batch_arrays(b).items()}
        state, tb = step(state, arrays)
        losses.append(float(tb["loss"]))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dets = bundle.predict(variables, {
        "points": jnp.asarray(batch["points"]),
        "points_mask": jnp.asarray(batch["points_mask"]),
    })
    return losses, dets


def test_second_trains_and_predicts():
    losses, dets = run_model("tools/cfgs/synthetic_models/second_synthetic.yaml")
    assert np.isfinite(losses).all()
    assert dets["pred_boxes"].shape[-1] == 7
    assert np.isfinite(np.asarray(dets["pred_boxes"])).all()


def test_centerpoint_trains_and_predicts():
    losses, dets = run_model("tools/cfgs/synthetic_models/centerpoint_synthetic.yaml")
    assert np.isfinite(losses).all()
    assert dets["pred_boxes"].shape[-1] == 7
    assert np.isfinite(np.asarray(dets["pred_scores"])).all()


def test_second_iou_trains_and_predicts():
    losses, dets = run_model("tools/cfgs/synthetic_models/second_iou_synthetic.yaml")
    assert np.isfinite(losses).all()
    assert dets["pred_boxes"].shape[-1] == 7
    assert np.isfinite(np.asarray(dets["pred_scores"])).all()
    # rescored final scores are within [0, 1] (sigmoid iou mixed with cls prob)
    assert float(np.asarray(dets["pred_scores"]).max()) <= 1.0


def test_second_iou_loss_does_not_backprop_into_backbone():
    """The reference SECOND-IoU head detaches BOTH the rois AND the BEV
    feature map (second_head.py:64-65): the IoU-rescoring loss trains only the
    head's own FC stack. A leak through spatial_features_2d lets the IoU
    regression tug the shared BEV/3D backbones against the RPN loss."""
    np.random.seed(0)
    cfg = shrink(cfg_from_yaml_file(
        "tools/cfgs/synthetic_models/second_iou_synthetic.yaml", EDict()))
    cfg.DATA_CONFIG.NUM_SCENES = 2
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    from toda_tpu.runtime.train_utils import select_batch_arrays as sel
    arrays = {k: jnp.asarray(v) for k, v in sel(batch).items()}
    variables = bundle.init(jax.random.PRNGKey(0), arrays)

    from toda_tpu.models.roi_heads.second_head import second_head_loss

    def iou_only(params):
        out, _ = bundle.module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            arrays, training=True, mutable=["batch_stats"],
            rngs={"sampling": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)},
        )
        loss, _ = second_head_loss(dict(out), arrays["gt_boxes"])
        return loss

    grads = jax.jit(jax.grad(iou_only))(variables["params"])
    for sub in ("vfe", "backbone_3d", "backbone_2d", "dense_head"):
        if sub not in grads:
            continue
        leaves = jax.tree_util.tree_leaves(grads[sub])
        leak = max((float(jnp.abs(g).max()) for g in leaves), default=0.0)
        assert leak == 0.0, f"iou loss leaks gradient into {sub} (max |g| = {leak})"
    head_leaves = jax.tree_util.tree_leaves(grads["roi_head"])
    assert max(float(jnp.abs(g).max()) for g in head_leaves) > 0.0

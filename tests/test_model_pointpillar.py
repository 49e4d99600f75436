"""End-to-end model tests: PointPillars init/forward/loss/predict on tiny shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from toda_tpu.config import EDict, cfg_from_yaml_file
from toda_tpu.datasets import build_dataloader
from toda_tpu.models import build_network

CFG_PATH = "tools/cfgs/synthetic_models/pointpillar_synthetic.yaml"


def small_cfg():
    cfg = cfg_from_yaml_file(CFG_PATH, EDict())
    # shrink for tests: 1 CPU core, keep compile fast
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [-20.0, -20.0, -3.0, 20.0, 20.0, 1.0]
    cfg.DATA_CONFIG.DATA_PROCESSOR[2].NUM_POINTS = {"train": 2048, "test": 2048}
    cfg.DATA_CONFIG.DATA_PROCESSOR[3].VOXEL_SIZE = [0.625, 0.625, 4.0]
    cfg.DATA_CONFIG.DATA_PROCESSOR[3].MAX_NUMBER_OF_VOXELS = {"train": 1024, "test": 1024}
    cfg.DATA_CONFIG.NUM_SCENES = 8
    cfg.MODEL.BACKBONE_2D.LAYER_NUMS = [1, 1]
    cfg.MODEL.BACKBONE_2D.LAYER_STRIDES = [2, 2]
    cfg.MODEL.BACKBONE_2D.NUM_FILTERS = [32, 64]
    cfg.MODEL.BACKBONE_2D.UPSAMPLE_STRIDES = [1, 2]
    cfg.MODEL.BACKBONE_2D.NUM_UPSAMPLE_FILTERS = [32, 32]
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 256
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 32
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if isinstance(v, np.ndarray) or k == "batch_size"}
    variables = bundle.init(jax.random.PRNGKey(0), batch)
    return cfg, dataset, bundle, batch, variables


def test_forward_shapes(setup):
    cfg, dataset, bundle, batch, variables = setup
    out = bundle.module.apply(variables, batch, training=False)
    n_anchors = bundle.anchors.shape[0]
    assert out["cls_preds"].shape == (2, n_anchors, 2)
    assert out["box_preds"].shape == (2, n_anchors, 7)
    assert out["dir_cls_preds"].shape == (2, n_anchors, 2)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()


def test_loss_finite_and_grad(setup):
    cfg, dataset, bundle, batch, variables = setup

    def loss_fn(params):
        total, _ = bundle.loss({"params": params, "batch_stats": variables["batch_stats"]},
                               batch)
        return total

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).sum()) > 0 for g in flat)


def test_predict_shapes(setup):
    cfg, dataset, bundle, batch, variables = setup
    dets = bundle.predict(variables, batch)
    assert dets["pred_boxes"].shape[0] == 2
    assert dets["pred_boxes"].shape[2] == 7
    assert dets["pred_scores"].shape == dets["pred_labels"].shape
    assert np.isfinite(np.asarray(dets["pred_boxes"])).all()


def test_target_assigner_sanity(setup):
    cfg, dataset, bundle, batch, variables = setup
    targets = bundle.assigner.assign(batch["gt_boxes"])
    labels = np.asarray(targets["box_cls_labels"])
    # every valid gt should force-match at least one anchor
    num_gt = int((np.asarray(batch["gt_boxes"])[..., 7] > 0).sum())
    assert (labels > 0).sum() >= num_gt * 0.8  # allow off-grid edge cases
    # ignored band exists or not, but weights only on positives
    rw = np.asarray(targets["reg_weights"])
    assert ((rw > 0) == (labels > 0)).all()

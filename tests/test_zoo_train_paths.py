"""Train-step coverage for zoo-config-only model paths that the predict-only
zoo smoke (test_model_zoo_configs) does not exercise:

- PartA2_free: anchor-free point box branch (REG_FC + PointResidualCoder)
  producing point_loss_box, and the DISABLE_PART RoI pooling.
- pv_rcnn_with_centerhead_rpn: CenterHead first-stage proposals feeding the
  RoI head during training (Detector3D._centerhead_proposals).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pathlib import Path

from toda_tpu.config import EDict, cfg_from_yaml_file
from toda_tpu.datasets import build_dataloader
from toda_tpu.models import build_network
from toda_tpu.runtime.train_utils import (
    create_train_state,
    make_train_step,
    select_batch_arrays,
)

REPO = Path(__file__).resolve().parents[1]


def _one_train_step(rel, expect_keys):
    from test_model_zoo_configs import shrink_for_smoke

    np.random.seed(0)
    cfg = cfg_from_yaml_file(str(REPO / rel), EDict())
    cfg = shrink_for_smoke(cfg)
    # real-dataset augmentors (gt_sampling) need the real dbinfos pkl
    cfg.DATA_CONFIG.pop("DATA_AUGMENTOR", None)
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    state, _ = create_train_state(bundle, cfg.OPTIMIZATION, total_steps=4,
                                  example_batch=batch)
    step = make_train_step(bundle)
    arrays = {k: jnp.asarray(v) for k, v in select_batch_arrays(batch).items()}
    state, tb = step(state, arrays)
    assert np.isfinite(float(tb["loss"])), tb
    for k in expect_keys:
        assert k in tb, (k, sorted(tb))
    return tb


def test_parta2_free_box_branch_trains():
    tb = _one_train_step(
        "tools/cfgs/kitti_models/PartA2_free.yaml",
        expect_keys=("point_loss_cls", "point_loss_part", "point_loss_box",
                     "rcnn_loss_cls"),
    )
    assert float(tb["point_loss_box"]) >= 0.0


def test_centerhead_rpn_proposals_train():
    tb = _one_train_step(
        "tools/cfgs/waymo_models/pv_rcnn_with_centerhead_rpn.yaml",
        expect_keys=("hm_loss_head_0", "rcnn_loss_cls"),
    )

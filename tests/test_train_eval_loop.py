"""Integration: the training loop reduces loss; the eval harness produces metrics;
checkpoints round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toda_tpu.config import EDict, cfg_from_yaml_file
from toda_tpu.datasets import build_dataloader
from toda_tpu.models import build_network
from toda_tpu.runtime import checkpoint as ckpt_lib
from toda_tpu.runtime.eval_utils import eval_one_epoch
from toda_tpu.runtime.train_utils import (
    create_train_state,
    make_train_step,
    select_batch_arrays,
)

CFG_PATH = "tools/cfgs/synthetic_models/pointpillar_synthetic.yaml"


def tiny_cfg():
    cfg = cfg_from_yaml_file(CFG_PATH, EDict())
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [-20.0, -20.0, -3.0, 20.0, 20.0, 1.0]
    cfg.DATA_CONFIG.DATA_PROCESSOR[2].NUM_POINTS = {"train": 2048, "test": 2048}
    cfg.DATA_CONFIG.DATA_PROCESSOR[3].VOXEL_SIZE = [0.625, 0.625, 4.0]
    cfg.DATA_CONFIG.DATA_PROCESSOR[3].MAX_NUMBER_OF_VOXELS = {"train": 1024, "test": 1024}
    cfg.DATA_CONFIG.NUM_SCENES = 4
    cfg.DATA_CONFIG.NUM_OBJECTS = [2, 4]
    cfg.MODEL.BACKBONE_2D.LAYER_NUMS = [1, 1]
    cfg.MODEL.BACKBONE_2D.LAYER_STRIDES = [2, 2]
    cfg.MODEL.BACKBONE_2D.NUM_FILTERS = [32, 64]
    cfg.MODEL.BACKBONE_2D.UPSAMPLE_STRIDES = [1, 2]
    cfg.MODEL.BACKBONE_2D.NUM_UPSAMPLE_FILTERS = [32, 32]
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 256
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 32
    cfg.OPTIMIZATION.LR = 0.003
    return cfg


@pytest.fixture(scope="module")
def trained():
    np.random.seed(0)
    cfg = tiny_cfg()
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    state, schedule = create_train_state(bundle, cfg.OPTIMIZATION, total_steps=60,
                                         example_batch=batch)
    step = make_train_step(bundle)
    losses = []
    for epoch in range(30):
        loader.set_epoch(epoch)
        for b in loader:
            arrays = {k: jnp.asarray(v) for k, v in select_batch_arrays(b).items()}
            state, tb = step(state, arrays)
            losses.append(float(tb["loss"]))
    return cfg, dataset, bundle, state, losses


def test_loss_decreases(trained):
    cfg, dataset, bundle, state, losses = trained
    first = np.mean(losses[:4])
    last = np.mean(losses[-4:])
    assert np.isfinite(losses).all()
    assert last < first * 0.6, f"loss did not drop 40%: {first:.3f} -> {last:.3f}"


def test_eval_harness(trained):
    cfg, dataset, bundle, state, losses = trained
    eval_ds, eval_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    result, det_annos = eval_one_epoch(
        bundle, variables, eval_loader, eval_ds, cfg.CLASS_NAMES
    )
    assert "mAP" in result
    assert len(det_annos) == len(eval_ds)
    assert 0.0 <= result["mAP"] <= 1.0


def test_checkpoint_roundtrip(trained, tmp_path):
    cfg, dataset, bundle, state, losses = trained
    path = ckpt_lib.save_checkpoint(tmp_path, state, epoch=3)
    restored, epoch = ckpt_lib.load_checkpoint(path, state)
    assert epoch == 3
    assert int(restored.step) == int(state.step)
    orig = jax.tree_util.tree_leaves(state.params)
    rest = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params-only transfer keeps weights, resets optimizer
    fresh = ckpt_lib.load_params_only(path, state.replace(step=0))
    assert int(fresh.step) == 0
    # the restored opt_state must keep its TYPED optax nodes (a bare orbax
    # restore rebuilds dicts; apply_gradients then crashes on attribute
    # access — the verify_r3c resume bug): one update must run
    assert jax.tree_util.tree_structure(
        restored.opt_state
    ) == jax.tree_util.tree_structure(state.opt_state)
    grads = jax.tree_util.tree_map(jnp.zeros_like, restored.params)
    restored.apply_gradients(grads=grads)

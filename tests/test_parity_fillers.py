"""Model-layer parity fillers: ATSS assigner, DynamicPillarVFE, Conv2DCollapse."""

import jax
import jax.numpy as jnp
import numpy as np

from toda_tpu.models.backbones_2d.map_to_bev import Conv2DCollapse
from toda_tpu.models.backbones_3d.vfe import DynamicPillarVFE
from toda_tpu.models.dense_heads.target_assigner.atss_target_assigner import (
    ATSSTargetAssigner,
)
from toda_tpu.utils.box_coder_utils import ResidualCoder


def test_atss_assigner_positive_selection():
    rng = np.random.RandomState(0)
    # grid of anchors and two gts; anchors overlapping gts must be positive
    xs, ys = np.meshgrid(np.arange(0, 20, 2.0), np.arange(0, 20, 2.0))
    anchors = np.stack(
        [xs.ravel(), ys.ravel(), np.zeros(xs.size), np.full(xs.size, 3.0),
         np.full(xs.size, 1.6), np.full(xs.size, 1.5), np.zeros(xs.size)], axis=1
    ).astype(np.float32)
    gts = np.zeros((2, 4, 8), np.float32)
    gts[0, 0] = [6.0, 6.0, 0.0, 3.2, 1.7, 1.5, 0.1, 1]
    gts[0, 1] = [14.0, 10.0, 0.0, 3.0, 1.6, 1.5, -0.2, 2]
    gts[1, 0] = [4.0, 16.0, 0.0, 3.1, 1.6, 1.5, 0.0, 1]

    assigner = ATSSTargetAssigner(9, ResidualCoder(code_size=7), anchors)
    out = assigner.assign(jnp.asarray(gts))
    labels = np.asarray(out["box_cls_labels"])
    assert labels.shape == (2, anchors.shape[0])
    # the anchor at each gt center must be assigned that gt's class
    for b, (gx, gy, cls) in ((0, (6, 6, 1)), (0, (14, 10, 2)), (1, (4, 16, 1))):
        ai = np.argmin((anchors[:, 0] - gx) ** 2 + (anchors[:, 1] - gy) ** 2)
        assert labels[b, ai] == cls, (b, gx, gy, labels[b, ai])
    # sample 1 has one gt; its positive count is small and targeted
    assert 1 <= (labels[1] > 0).sum() <= 9
    # regression weights normalize over positives
    rw = np.asarray(out["reg_weights"])
    np.testing.assert_allclose(rw[0].sum(), 1.0, rtol=1e-5)


def test_dynamic_pillar_vfe_shapes_and_grads():
    rng = np.random.RandomState(1)
    pts = rng.uniform(0, 8, size=(2, 300, 4)).astype(np.float32)
    mask = np.ones((2, 300), bool)
    mask[:, 250:] = False
    cfg = {"NUM_FILTERS": [32], "USE_NORM": True, "WITH_DISTANCE": False,
           "USE_ABSLOTE_XYZ": True}
    vfe = DynamicPillarVFE(
        model_cfg=cfg, num_point_features=4, voxel_size=(0.5, 0.5, 8.0),
        point_cloud_range=(0, 0, 0, 8, 8, 8), grid_size=(16, 16, 1), max_voxels=64,
    )
    bd = {"points": jnp.asarray(pts), "points_mask": jnp.asarray(mask)}
    params = vfe.init(jax.random.PRNGKey(0), bd, training=False)
    out = vfe.apply(params, bd, training=False)
    assert out["pillar_features"].shape == (2, 64, 32)
    assert np.isfinite(np.asarray(out["pillar_features"])).all()
    # occupied pillars must have nonzero features
    vm = np.asarray(out["voxel_mask"])
    pf = np.asarray(out["pillar_features"])
    assert (np.abs(pf[vm]).sum(-1) > 0).mean() > 0.9

    def loss(p):
        o = vfe.apply(p, bd, training=False)
        return (o["pillar_features"] ** 2).sum()

    g = jax.grad(lambda p: loss(p))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_conv2d_collapse():
    x = jnp.asarray(np.random.RandomState(2).randn(2, 4, 8, 8, 16).astype(np.float32))
    mod = Conv2DCollapse(model_cfg={"NUM_BEV_FEATURES": 32, "ARGS": {"kernel_size": 1}})
    bd = {"encoded_spconv_tensor": x, "encoded_spconv_tensor_stride": 8}
    params = mod.init(jax.random.PRNGKey(0), bd, training=False)
    out = mod.apply(params, bd, training=False, mutable=["batch_stats"])[0]
    assert out["spatial_features"].shape == (2, 8, 8, 32)
    assert out["spatial_features_stride"] == 8


def test_dyn_atss_detector_trains():
    """End-to-end: DynamicPillarVFE + ATSS through the full detector loss."""
    from pathlib import Path

    from toda_tpu.config import EDict, cfg_from_yaml_file
    from toda_tpu.datasets import build_dataloader
    from toda_tpu.models import build_network
    from toda_tpu.runtime.train_utils import create_train_state, make_train_step

    root = Path(__file__).resolve().parents[1]
    cfg = cfg_from_yaml_file(
        str(root / "tools/cfgs/synthetic_models/pointpillar_dyn_atss_synthetic.yaml"),
        EDict(),
    )
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    state, _ = create_train_state(
        bundle, cfg.OPTIMIZATION, total_steps=4, example_batch=batch
    )
    step = make_train_step(bundle)
    arrays = {
        "points": jnp.asarray(batch["points"]),
        "points_mask": jnp.asarray(batch["points_mask"]),
        "gt_boxes": jnp.asarray(batch["gt_boxes"]),
    }
    l0 = None
    for _ in range(3):
        state, tb = step(state, arrays)
        if l0 is None:
            l0 = float(tb["loss"])
    assert np.isfinite(float(tb["loss"])) and np.isfinite(l0)

"""CaDDN (ImageVFE + Conv2DCollapse + anchor head): forward, loss, grads."""

import numpy as np
import jax
import jax.numpy as jnp
import yaml
from pathlib import Path

from toda_tpu.config import EDict, cfg_from_yaml_file
from toda_tpu.datasets import build_dataloader
from toda_tpu.models import build_network


def test_caddn_loss_and_grads():
    root = Path(__file__).resolve().parents[1]
    cfg = cfg_from_yaml_file(
        str(root / "tools/cfgs/synthetic_models/caddn_synthetic.yaml"), EDict()
    )
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))

    rng = np.random.RandomState(0)
    b = batch["points"].shape[0]
    images = rng.uniform(0, 1, size=(b, 96, 128, 3)).astype(np.float32)
    # a simple pinhole camera at the origin looking +x (lidar) == +z (cam):
    # cam frame: x_c = -y_l, y_c = -z_l, z_c = x_l
    t_l2c = np.zeros((b, 4, 4), np.float32)
    t_l2c[:, 0, 1] = -1
    t_l2c[:, 1, 2] = -1
    t_l2c[:, 2, 0] = 1
    t_l2c[:, 3, 3] = 1
    t_c2i = np.zeros((b, 3, 4), np.float32)
    t_c2i[:, 0, 0] = 80.0
    t_c2i[:, 1, 1] = 80.0
    t_c2i[:, 0, 2] = 64.0
    t_c2i[:, 1, 2] = 48.0
    t_c2i[:, 2, 2] = 1.0

    arrays = {
        "points": jnp.asarray(batch["points"]),
        "points_mask": jnp.asarray(batch["points_mask"]),
        "gt_boxes": jnp.asarray(batch["gt_boxes"]),
        "images": jnp.asarray(images),
        "trans_lidar_to_cam": jnp.asarray(t_l2c),
        "trans_cam_to_img": jnp.asarray(t_c2i),
    }
    variables = bundle.init(jax.random.PRNGKey(0), arrays)
    loss, (tb, _) = bundle.loss(variables, arrays)
    assert np.isfinite(float(loss))
    assert "depth_loss" in tb and np.isfinite(float(tb["depth_loss"]))

    def lfn(params):
        v = dict(variables, params=params)
        l, _ = bundle.loss(v, arrays)
        return l

    g = jax.grad(lfn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # the image backbone must receive gradient (depth + detection losses)
    gsum = sum(
        float(np.abs(np.asarray(x)).sum())
        for p, x in jax.tree_util.tree_leaves_with_path(g)
        if "vfe" in str(p)
    )
    assert gsum > 0

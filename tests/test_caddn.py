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


class TestFrustumToVoxelGeometry:
    """VERDICT r4 #5 instrumentation: a delta painted at a box center's
    projected (v, u, depth-bin) frustum cell must land in that box center's
    voxel cell after the lift — i.e. image features and BEV anchor targets
    agree on where an object is."""

    def _setup(self):
        # the caddn_synthetic_cam operating point
        from toda_tpu.models.backbones_3d.vfe.image_vfe import bin_depths
        cfg = dict(
            pc_range=[0.0, -20.0, -3.0, 40.0, 20.0, 1.0],
            voxel=[0.25, 0.25, 0.25],
            grid=(160, 160, 16),
            h=96, w=128, f=76.8, ds=4,
            mode="LID", dmin=2.0, dmax=42.0, dbins=48,
        )
        l2c = np.array(
            [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], np.float32
        )
        c2i = np.array(
            [[cfg["f"], 0, cfg["w"] / 2.0, 0],
             [0, cfg["f"], cfg["h"] / 2.0, 0],
             [0, 0, 1, 0]], np.float32
        )
        return cfg, l2c, c2i, bin_depths

    def test_box_center_delta_lands_in_its_voxel(self):
        from toda_tpu.models.backbones_3d.vfe.image_vfe import lift_frustum_to_voxels

        cfg, l2c, c2i, bin_depths = self._setup()
        rng = np.random.RandomState(5)
        hits = 0
        centers = [
            (10.0, 0.0, -0.5), (20.0, 5.0, 0.0), (30.0, -8.0, -1.0),
            (15.0, 10.0, -2.0), (35.0, -3.0, 0.5), (8.0, -2.0, -1.5),
        ]
        for cx, cy, cz in centers:
            # project the center exactly like the lift does
            cam = l2c @ np.array([cx, cy, cz, 1.0], np.float32)
            depth = cam[2]
            img = c2i[:, :3] @ cam[:3] + c2i[:, 3]
            u, v = img[0] / img[2], img[1] / img[2]
            db = float(np.asarray(bin_depths(
                jnp.asarray(depth), cfg["mode"], cfg["dmin"], cfg["dmax"],
                cfg["dbins"], clamp=False)))
            hf, wf = cfg["h"] // cfg["ds"], cfg["w"] // cfg["ds"]
            frustum = np.zeros((hf, wf, cfg["dbins"], 1), np.float32)
            vi, ui, di = int(round(v / cfg["ds"])), int(round(u / cfg["ds"])), int(round(db))
            assert 0 <= vi < hf and 0 <= ui < wf and 0 <= di < cfg["dbins"], (
                f"center {(cx, cy, cz)} projects out of frustum: {(vi, ui, di)}"
            )
            frustum[vi, ui, di, 0] = 1.0
            vox = np.asarray(lift_frustum_to_voxels(
                jnp.asarray(frustum), jnp.asarray(l2c), jnp.asarray(c2i),
                cfg["grid"], cfg["pc_range"], cfg["voxel"],
                cfg["mode"], cfg["dmin"], cfg["dmax"], cfg["dbins"], cfg["ds"],
            ))  # (Z, Y, X, 1)
            assert vox.max() > 0, f"center {(cx, cy, cz)}: lift produced all zeros"
            zi, yi, xi, _ = np.unravel_index(vox.argmax(), vox.shape)
            # expected voxel indices of the center
            ex = int((cx - cfg["pc_range"][0]) / cfg["voxel"][0])
            ey = int((cy - cfg["pc_range"][1]) / cfg["voxel"][1])
            ez = int((cz - cfg["pc_range"][2]) / cfg["voxel"][2])
            # one frustum cell covers several voxels at this resolution
            # (ds=4 pixels, LID bins); the argmax must be within the cell's
            # footprint of the true center — a few voxels, not across the map
            du = abs(xi - ex) * cfg["voxel"][0]
            dv = abs(yi - ey) * cfg["voxel"][1]
            dz = abs(zi - ez) * cfg["voxel"][2]
            frustum_cell_m = depth * cfg["ds"] / cfg["f"]  # pixel-cell size at depth
            tol_xy = max(3 * frustum_cell_m, 1.5)
            assert du < tol_xy and dv < tol_xy and dz < 3.0, (
                f"center {(cx, cy, cz)}: argmax voxel {(zi, yi, xi)} vs expected "
                f"{(ez, ey, ex)} — offset ({du:.2f}, {dv:.2f}, {dz:.2f}) m, "
                f"tol {tol_xy:.2f}"
            )
            hits += 1
        assert hits == len(centers)

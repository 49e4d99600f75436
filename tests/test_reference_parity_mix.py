"""A/B parity against the reference's inter/intra-domain mixers.

cutmix and the intra-domain mixups are same-seed exact A/Bs: toda_tpu's
implementations consume the identical np.random draw sequence by construction
(pinned here), so seeding both sides equally must produce bit-identical
scenes. pseudomix is deterministic given the geometry primitives; the
reference's C++ primitives (boxes_bev_iou_cpu / points_in_boxes_cpu) are
replaced by our numpy equivalents, which are themselves pinned analytically
in tests/test_ops_geometry.py.

Reference files: pcdet/datasets/processor/inter_domain_point_cutmix.py,
inter_domain_point_pseudomix.py, intra_domain_point_mixup.py.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import reference_shim  # noqa: E402

reference_shim.setup()

from toda_tpu.datasets.processor import inter_domain_mix as my_mix  # noqa: E402
from toda_tpu.datasets.processor import intra_domain_mixup as my_mixup  # noqa: E402
from toda_tpu.utils import box_utils as my_box  # noqa: E402

ref_cutmix_mod = reference_shim.load("pcdet.datasets.processor.inter_domain_point_cutmix")
ref_pseudo_mod = reference_shim.load("pcdet.datasets.processor.inter_domain_point_pseudomix")
ref_mixup_mod = reference_shim.load("pcdet.datasets.processor.intra_domain_point_mixup")

PC_RANGE = np.array([-51.2, -51.2, -5.0, 51.2, 51.2, 3.0], np.float64)


def make_scene(seed, n_points, n_boxes, extra_cols=1):
    rng = np.random.RandomState(seed)
    pts = np.zeros((n_points, 4), np.float32)
    pts[:, 0:2] = rng.uniform(-50, 50, (n_points, 2))
    pts[:, 2] = rng.uniform(-3, 1, n_points)
    pts[:, 3] = rng.rand(n_points)
    boxes = np.zeros((n_boxes, 7 + extra_cols), np.float32)
    boxes[:, 0:2] = rng.uniform(-45, 45, (n_boxes, 2))
    boxes[:, 2] = rng.uniform(-2, 0, n_boxes)
    boxes[:, 3:6] = rng.uniform(1.0, 5.0, (n_boxes, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)
    if extra_cols:
        boxes[:, 7] = rng.randint(1, 3, n_boxes)
    names = np.asarray(["car"] * n_boxes)
    return {"points": pts, "gt_boxes": boxes, "gt_names": names}


def _cpu_points_in_boxes(points, boxes):
    return my_box.points_in_boxes_numpy(np.asarray(points), np.asarray(boxes)).astype(np.int32)


def test_cutmix_matches_reference_same_seed():
    src = make_scene(0, 20000, 12)
    tgt = make_scene(1, 25000, 10)
    for seed in (5, 6, 7):
        np.random.seed(seed)
        ref = ref_cutmix_mod.inter_domain_point_cutmix(
            {k: v.copy() for k, v in src.items() if k != "gt_names"},
            {k: v.copy() for k, v in tgt.items() if k != "gt_names"},
            PC_RANGE.copy(), inc_method="center",
        )
        np.random.seed(seed)
        mine = my_mix.cutmix(
            {k: v.copy() for k, v in src.items()},
            {k: v.copy() for k, v in tgt.items()},
            pc_range=PC_RANGE.copy(), min_points=10000,
        )
        np.testing.assert_allclose(mine["points"], ref["points"], atol=1e-6)
        np.testing.assert_allclose(mine["gt_boxes"], ref["gt_boxes"], atol=1e-6)


def test_pseudobbox_matches_reference(monkeypatch):
    monkeypatch.setattr(
        ref_pseudo_mod.iou3d_nms_utils, "boxes_bev_iou_cpu",
        lambda a, b: my_box.boxes_bev_iou_cpu(np.asarray(a), np.asarray(b)),
        raising=False,
    )
    monkeypatch.setattr(
        ref_pseudo_mod.roiaware_pool3d_utils, "points_in_boxes_cpu",
        _cpu_points_in_boxes, raising=False,
    )
    src = make_scene(2, 5000, 8)
    tgt = make_scene(3, 6000, 9)
    ref = ref_pseudo_mod.inter_domain_point_pseudobbox(
        {k: v.copy() for k, v in src.items() if k != "gt_names"},
        {k: v.copy() for k, v in tgt.items() if k != "gt_names"},
    )
    mine = my_mix.pseudomix(
        {k: v.copy() for k, v in src.items()},
        {k: v.copy() for k, v in tgt.items()},
        method="pseudobbox",
    )
    # reference output ordering: carved source points first, then target fg
    np.testing.assert_allclose(mine["points"], ref["points"], atol=1e-6)
    np.testing.assert_allclose(mine["gt_boxes"], ref["gt_boxes"], atol=1e-6)


def test_pseudobackground_matches_reference(monkeypatch):
    monkeypatch.setattr(
        ref_pseudo_mod.roiaware_pool3d_utils, "points_in_boxes_cpu",
        _cpu_points_in_boxes, raising=False,
    )
    src = make_scene(4, 5000, 8)
    tgt = make_scene(5, 6000, 9)
    ref = ref_pseudo_mod.inter_domain_point_pseudobackground(
        {k: v.copy() for k, v in src.items() if k != "gt_names"},
        {k: v.copy() for k, v in tgt.items() if k != "gt_names"},
    )
    mine = my_mix.pseudomix(
        {k: v.copy() for k, v in src.items()},
        {k: v.copy() for k, v in tgt.items()},
        method="pseudobackground",
    )
    np.testing.assert_allclose(mine["points"], ref["points"], atol=1e-6)
    np.testing.assert_allclose(mine["gt_boxes"], ref["gt_boxes"], atol=1e-6)


def test_intra_mixup_matches_reference_same_seed():
    a = make_scene(6, 4000, 6)
    b = make_scene(7, 5000, 7)
    for seed in (8, 9):
        np.random.seed(seed)
        ref = ref_mixup_mod.intra_domain_point_mixup(
            {k: v.copy() for k, v in a.items() if k != "gt_names"},
            {k: v.copy() for k, v in b.items() if k != "gt_names"},
            alpha=1.0,
        )
        np.random.seed(seed)
        mine = my_mixup.intra_domain_point_mixup(
            {k: v.copy() for k, v in a.items()},
            {k: v.copy() for k, v in b.items()},
            alpha=1.0,
        )
        np.testing.assert_allclose(mine["points"], ref["points"], atol=1e-6)
        np.testing.assert_allclose(mine["gt_boxes"], ref["gt_boxes"], atol=1e-6)


def test_intra_mixup_cd_matches_reference_same_seed(monkeypatch):
    monkeypatch.setattr(
        ref_mixup_mod.iou3d_nms_utils, "boxes_bev_iou_cpu",
        lambda x, y: my_box.boxes_bev_iou_cpu(np.asarray(x), np.asarray(y)),
        raising=False,
    )
    # overlapping scenes so the collision branch actually fires
    a = make_scene(10, 4000, 10)
    b = make_scene(10, 5000, 10)  # same box layout -> guaranteed collisions
    b["gt_boxes"][5:, 0:2] += 30.0  # but half moved away
    b["gt_boxes"][:, 0:2] = np.clip(b["gt_boxes"][:, 0:2], -45, 45)
    for seed in (11, 12):
        np.random.seed(seed)
        ref = ref_mixup_mod.intra_domain_point_mixup_cd(
            {k: v.copy() for k, v in a.items() if k != "gt_names"},
            {k: v.copy() for k, v in b.items() if k != "gt_names"},
            alpha=1.0,
        )
        np.random.seed(seed)
        mine = my_mixup.intra_domain_point_mixup_cd(
            {k: v.copy() for k, v in a.items()},
            {k: v.copy() for k, v in b.items()},
            alpha=1.0,
        )
        assert (my_box.boxes_bev_iou_cpu(a["gt_boxes"][:, :7], b["gt_boxes"][:, :7]) > 0).any()
        np.testing.assert_allclose(mine["points"], ref["points"], atol=1e-6)
        np.testing.assert_allclose(mine["gt_boxes"], ref["gt_boxes"], atol=1e-6)

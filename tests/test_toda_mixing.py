"""Unit tests for the domain-mixing transforms (stage 1/2 of TODA)."""

import numpy as np
import pytest

from toda_tpu.datasets.processor import inter_domain_mix as mix
from toda_tpu.datasets.processor.intra_domain_mixup import (
    intra_domain_point_mixup,
    intra_domain_point_mixup_cd,
)
from toda_tpu.utils import box_utils


def make_scene(rng, n_pts=2000, n_boxes=5, span=30.0, cls="car"):
    pts = rng.uniform(-span, span, (n_pts, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 1, n_pts)
    boxes = np.zeros((n_boxes, 7), dtype=np.float32)
    boxes[:, :2] = rng.uniform(-span * 0.7, span * 0.7, (n_boxes, 2))
    boxes[:, 2] = -0.5
    boxes[:, 3:6] = [4.5, 2.0, 1.7]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)
    names = np.asarray([cls] * n_boxes)
    return {"points": pts, "gt_boxes": boxes, "gt_names": names}


@pytest.fixture
def scenes(rng):
    return make_scene(rng, cls="car"), make_scene(np.random.RandomState(1), cls="car")


def test_cutmix_swaps_window(scenes, rng):
    src, tgt = scenes
    out = mix.cutmix(src, tgt, min_points=50, rng=rng)
    assert len(out["points"]) > 0
    assert len(out["gt_boxes"]) == len(out["gt_names"])
    # mixed scene contains points from both domains (4th channel differs by rng)
    assert out["points"].shape[1] == 4


def test_polarmix_sector_consistency(scenes, rng):
    src, tgt = scenes
    out = mix.polarmix(src, tgt, train_percent=0.5, width_method="ASC", rng=rng)
    assert len(out["gt_boxes"]) == len(out["gt_names"])
    # no colliding boxes after instance paste dedup
    if len(out["gt_boxes"]) > 1:
        iou = box_utils.boxes3d_nearest_bev_iou(out["gt_boxes"][:, :7], out["gt_boxes"][:, :7])
        np.fill_diagonal(iou, 0)
        assert iou.max() < 0.6  # pasted instances were deduped vs existing


def test_polarmix_curriculum_widths(rng):
    w0 = mix._sector_width_schedule("ASC", 0.0)
    w1 = mix._sector_width_schedule("ASC", 1.0)
    assert w1 > w0
    d0 = mix._sector_width_schedule("DESC", 0.0)
    d1 = mix._sector_width_schedule("DESC", 1.0)
    assert d0 > d1


def test_lasermix_partitions(scenes, rng):
    src, tgt = scenes
    for mode in ("spherical", "cylindrical"):
        out = mix.lasermix(src, tgt, mode=mode, rng=rng)
        # total points bounded by the two inputs
        assert len(out["points"]) <= len(src["points"]) + len(tgt["points"])
        assert len(out["points"]) > 0


def test_pseudomix_bbox_paste(scenes, rng):
    src, tgt = scenes
    out = mix.pseudomix(src, tgt, method="pseudobbox")
    # all target boxes that don't collide should be present
    assert len(out["gt_boxes"]) >= len(src["gt_boxes"])
    out2 = mix.pseudomix(src, tgt, method="pseudobackground")
    # background variant keeps only donor boxes
    assert len(out2["gt_boxes"]) <= len(src["gt_boxes"])


def test_mixup_lambda_fractions(scenes):
    src, tgt = scenes
    rng = np.random.RandomState(3)
    out = intra_domain_point_mixup(src, tgt, alpha=1.0, rng=rng)
    lam = out["mixup_lambda"]
    expect = round(len(src["points"]) * lam) + round(len(tgt["points"]) * (1 - lam))
    assert abs(len(out["points"]) - expect) <= 2
    assert len(out["gt_boxes"]) == len(src["gt_boxes"]) + len(tgt["gt_boxes"])


def test_mixup_cd_removes_collisions(rng):
    a = make_scene(rng)
    b = dict(a)  # identical boxes -> all collide
    b = {"points": a["points"].copy(), "gt_boxes": a["gt_boxes"].copy(),
         "gt_names": a["gt_names"].copy()}
    out = intra_domain_point_mixup_cd(a, b, rng=np.random.RandomState(5))
    assert len(out["gt_boxes"]) == len(a["gt_boxes"])  # b's duplicates dropped

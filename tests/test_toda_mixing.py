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


def test_polarmix_corner_inclusion_modes():
    """Golden region-membership cases for corner/corner_del
    (reference inter_domain_point_polarmix.swap :44-70)."""
    from toda_tpu.datasets.processor.inter_domain_mix import polarmix

    rng = np.random.RandomState(0)

    class FixedRng:
        """polarmix draws width (skipped for FIX) then start angle."""
        def __init__(self, start):
            self.start = start
        def uniform(self, a, b):
            return self.start
        def randint(self, *a):
            return 0

    # sector [0, pi/3]; a source box straddling the sector edge (center
    # outside, one corner inside at yaw slightly > 0)
    edge_box = np.asarray([[10.0, -0.5, 0.0, 4.0, 3.0, 1.6, 0.0]], np.float32)
    # center yaw = atan2(-0.5, 10) < 0 -> outside; corner at y=+1.0 -> inside
    inside_pts = np.stack([np.full(50, 10.0), np.linspace(0.5, 1.0, 50),
                           np.zeros(50), np.zeros(50)], axis=1).astype(np.float32)
    far_pts = np.asarray([[-20.0, -20.0, 0.0, 0.0]], np.float32)
    src = {"points": np.concatenate([inside_pts * [1, -1, 1, 1], far_pts]),
           "gt_boxes": edge_box, "gt_names": np.asarray(["car"])}
    tgt = {"points": far_pts.copy(), "gt_boxes": np.zeros((0, 7), np.float32),
           "gt_names": np.asarray([])}

    fr = FixedRng(0.0)
    # center mode: box center outside sector -> box kept
    out_center = polarmix(src, tgt, width_method="FIX", inc_method="center",
                          instance_paste=False, rng=fr)
    assert len(out_center["gt_boxes"]) == 1
    # corner mode: ANY corner inside -> source box dropped
    out_corner = polarmix(src, tgt, width_method="FIX", inc_method="corner",
                          instance_paste=False, rng=fr)
    assert len(out_corner["gt_boxes"]) == 0
    # corner_del additionally removes the box's points (they were outside the
    # sector so plain corner mode keeps them)
    out_cd = polarmix(src, tgt, width_method="FIX", inc_method="corner_del",
                      instance_paste=False, rng=fr)
    assert len(out_cd["points"]) < len(out_corner["points"])


def test_polarmix_pitch_band_transfer():
    """use_pitch moves out-of-sector target points whose pitch is outside the
    source pitch band (reference :80-94)."""
    from toda_tpu.datasets.processor.inter_domain_mix import polarmix

    class FixedRng:
        def uniform(self, a, b):
            return 0.0
        def randint(self, *a):
            return 0

    # source points: pitch ~0 (flat)
    src_pts = np.stack([np.linspace(5, 20, 100), np.full(100, -5.0),
                        np.zeros(100), np.zeros(100)], axis=1).astype(np.float32)
    # target: a steep-pitch point OUTSIDE the sector (yaw < 0)
    steep = np.asarray([[5.0, -5.0, 8.0, 0.0]], np.float32)
    flat_out = np.asarray([[5.0, -5.0, 0.0, 0.0]], np.float32)
    empty = np.zeros((0, 7), np.float32)
    src = {"points": src_pts, "gt_boxes": empty, "gt_names": np.asarray([])}
    tgt = {"points": np.concatenate([steep, flat_out]), "gt_boxes": empty,
           "gt_names": np.asarray([])}
    out = polarmix(src, tgt, width_method="FIX", inc_method="center",
                   use_pitch=True, instance_paste=False, rng=FixedRng())
    # the steep point transferred, the flat out-of-sector one did not
    zs = out["points"][:, 2]
    assert (zs == 8.0).any()
    out_nopitch = polarmix(src, tgt, width_method="FIX", inc_method="center",
                           use_pitch=False, instance_paste=False, rng=FixedRng())
    assert not (out_nopitch["points"][:, 2] == 8.0).any()


def test_lasermix_corner_del():
    """Partially-spanning boxes are dropped and their points deleted."""
    from toda_tpu.datasets.processor.inter_domain_mix import lasermix

    class FixedRng:
        def randint(self, *a):
            return 0

    # spherical regions over pitch; a tall box whose corners span a region edge
    box = np.asarray([[10.0, 0.0, 0.5, 2.0, 2.0, 4.0, 0.0]], np.float32)
    in_box = np.asarray([[10.0, 0.0, 0.5, 0.0]], np.float32)
    src = {"points": in_box, "gt_boxes": box, "gt_names": np.asarray(["car"])}
    tgt = {"points": np.zeros((0, 4), np.float32),
           "gt_boxes": np.zeros((0, 7), np.float32), "gt_names": np.asarray([])}
    out = lasermix(src, tgt, mode="spherical", num_regions=8,
                   pitch_range=(-0.5, 0.5), inc_method="corner_del", rng=FixedRng())
    # box spans several pitch regions -> dropped, its point deleted
    assert len(out["gt_boxes"]) == 0
    center_out = lasermix(src, tgt, mode="spherical", num_regions=8,
                          pitch_range=(-0.5, 0.5), inc_method="center", rng=FixedRng())
    assert len(out["points"]) <= len(center_out["points"])


def test_cutpolarmix_coin_flip(monkeypatch):
    """MIX_TYPE cutpolarmix: each mixed sample is cutmix OR polarmix with a
    fair coin (reference two_dataset.py:240-254)."""
    from tests.test_toda_pipeline import CLASS_NAMES, tiny_dataset_cfg
    from toda_tpu.datasets import build_dataloader, mix_dataset

    mix_cfg = tiny_dataset_cfg(seed=0)
    mix_cfg.DATASET = "CutMixDataset"
    mix_cfg.MIX_TYPE = "cutpolarmix"
    mix_cfg.CUTMIX_PROB = 1.0
    mix_cfg.SOURCE_CFG = tiny_dataset_cfg(seed=0)
    mix_cfg.TARGET_CFG = tiny_dataset_cfg(seed=100)

    calls = {"cutmix": 0, "polarmix": 0}
    orig = dict(mix_dataset.MIXERS)

    def counted(name):
        def fn(s, t, **kw):
            calls[name] += 1
            return orig[name](s, t, **kw)
        return fn

    monkeypatch.setitem(mix_dataset.MIXERS, "cutmix", counted("cutmix"))
    monkeypatch.setitem(mix_dataset.MIXERS, "polarmix", counted("polarmix"))

    np.random.seed(0)
    dataset, _, _ = build_dataloader(mix_cfg, CLASS_NAMES, batch_size=2,
                                     training=True)
    dataset.train_percent = 0.5
    for i in range(24):
        out = dataset[i % len(dataset)]
        assert out["points"].shape[1] == 4
    assert calls["cutmix"] > 0 and calls["polarmix"] > 0
    assert calls["cutmix"] + calls["polarmix"] == 24


def test_polarmix_multi_sector_and_rc_num(scenes):
    """Reference driver semantics (inter_domain_point_polarmix.py:247-300):
    one non-overlapping sector per POLARMIX_UPDATE_METHOD entry; RC_NUM
    rotate-paste copies with the FIRST copy unrotated."""
    from toda_tpu.datasets.processor.inter_domain_mix import (
        _place_sectors,
        polarmix,
    )

    src, tgt = scenes
    rng = np.random.RandomState(3)
    sectors = _place_sectors(["FIX", "FIX", "FIX"], 0.0, (np.pi / 6, np.pi), rng)
    assert len(sectors) == 3
    # pairwise non-overlap in mod-2pi arithmetic
    for i in range(3):
        for j in range(i + 1, 3):
            s0, w0 = sectors[i]
            s1, w1 = sectors[j]
            rel = (s1 - s0) % (2 * np.pi)
            assert rel >= w0 and rel <= 2 * np.pi - w1

    # rot_copy_num=0 -> no instance paste at all
    out0 = polarmix(src, tgt, width_method="FIX", rot_copy_num=0,
                    rng=np.random.RandomState(5))
    # rot_copy_num=3 -> strictly more boxes than 0 copies (dedup permitting)
    out3 = polarmix(src, tgt, width_method="FIX", rot_copy_num=3,
                    rng=np.random.RandomState(5))
    assert len(out3["gt_boxes"]) >= len(out0["gt_boxes"])
    # multi-sector swap accepts a list width_method
    outm = polarmix(src, tgt, width_method=["FIX", "FIX"], rot_copy_num=0,
                    rng=np.random.RandomState(5))
    assert outm["points"].shape[1] == 4 and len(outm["gt_names"]) == len(
        outm["gt_boxes"])


def test_polarmix_distance_limited_swap(scenes):
    """POLARMIX_DIS='RAND': swap limited to one side of a distance threshold
    (reference swap_with_range :97-160). With a threshold fraction > 0.4 the
    NEAR side swaps: all adopted target points lie within dis_th."""
    from toda_tpu.datasets.processor.inter_domain_mix import polarmix

    src, tgt = scenes

    class FixedRng:
        def __init__(self):
            self.u = 0

        def uniform(self, a, b):
            return a  # sector start = -pi, width = lo

        def random(self):
            return 0.5  # dis_th = 0.5 * range_max -> near side

    out = polarmix(src, tgt, width_method="FIX", degree=2 * np.pi,
                   polar_dis="RAND", range_max=30.0, rot_copy_num=0,
                   rng=FixedRng())
    # full-circle sector + near-side swap: every surviving point beyond
    # dis_th must be a source point, and target points inside dis_th exist
    rho = np.linalg.norm(out["points"][:, :2], axis=1)
    src_rho = np.linalg.norm(src["points"][:, :2], axis=1)
    far = out["points"][rho >= 15.0]
    src_far = src["points"][src_rho >= 15.0]
    assert len(far) == len(src_far)


def test_lasermix_reference_knob_forms(scenes, rng):
    """LASERMIX_NUM_ANGLES / NUM_AREAS / PITCH_ANGLE config forms
    (reference inter_domain_point_lasermix.py:1-195)."""
    src, tgt = scenes

    # cylindrical checkerboard: every output point must come from one of the
    # two domains, and both domains contribute
    out = mix.lasermix(src, tgt, num_angles=3, num_areas=2,
                       range_max=45.0, rng=np.random.RandomState(0))
    n_out = len(out["points"])
    assert 0 < n_out < len(src["points"]) + len(tgt["points"])
    assert len(out["gt_names"]) == len(out["gt_boxes"])

    # num_areas as a list: sampled per call without error
    out2 = mix.lasermix(src, tgt, num_angles=4, num_areas=[2, 3, 5],
                        range_max=45.0, rng=np.random.RandomState(1))
    assert len(out2["points"]) > 0

    # spherical degrees: pitch bands about the 1.8 m sensor height split the
    # scene; the union of both domain picks is a true partition per domain
    out3 = mix.lasermix(src, tgt, pitch_angles_deg=[-20, 0], num_areas=4,
                        rng=np.random.RandomState(2))
    assert len(out3["points"]) > 0
    # every region index in [0, num_areas)
    rho = np.linalg.norm(src["points"][:, :2], axis=1)
    pr = np.arctan2(src["points"][:, 2] - 1.8, rho)
    assert (pr < 0).all()  # scene below the sensor -> degrees form sensible


def test_cutmix_dataset_mixed_and_plain_batches_collate():
    """CUTMIX_PROB < 1 produces batches that interleave mixed samples (no
    template-augmentor replay artifacts) with plain ones — they must collate
    to one consistent key set (regression: KeyError 'augmentation_params')."""
    from tests.test_toda_pipeline import CLASS_NAMES, tiny_dataset_cfg
    from toda_tpu.datasets import build_dataloader

    mix_cfg = tiny_dataset_cfg(seed=0)
    mix_cfg.DATASET = "CutMixDataset"
    mix_cfg.MIX_TYPE = "cutmix"
    mix_cfg.CUTMIX_PROB = 0.5
    mix_cfg.SOURCE_CFG = tiny_dataset_cfg(seed=0)
    mix_cfg.TARGET_CFG = tiny_dataset_cfg(seed=100)
    np.random.seed(0)
    dataset, loader, _ = build_dataloader(mix_cfg, CLASS_NAMES, batch_size=4,
                                          training=True)
    items = [dataset[i % len(dataset)] for i in range(8)]
    keysets = {frozenset(it.keys()) for it in items}
    assert len(keysets) == 1, keysets
    batch = dataset.collate_batch(items)
    assert batch["points"].shape[0] == 8
    for b in loader:
        assert b["points"].ndim == 3
        break

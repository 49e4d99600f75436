"""A/B parity against the reference's stochastic augmentors.

Method: the reference functions draw their own randomness from the global
np.random stream. Each test seeds the stream, calls the reference, then
re-seeds and *mirrors the reference's documented sampling lines* to recover
the drawn parameters, which it replays into toda_tpu's record/replay ``params``
argument. This makes the comparison independent of toda_tpu's internal draw
order while still being an exact A/B of the transform math.

Where toda_tpu deliberately batches per-box loops (local rotation/scaling
compute membership once, the reference recomputes per box on the mutated
cloud), tests use non-overlapping boxes, where the two are mathematically
identical; the overlap behaviour difference is documented in docs/PARITY.md.

Reference file: pcdet/datasets/augmentor/augmentor_utils.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import reference_shim  # noqa: E402

reference_shim.setup()

from toda_tpu.datasets.augmentor import augmentor_utils as my_aug  # noqa: E402

ref_aug = reference_shim.load("pcdet.datasets.augmentor.augmentor_utils")


def make_scene(seed, n_boxes=6, n_points=800, extra=0, spread=30.0):
    """Non-overlapping boxes on a grid + uniform points (some inside boxes)."""
    rng = np.random.RandomState(seed)
    boxes = np.zeros((n_boxes, 7 + extra), dtype=np.float32)
    # grid centers 12 m apart -> boxes (<=5 m) can never overlap
    gx, gy = np.meshgrid(np.arange(3), np.arange(2))
    centers = np.stack([gx.ravel(), gy.ravel()], axis=1)[:n_boxes] * 12.0 - 12.0
    boxes[:, 0:2] = centers + rng.uniform(-1, 1, (n_boxes, 2))
    boxes[:, 2] = rng.uniform(-1, 1, n_boxes)
    boxes[:, 3:6] = rng.uniform(1.5, 5.0, (n_boxes, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)
    if extra:
        boxes[:, 7:] = rng.uniform(-3, 3, (n_boxes, extra))
    points = rng.uniform(-spread, spread, (n_points, 4)).astype(np.float32)
    points[:, 2] = rng.uniform(-3, 3, n_points)
    # plant some points inside each box so local ops act on something
    planted = []
    for b in boxes:
        local = rng.uniform(-0.5, 0.5, (30, 3)) * b[3:6] * 0.9
        c, s = np.cos(b[6]), np.sin(b[6])
        world = np.stack(
            [local[:, 0] * c - local[:, 1] * s + b[0],
             local[:, 0] * s + local[:, 1] * c + b[1],
             local[:, 2] + b[2],
             rng.rand(30).astype(np.float64)], axis=1)
        planted.append(world)
    points = np.concatenate([points] + planted).astype(np.float32)
    return boxes, points


def assert_scene_equal(my_boxes, my_points, ref_boxes, ref_points, atol=1e-4):
    np.testing.assert_allclose(my_boxes, ref_boxes, atol=atol)
    np.testing.assert_allclose(my_points, ref_points, atol=atol)


# ---------------------------------------------------------------------------
# world ops
# ---------------------------------------------------------------------------


def test_random_flip_along_x_matches_reference():
    for extra in (0, 2):
        boxes, points = make_scene(1, extra=extra)
        for seed in range(4):
            np.random.seed(seed)
            rb, rp = ref_aug.random_flip_along_x(boxes.copy(), points.copy())
            np.random.seed(seed)
            enable = np.random.choice([False, True], replace=False, p=[0.5, 0.5])
            mb, mp, used = my_aug.random_flip_along_x(boxes.copy(), points.copy(), params=enable)
            assert used == enable
            assert_scene_equal(mb, mp, rb, rp)


def test_random_flip_along_y_matches_reference():
    for extra in (0, 2):
        boxes, points = make_scene(2, extra=extra)
        for seed in range(4):
            np.random.seed(seed)
            rb, rp = ref_aug.random_flip_along_y(boxes.copy(), points.copy())
            np.random.seed(seed)
            enable = np.random.choice([False, True], replace=False, p=[0.5, 0.5])
            mb, mp, _ = my_aug.random_flip_along_y(boxes.copy(), points.copy(), params=enable)
            assert_scene_equal(mb, mp, rb, rp)


def test_global_rotation_matches_reference():
    for extra in (0, 2):
        boxes, points = make_scene(3, extra=extra)
        np.random.seed(7)
        rb, rp = ref_aug.global_rotation(boxes.copy(), points.copy(), [-0.78, 0.78])
        np.random.seed(7)
        noise = np.random.uniform(-0.78, 0.78)
        mb, mp, _ = my_aug.global_rotation(boxes.copy(), points.copy(), [-0.78, 0.78], params=noise)
        assert_scene_equal(mb, mp, rb, rp)


def test_global_scaling_matches_reference():
    boxes, points = make_scene(4, extra=2)
    np.random.seed(8)
    rb, rp = ref_aug.global_scaling(boxes.copy(), points.copy(), [0.9, 1.1])
    np.random.seed(8)
    scale = np.random.uniform(0.9, 1.1)
    mb, mp, _ = my_aug.global_scaling(boxes.copy(), points.copy(), [0.9, 1.1], params=scale)
    # reference global_scaling scales xyz+dims only (not velocity columns 7:9
    # — those are scaled by our impl per the nuScenes convention); compare 0:7
    np.testing.assert_allclose(mb[:, :7], rb[:, :7], atol=1e-4)
    np.testing.assert_allclose(mp, rp, atol=1e-4)


def test_global_translation_matches_reference():
    boxes, points = make_scene(5)
    np.random.seed(9)
    rb, rp = boxes.copy(), points.copy()
    # reference applies one draw per axis sequentially (data_augmentor
    # random_world_translation over ALONG_AXIS_LIST [x, y, z])
    rb, rp = ref_aug.random_translation_along_x(rb, rp, 0.5)
    rb, rp = ref_aug.random_translation_along_y(rb, rp, 0.5)
    rb, rp = ref_aug.random_translation_along_z(rb, rp, 0.5)
    np.random.seed(9)
    noise = [np.random.normal(0, 0.5, 1)[0] for _ in range(3)]
    mb, mp, _ = my_aug.global_translation(boxes.copy(), points.copy(), 0.5, params=noise)
    assert_scene_equal(mb, mp, rb, rp)


def test_world_frustum_dropout_matches_reference():
    boxes, points = make_scene(6)
    directions = ("top", "left", "bottom", "right")
    np.random.seed(10)
    rb, rp = boxes.copy(), points.copy()
    for d in directions:
        rb, rp = getattr(ref_aug, f"global_frustum_dropout_{d}")(rb, rp, [0.05, 0.15])
    np.random.seed(10)
    intens = [np.random.uniform(0.05, 0.15) for _ in directions]
    mb, mp, used, _ = my_aug.random_world_frustum_dropout(
        boxes.copy(), points.copy(), (0.05, 0.15), directions, params=intens
    )
    assert_scene_equal(mb, mp, rb, rp)


# ---------------------------------------------------------------------------
# local (per-object) ops
# ---------------------------------------------------------------------------


def test_local_translation_matches_reference():
    for axis_name, ref_fn, my_fn in [
        ("x", ref_aug.random_local_translation_along_x, my_aug.random_local_translation_along_x),
        ("y", ref_aug.random_local_translation_along_y, my_aug.random_local_translation_along_y),
        ("z", ref_aug.random_local_translation_along_z, my_aug.random_local_translation_along_z),
    ]:
        boxes, points = make_scene(11)
        np.random.seed(12)
        rb, rp = ref_fn(boxes.copy(), points.copy(), [-1.0, 1.0])
        np.random.seed(12)
        offsets = np.random.uniform(-1.0, 1.0, len(boxes))
        mb, mp, _ = my_fn(boxes.copy(), points.copy(), [-1.0, 1.0], params=offsets)
        assert_scene_equal(mb, mp, rb, rp)


def test_local_rotation_matches_reference():
    boxes, points = make_scene(13)
    np.random.seed(14)
    rb, rp = ref_aug.local_rotation(boxes.copy(), points.copy(), [-0.5, 0.5])
    np.random.seed(14)
    angles = np.random.uniform(-0.5, 0.5, len(boxes))
    mb, mp, _ = my_aug.random_local_rotation(boxes.copy(), points.copy(), [-0.5, 0.5], params=angles)
    assert_scene_equal(mb, mp, rb, rp)


def test_local_scaling_matches_reference():
    boxes, points = make_scene(15)
    np.random.seed(16)
    rb, rp = ref_aug.local_scaling(boxes.copy(), points.copy(), [0.8, 1.2])
    np.random.seed(16)
    scales = np.random.uniform(0.8, 1.2, len(boxes))
    mb, mp, _ = my_aug.random_local_scaling(boxes.copy(), points.copy(), [0.8, 1.2], params=scales)
    assert_scene_equal(mb, mp, rb, rp)


def test_local_frustum_dropout_matches_reference():
    boxes, points = make_scene(17)
    for d in ("top", "bottom", "left", "right"):
        np.random.seed(18)
        rb, rp = getattr(ref_aug, f"local_frustum_dropout_{d}")(
            boxes.copy(), points.copy(), [0.1, 0.4]
        )
        np.random.seed(18)
        intens = [np.random.uniform(0.1, 0.4) for _ in range(len(boxes))]
        mb, mp, _, _ = my_aug.random_local_frustum_dropout(
            boxes.copy(), points.copy(), (0.1, 0.4), (d,), params=[intens]
        )
        np.testing.assert_allclose(mb, rb, atol=1e-4)
        # the reference shrinks `points` inside its loop; surviving points are
        # an order-preserved subset on both sides
        np.testing.assert_allclose(mp, rp, atol=1e-4)


# ---------------------------------------------------------------------------
# pyramid partition ops
# ---------------------------------------------------------------------------


def test_get_pyramids_matches_reference():
    boxes, _ = make_scene(19)
    ref = ref_aug.get_pyramids(boxes[:, :7].copy())
    mine = my_aug.get_pyramids(boxes.copy()).reshape(-1, 6, 15)
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_points_in_pyramids_mask_matches_reference():
    boxes, points = make_scene(20)
    pyramids = ref_aug.get_pyramids(boxes[:, :7].copy()).reshape(-1, 6, 5, 3)
    some = pyramids[:, [0, 2, 4]].reshape(-1, 5, 3)
    ref = ref_aug.points_in_pyramids_mask(points, some)
    mine = my_aug.points_in_pyramids_mask(points, some.reshape(-1, 15))
    # Delaunay (reference) vs analytic half-spaces (ours): boundary ties only
    assert (ref != mine).mean() < 0.002


def test_local_pyramid_dropout_matches_reference():
    """Same seed on both sides: the draw sequences are identical by design
    (randint(0,6,n) then uniform(0,1,n))."""
    boxes, points = make_scene(21)
    np.random.seed(22)
    rb, rp, rpyr = ref_aug.local_pyramid_dropout(boxes[:, :7].copy(), points.copy(), 0.5)
    np.random.seed(22)
    mb, mp, mpyr = my_aug.local_pyramid_dropout(boxes[:, :7].copy(), points.copy(), 0.5)
    np.testing.assert_allclose(mb, rb, atol=1e-4)
    np.testing.assert_allclose(mp, rp, atol=1e-4)
    np.testing.assert_allclose(mpyr.reshape(-1, 30), rpyr.reshape(-1, 30), atol=1e-4)


def test_local_pyramid_sparsify_matches_reference():
    boxes, points = make_scene(23)
    np.random.seed(24)
    rb, rp, _ = ref_aug.local_pyramid_sparsify(boxes[:, :7].copy(), points.copy(), 0.8, 10)
    np.random.seed(24)
    mb, mp, _ = my_aug.local_pyramid_sparsify(boxes[:, :7].copy(), points.copy(), 0.8, 10)
    np.testing.assert_allclose(mb, rb, atol=1e-4)
    np.testing.assert_allclose(mp, rp, atol=1e-4)


def test_pyramid_ratio_transform_matches_reference():
    """The deterministic core of local_pyramid_swap: ratio coords + recovery."""
    boxes, points = make_scene(25)
    pyr = ref_aug.get_pyramids(boxes[:2, :7].copy())[0, 0]  # (15,)
    sel = points[:50]
    # reference inner helpers are nested in local_pyramid_swap; replicate the
    # documented formulas here (augmentor_utils.py:588-601) as the A side
    surface_center = (pyr[3:6] + pyr[6:9] + pyr[9:12] + pyr[12:]) / 4.0
    v0, v1, v2 = pyr[6:9] - pyr[3:6], pyr[12:] - pyr[3:6], pyr[0:3] - surface_center
    alphas = ((sel[:, 0:3] - pyr[3:6]) * v0).sum(-1) / np.power(v0, 2).sum()
    betas = ((sel[:, 0:3] - pyr[3:6]) * v1).sum(-1) / np.power(v1, 2).sum()
    gammas = ((sel[:, 0:3] - surface_center) * v2).sum(-1) / np.power(v2, 2).sum()
    rec_ref = (alphas[:, None] * v0 + betas[:, None] * v1) + pyr[3:6] + gammas[:, None] * v2

    my_ratios = my_aug._pyramid_ratio_coords(sel, pyr)
    np.testing.assert_allclose(my_ratios[0], alphas, atol=1e-4)
    np.testing.assert_allclose(my_ratios[1], betas, atol=1e-4)
    np.testing.assert_allclose(my_ratios[2], gammas, atol=1e-4)
    rec_my = my_aug._pyramid_points_from_ratio(my_ratios, pyr)
    np.testing.assert_allclose(rec_my, rec_ref, atol=1e-4)

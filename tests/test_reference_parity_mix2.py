"""A/B parity for the polarmix / lasermix machinery against the reference.

Angle-frame note: the reference computes sector membership in a NEGATED yaw
frame (yaw = -arctan2(y, x), inter_domain_point_polarmix.py:48); toda_tpu uses
the positive frame with (start, width) mod-2pi intervals. A reference sector
(st, en) maps to ours as start=-en, width=en-st — the tests convert
explicitly, so these are exact geometric A/Bs, not distributional ones.

CUDA primitives (boxes_bev_iou_cpu / points_in_boxes_cpu) are monkeypatched on
the reference side with our numpy equivalents (analytically pinned in
tests/test_ops_geometry.py) so both sides share them.

Known deliberate delta (documented in docs/PARITY.md, not tested here): the
reference driver passes inc_method into laser_mix_transform_sph's integer
``order`` parameter (inter_domain_point_lasermix.py:188-193), so `i % 2 ==
order` is always False and the "mixed" spherical output is just the target
scene. We A/B the transform FUNCTION with a proper integer order instead.
"""

import sys
import types
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent))
import reference_shim  # noqa: E402

reference_shim.setup()

from toda_tpu.datasets.processor import inter_domain_mix as my_mix  # noqa: E402
from toda_tpu.utils import box_utils as my_box  # noqa: E402

ref_polar = reference_shim.load("pcdet.datasets.processor.inter_domain_point_polarmix")
ref_laser = reference_shim.load("pcdet.datasets.processor.inter_domain_point_lasermix")
ref_box = reference_shim.load("pcdet.utils.box_utils")


def _cpu_points_in_boxes(points, boxes):
    p = points.numpy() if torch.is_tensor(points) else np.asarray(points)
    b = boxes.numpy() if torch.is_tensor(boxes) else np.asarray(boxes)
    return torch.from_numpy(
        my_box.points_in_boxes_numpy(p, b).astype(np.int32)
    )


def patch_primitives(monkeypatch):
    monkeypatch.setattr(
        ref_box.roiaware_pool3d_utils, "points_in_boxes_cpu", _cpu_points_in_boxes,
        raising=False,
    )
    monkeypatch.setattr(
        ref_polar.iou3d_nms_utils, "boxes_bev_iou_cpu",
        lambda a, b: my_box.boxes_bev_iou_cpu(np.asarray(a), np.asarray(b)),
        raising=False,
    )
    monkeypatch.setattr(
        ref_polar.roiaware_pool3d_utils, "points_in_boxes_cpu", _cpu_points_in_boxes,
        raising=False,
    )


def make_scene(seed, n_points=6000, n_boxes=10):
    rng = np.random.RandomState(seed)
    pts = np.zeros((n_points, 4), np.float32)
    rho = rng.uniform(2, 50, n_points)
    ang = rng.uniform(-np.pi, np.pi, n_points)
    pts[:, 0] = rho * np.cos(ang)
    pts[:, 1] = rho * np.sin(ang)
    pts[:, 2] = rng.uniform(-2, 2, n_points)
    pts[:, 3] = rng.rand(n_points)
    boxes = np.zeros((n_boxes, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-40, 40, (n_boxes, 2))
    boxes[:, 2] = rng.uniform(-1.5, 0, n_boxes)
    boxes[:, 3:6] = rng.uniform(1.5, 4.5, (n_boxes, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)
    names = np.asarray(["car"] * n_boxes)
    return {"points": pts, "gt_boxes": boxes, "gt_names": names}


def sortrows(a):
    a = np.asarray(a)
    if len(a) == 0:
        return a
    return a[np.lexsort(a.T[::-1])]


# ---------------------------------------------------------------------------
# polarmix sector swap
# ---------------------------------------------------------------------------


def _run_sector_swap(inc_method, use_pitch, monkeypatch):
    patch_primitives(monkeypatch)
    src = make_scene(0)
    tgt = make_scene(1)
    st, en = -0.9, 0.7  # fixed reference-frame sector
    rp, rb = ref_polar.swap(
        src["points"].copy(), tgt["points"].copy(), st, en,
        src["gt_boxes"].copy(), tgt["gt_boxes"].copy(),
        inc_method=inc_method, use_pitch=use_pitch,
    )
    mp, mb, _ = my_mix._sector_swap(
        src["points"].copy(), src["gt_boxes"].copy(), src["gt_names"].copy(),
        tgt["points"].copy(), tgt["gt_boxes"].copy(), tgt["gt_names"].copy(),
        start=-en, width=en - st, inc_method=inc_method, use_pitch=use_pitch,
    )
    np.testing.assert_allclose(sortrows(mp), sortrows(rp), atol=1e-6)
    np.testing.assert_allclose(sortrows(mb), sortrows(rb), atol=1e-6)


def test_polarmix_swap_center_matches_reference(monkeypatch):
    _run_sector_swap("center", False, monkeypatch)


def test_polarmix_swap_corner_matches_reference(monkeypatch):
    _run_sector_swap("corner", False, monkeypatch)


def test_polarmix_swap_corner_del_matches_reference(monkeypatch):
    _run_sector_swap("corner_del", False, monkeypatch)


def test_polarmix_swap_pitch_matches_reference(monkeypatch):
    _run_sector_swap("center", True, monkeypatch)


def test_polarmix_swap_with_range_matches_reference(monkeypatch):
    """POLARMIX_DIS=RAND: distance-limited sector swap. Same-seed dis_th."""
    patch_primitives(monkeypatch)
    src = make_scene(2)
    tgt = make_scene(3)
    st, en = -0.4, 1.3
    range_max = 54.0
    for seed in (4, 5):  # one seed lands dis_th above the 0.4 cut, one below
        np.random.seed(seed)
        rp, rb = ref_polar.swap_with_range(
            src["points"].copy(), tgt["points"].copy(), st, en,
            src["gt_boxes"].copy(), tgt["gt_boxes"].copy(),
            pc_range=np.array([-54.0, -54.0, -5.0, range_max, 54.0, 3.0]),
        )
        np.random.seed(seed)
        dis_th = np.random.random() * range_max

        def dist_mask(xy, _th=dis_th):
            rho = np.linalg.norm(np.asarray(xy)[:, :2], axis=1)
            return rho < _th if _th / range_max > 0.4 else rho > _th

        mp, mb, _ = my_mix._sector_swap(
            src["points"].copy(), src["gt_boxes"].copy(), src["gt_names"].copy(),
            tgt["points"].copy(), tgt["gt_boxes"].copy(), tgt["gt_names"].copy(),
            start=-en, width=en - st, inc_method="center", use_pitch=False,
            dist_mask=dist_mask,
        )
        np.testing.assert_allclose(sortrows(mp), sortrows(rp), atol=1e-6)
        np.testing.assert_allclose(sortrows(mb), sortrows(rb), atol=1e-6)


class FakeRng:
    """Deterministic rng stub: serves scripted values per method."""

    def __init__(self, uniforms=(), randints=(), choices=(), randoms=()):
        self.uniforms = list(uniforms)
        self.randints = list(randints)
        self.choices = list(choices)
        self.randoms = list(randoms)

    def uniform(self, *a, **k):
        return self.uniforms.pop(0)

    def randint(self, *a, **k):
        return self.randints.pop(0)

    def choice(self, *a, **k):
        return self.choices.pop(0)

    def random(self, *a, **k):
        return self.randoms.pop(0)


def test_polarmix_rotate_paste_matches_reference(monkeypatch):
    """Instance rotate-paste: our polarmix with no sectors vs the reference
    rotate_copy + paste sequence, same omegas on both sides."""
    patch_primitives(monkeypatch)
    src = make_scene(6)
    tgt = make_scene(7)
    omega1, omega2 = 0.8, 2.5
    # reference path (polarmix() :228-241 rotate-pasting branch)
    pts_copy, labels_copy = ref_polar.rotate_copy(
        tgt["points"].copy(), tgt["gt_boxes"].copy(), [0.0, omega1, omega2],
        src["gt_boxes"].copy(),
    )
    rp = ref_box.remove_points_in_boxes3d(src["points"].copy(), labels_copy[:, :7])
    rp = np.concatenate([rp, pts_copy])
    rb = np.concatenate([src["gt_boxes"], labels_copy])

    mine = my_mix.polarmix(
        src, tgt, width_method=[], rot_copy_num=3,
        rng=FakeRng(uniforms=[omega1, omega2 - 2 * np.pi / 3]),
    )
    np.testing.assert_allclose(sortrows(mine["points"]), sortrows(rp), atol=1e-5)
    np.testing.assert_allclose(sortrows(mine["gt_boxes"]), sortrows(rb), atol=1e-5)


# ---------------------------------------------------------------------------
# lasermix
# ---------------------------------------------------------------------------


def clamp_pitch(scene, pitch_deg, sensor=1.8):
    """Keep only points whose sensor-frame pitch lies inside the band range.

    Deliberate delta (docs/PARITY.md): the reference clips radian pitch to
    DEGREE-valued bounds (inter_domain_point_lasermix.py:44-58), a no-op, so
    out-of-band points fall outside every band and are silently dropped; we
    clip into the edge bands (the upstream mmdetection3d semantics). On
    in-band scenes the two are identical — which is what this A/B pins."""
    lo, hi = np.radians(pitch_deg[0]), np.radians(pitch_deg[1])
    out = dict(scene)
    for key, arr in (("points", scene["points"]), ("gt_boxes", scene["gt_boxes"])):
        rho = np.linalg.norm(arr[:, :2], axis=1)
        pitch = np.arctan2(arr[:, 2] - sensor, rho)
        keep = (pitch > lo + 1e-4) & (pitch < hi - 1e-4)
        out[key] = arr[keep]
        if key == "gt_boxes":
            out["gt_names"] = np.asarray(scene["gt_names"])[keep]
    return out


def test_lasermix_spherical_matches_reference():
    """Spherical pitch-band interleave (function-level, integer order)."""
    pitch_deg = [-25.0, 3.0]
    src = clamp_pitch(make_scene(8), pitch_deg)
    tgt = clamp_pitch(make_scene(9), pitch_deg)
    na = 6
    np.random.seed(10)
    ref = ref_laser.laser_mix_transform_sph(
        {"points": src["points"].copy(), "gt_boxes": src["gt_boxes"].copy()},
        {"points": tgt["points"].copy(), "gt_boxes": tgt["gt_boxes"].copy()},
        pitch_angles=pitch_deg, num_areas=[na], order=0,
    )
    got = None
    for offset in (0, 1):
        mine = my_mix.lasermix(
            src, tgt, pitch_angles_deg=pitch_deg, num_areas=na,
            inc_method="center", sensor_height=1.8,
            rng=FakeRng(randints=[offset], choices=[na]),
        )
        try:
            np.testing.assert_allclose(
                sortrows(mine["points"]), sortrows(ref["points"]), atol=1e-6
            )
            np.testing.assert_allclose(
                sortrows(mine["gt_boxes"]), sortrows(ref["gt_boxes"]), atol=1e-6
            )
            got = offset
            break
        except AssertionError:
            continue
    assert got is not None, "neither band parity reproduces the reference sets"


def test_lasermix_spherical_box_banding_matches_reference():
    """Box banding uses the same sensor-height pitch as points: band counts of
    boxes agree with the reference's pitch_box computation."""
    src = make_scene(11)
    boxes = src["gt_boxes"]
    pitch_deg = [-25.0, 3.0]
    rho = np.sqrt(boxes[:, 0] ** 2 + boxes[:, 1] ** 2)
    ref_pitch = np.arctan2(-1.8 + boxes[:, 2], rho)
    lo, hi = np.radians(pitch_deg[0]), np.radians(pitch_deg[1])
    edges = np.linspace(lo, hi, 7)
    ref_band = np.digitize(np.clip(ref_pitch, lo + 1e-6, hi - 1e-6), edges) - 1
    # ours (the region_of closure) — recompute via the public function by
    # checking which parity keeps each box alone
    for j in range(len(boxes)):
        one = {"points": src["points"][:1], "gt_boxes": boxes[j : j + 1],
               "gt_names": src["gt_names"][j : j + 1]}
        empty = {"points": src["points"][:1] + 1000.0,
                 "gt_boxes": np.zeros((0, 7), np.float32),
                 "gt_names": np.asarray([])}
        out = my_mix.lasermix(
            one, empty, pitch_angles_deg=pitch_deg, num_areas=6,
            inc_method="center", rng=FakeRng(randints=[ref_band[j] % 2], choices=[6]),
        )
        assert len(out["gt_boxes"]) == 1, f"box {j} banding disagrees"


def test_lasermix_cylindrical_matches_reference():
    """Cylindrical checkerboard (yaw sectors x range rings), center rule.
    Phase conversion: reference shifts NEGATED yaw by P_ANG; ours shifts
    positive yaw by phase — phase = -P_ANG puts the cell boundaries on the
    same lattice, and the two parities cover the mirrored checkerboard."""
    src = make_scene(12)
    tgt = make_scene(13)
    num_angles, na = 4, 3
    range_max = 54.0
    pc_range = np.array([-54.0, -54.0, -5.0, range_max, 54.0, 3.0])
    np.random.seed(14)
    ref = ref_laser.laser_mix_transform_cyc(
        {"points": src["points"].copy(), "gt_boxes": src["gt_boxes"].copy()},
        {"points": tgt["points"].copy(), "gt_boxes": tgt["gt_boxes"].copy()},
        num_areas=na, num_angles=num_angles, pc_range=pc_range,
        inc_method="center",
    )
    np.random.seed(14)
    p_ang = np.random.uniform(-3.141592, 3.141952)
    got = None
    for offset in (0, 1):
        mine = my_mix.lasermix(
            src, tgt, num_angles=num_angles, num_areas=na, range_max=range_max,
            inc_method="center",
            rng=FakeRng(randints=[offset], choices=[na], uniforms=[-p_ang]),
        )
        try:
            np.testing.assert_allclose(
                sortrows(mine["points"]), sortrows(ref["points"]), atol=1e-6
            )
            np.testing.assert_allclose(
                sortrows(mine["gt_boxes"]), sortrows(ref["gt_boxes"]), atol=1e-6
            )
            got = offset
            break
        except AssertionError:
            continue
    assert got is not None, "neither parity reproduces the reference checkerboard"

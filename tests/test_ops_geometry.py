"""Numerical tests: jnp geometry kernels vs host numpy golden implementations."""

import numpy as np
import jax.numpy as jnp

from toda_tpu.ops import boxes_iou_bev, boxes_iou3d, nms_bev, points_in_boxes
from toda_tpu.utils import box_utils


def random_boxes(rng, n, span=20.0):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-span, span, (n, 2))
    boxes[:, 2] = rng.uniform(-2, 2, n)
    boxes[:, 3:5] = rng.uniform(1.0, 5.0, (n, 2))
    boxes[:, 5] = rng.uniform(1.0, 3.0, n)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


class TestRotatedIoU:
    def test_identical_boxes(self):
        b = np.array([[0, 0, 0, 4, 2, 1.5, 0.3]], dtype=np.float32)
        iou = np.asarray(boxes_iou_bev(jnp.asarray(b), jnp.asarray(b)))
        assert abs(iou[0, 0] - 1.0) < 1e-4

    def test_disjoint(self):
        a = np.array([[0, 0, 0, 2, 2, 2, 0.0]], dtype=np.float32)
        b = np.array([[10, 10, 0, 2, 2, 2, 0.5]], dtype=np.float32)
        iou = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
        assert iou[0, 0] == 0.0

    def test_axis_aligned_analytic(self):
        # two unit squares overlapping by half
        a = np.array([[0, 0, 0, 2, 2, 2, 0.0]], dtype=np.float32)
        b = np.array([[1, 0, 0, 2, 2, 2, 0.0]], dtype=np.float32)
        iou = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
        # inter = 2, union = 4 + 4 - 2 = 6
        assert abs(iou[0, 0] - 2.0 / 6.0) < 1e-4

    def test_rotated_45_analytic(self):
        # square rotated 45deg inside same-center square: inter = rotated area iff
        # diag fits: 2x2 square vs sqrt2 x sqrt2 rotated 45 -> rotated diamond
        # vertices at (±1, 0), (0, ±1): fully inside. inter = 2, union = 4.
        a = np.array([[0, 0, 0, 2, 2, 2, 0.0]], dtype=np.float32)
        b = np.array([[0, 0, 0, np.sqrt(2), np.sqrt(2), 2, np.pi / 4]], dtype=np.float32)
        iou = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
        assert abs(iou[0, 0] - 0.5) < 1e-3

    def test_matches_cpu_golden(self, rng):
        a = random_boxes(rng, 24)
        b = random_boxes(rng, 16)
        got = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
        want = box_utils.boxes_bev_iou_cpu(a, b)
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_iou3d_z_disjoint(self):
        a = np.array([[0, 0, 0, 2, 2, 2, 0.0]], dtype=np.float32)
        b = np.array([[0, 0, 5, 2, 2, 2, 0.0]], dtype=np.float32)
        iou = np.asarray(boxes_iou3d(jnp.asarray(a), jnp.asarray(b)))
        assert iou[0, 0] == 0.0


class TestNMS:
    def test_suppresses_duplicates(self, rng):
        base = random_boxes(rng, 8)
        jitter = base.copy()
        jitter[:, 0:2] += 0.05
        boxes = np.concatenate([base, jitter])
        scores = np.concatenate([np.ones(8), 0.5 * np.ones(8)]).astype(np.float32)
        idx, mask = nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                            pre_maxsize=16, post_maxsize=16)
        idx, mask = np.asarray(idx), np.asarray(mask)
        kept = set(idx[mask].tolist())
        assert mask.sum() == 8
        assert kept == set(range(8))  # high-score originals survive

    def test_keeps_disjoint(self, rng):
        boxes = np.zeros((4, 7), dtype=np.float32)
        boxes[:, 0] = np.arange(4) * 20
        boxes[:, 3:6] = 2
        scores = rng.rand(4).astype(np.float32)
        idx, mask = nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.1,
                            pre_maxsize=4, post_maxsize=4)
        assert np.asarray(mask).sum() == 4

    def test_respects_valid_mask(self, rng):
        boxes = random_boxes(rng, 8)
        scores = rng.rand(8).astype(np.float32)
        vm = np.zeros(8, dtype=bool)
        vm[:3] = True
        idx, mask = nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.9,
                            pre_maxsize=8, post_maxsize=8, valid_mask=jnp.asarray(vm))
        idx, mask = np.asarray(idx), np.asarray(mask)
        assert set(idx[mask].tolist()) <= {0, 1, 2}


class TestRotatedIoUVsHostGolden:
    """Dense randomized pin of the device edge-clip IoU against the host
    float64 Sutherland–Hodgman golden (box_utils.boxes_bev_iou_cpu)."""

    def test_random_dense(self):
        rng = np.random.RandomState(3)
        a = random_boxes(rng, 80, span=15.0)
        b = random_boxes(rng, 60, span=15.0)
        want = box_utils.boxes_bev_iou_cpu(a, b)
        got = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_touching_and_axis_aligned(self):
        # abutting boxes (shared edge), nested boxes, identical boxes
        a = np.array([
            [0, 0, 0, 2, 2, 1, 0.0],
            [5, 5, 0, 4, 4, 1, 0.0],
            [10, 0, 0, 2, 2, 1, np.pi / 2],
        ], dtype=np.float32)
        b = np.array([
            [2, 0, 0, 2, 2, 1, 0.0],   # abuts a[0] exactly -> IoU 0
            [5, 5, 0, 2, 2, 1, 0.0],   # nested in a[1] -> 4/16
            [10, 0, 0, 2, 2, 1, np.pi / 2],  # identical to a[2] -> 1
        ], dtype=np.float32)
        got = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
        want = box_utils.boxes_bev_iou_cpu(a, b)
        np.testing.assert_allclose(got, want, atol=2e-3)
        assert abs(got[0, 0]) < 1e-2
        assert abs(got[1, 1] - 0.25) < 1e-3
        assert abs(got[2, 2] - 1.0) < 1e-3

    def test_rotated_cross(self):
        # the classic 45-degree cross: two identical squares, one rotated
        a = np.array([[0, 0, 0, 2, 2, 1, 0.0]], dtype=np.float32)
        b = np.array([[0, 0, 0, 2, 2, 1, np.pi / 4]], dtype=np.float32)
        got = float(np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))[0, 0])
        want = float(box_utils.boxes_bev_iou_cpu(a, b)[0, 0])
        assert abs(got - want) < 1e-3


def greedy_nms_host(iou, scores, thresh):
    """Plain sequential greedy NMS over a precomputed IoU matrix (the
    reference semantics of pcdet iou3d_nms_kernel.cu nms_gpu, run on host).
    Returns the keep mask in score-rank order."""
    order = np.argsort(-scores, kind="stable")
    n = len(scores)
    keep = np.zeros(n, dtype=bool)
    suppressed = np.zeros(n, dtype=bool)
    for r in range(n):
        i = order[r]
        if suppressed[i]:
            continue
        keep[i] = True
        for rr in range(r + 1, n):
            j = order[rr]
            if iou[i, j] > thresh:
                suppressed[j] = True
    return keep


class TestNMSFixedPointMatchesGreedy:
    """The while_loop iterative-closure NMS (ops/nms.py) must produce the
    EXACT keep-set of sequential greedy NMS on randomized dense cases —
    the pin VERDICT r4 asked for alongside the parallel formulation."""

    def test_randomized_equivalence(self):
        rng = np.random.RandomState(7)
        for trial, (n, thresh) in enumerate(
            [(64, 0.1), (64, 0.5), (128, 0.3), (256, 0.01), (256, 0.7), (512, 0.2)]
        ):
            # dense overlapping field: small span so chains of suppression form
            boxes = random_boxes(rng, n, span=12.0)
            scores = rng.rand(n).astype(np.float64)
            scores = np.unique(scores)[:n]  # distinct scores -> unique greedy order
            rng.shuffle(scores)
            scores = scores.astype(np.float32)
            n = len(scores)
            boxes = boxes[:n]
            iou = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
            want = greedy_nms_host(iou, scores, thresh)
            idx, mask = nms_bev(
                jnp.asarray(boxes), jnp.asarray(scores), thresh,
                pre_maxsize=n, post_maxsize=n,
            )
            got = set(np.asarray(idx)[np.asarray(mask)].tolist())
            assert got == set(np.flatnonzero(want).tolist()), (
                f"trial {trial}: n={n} thresh={thresh} "
                f"missing={set(np.flatnonzero(want).tolist()) - got} "
                f"extra={got - set(np.flatnonzero(want).tolist())}"
            )

    def test_long_suppression_chain(self):
        # a 1-D chain of half-overlapping boxes with descending scores: greedy
        # keeps every other box — the worst case for iterative closure depth
        n = 64
        boxes = np.zeros((n, 7), dtype=np.float32)
        boxes[:, 0] = np.arange(n) * 1.0
        boxes[:, 3] = 2.0  # dx=2, spacing 1 -> IoU(adjacent)=1/3
        boxes[:, 4] = 2.0
        boxes[:, 5] = 1.0
        scores = np.linspace(1.0, 0.5, n).astype(np.float32)
        iou = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
        want = greedy_nms_host(iou, scores, 0.3)
        idx, mask = nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.3,
                            pre_maxsize=n, post_maxsize=n)
        got = set(np.asarray(idx)[np.asarray(mask)].tolist())
        assert got == set(np.flatnonzero(want).tolist())
        assert got == set(range(0, n, 2))


class TestCircleNMSFixedPointMatchesGreedy:
    def test_randomized_equivalence(self):
        from toda_tpu.ops.nms import circle_nms

        rng = np.random.RandomState(11)
        for n, radius in [(64, 2.0), (256, 1.0), (256, 4.0)]:
            centers = rng.uniform(-20, 20, (n, 2)).astype(np.float32)
            scores = rng.rand(n).astype(np.float32)
            # host greedy over the same close matrix
            d2 = ((centers[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
            close = d2 < radius**2
            want = greedy_nms_host(
                np.where(close, 1.0, 0.0), scores, 0.5
            )  # close==True -> "iou" 1.0 > 0.5 suppresses
            idx, mask = circle_nms(
                jnp.asarray(centers), jnp.asarray(scores), radius, post_maxsize=n
            )
            got = set(np.asarray(idx)[np.asarray(mask)].tolist())
            assert got == set(np.flatnonzero(want).tolist())


class TestPointsInBoxes:
    def test_matches_numpy(self, rng):
        boxes = random_boxes(rng, 10)
        pts = rng.uniform(-25, 25, (500, 4)).astype(np.float32)
        got = np.asarray(points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))
        want = box_utils.points_in_boxes_numpy(pts, boxes)
        # boundary points may differ by fp tolerance; interior must agree
        disagree = got != want
        assert disagree.mean() < 0.01

    def test_zero_box_matches_nothing(self, rng):
        boxes = np.zeros((3, 7), dtype=np.float32)
        pts = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
        got = np.asarray(points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))
        assert not got.any()


class TestMultiClassNMS:
    def test_per_class_separation(self, rng):
        from toda_tpu.ops.nms import multi_classes_nms
        import jax.numpy as jnp

        boxes = np.zeros((6, 7), dtype=np.float32)
        boxes[:, 0] = [0, 0.1, 20, 20.1, 40, 60]
        boxes[:, 3:6] = 2
        # class 1 strong on first pair, class 2 strong on second pair
        scores = np.zeros((6, 2), dtype=np.float32)
        scores[0, 0], scores[1, 0] = 0.9, 0.8
        scores[2, 1], scores[3, 1] = 0.9, 0.8
        scores[4, 0], scores[5, 1] = 0.7, 0.7
        b, s, l, m = multi_classes_nms(
            jnp.asarray(scores), jnp.asarray(boxes), num_class=2,
            score_thresh=0.5, nms_thresh=0.3, pre_maxsize=6, post_maxsize=6,
        )
        b, s, l, m = map(np.asarray, (b, s, l, m))
        kept = l[m]
        # overlapping same-class pairs suppressed; one survivor each + singles
        assert (kept == 1).sum() == 2  # box0 + box4
        assert (kept == 2).sum() == 2  # box2 + box5


def test_rotated_iou_far_from_origin():
    """Self-IoU of rotated boxes stays ~1 at scene-scale coordinates (f32
    rounding at |xy|~50m broke the fixed-epsilon inside test)."""
    import jax.numpy as jnp
    import numpy as np

    from toda_tpu.ops.rotated_iou import boxes_iou3d, boxes_iou_bev

    rng = np.random.RandomState(3)
    n = 64
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(-50, 50, n)
    boxes[:, 1] = rng.uniform(-50, 50, n)
    boxes[:, 2] = rng.uniform(-2, 1, n)
    boxes[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    for fn in (boxes_iou_bev, boxes_iou3d):
        diag = np.diag(np.asarray(fn(jnp.asarray(boxes), jnp.asarray(boxes))))
        assert (diag > 0.98).all(), diag.min()

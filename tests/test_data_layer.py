"""Data layer tests: synthetic dataset, static-shape contract, aug record/replay."""

import numpy as np
import pytest
import yaml

from toda_tpu.config import EDict
from toda_tpu.datasets import build_dataloader
from toda_tpu.datasets.augmentor import augmentor_utils

CFG_PATH = "tools/cfgs/dataset_configs/synthetic_dataset.yaml"
CLASS_NAMES = ["car", "pedestrian"]


@pytest.fixture(scope="module")
def data_cfg():
    with open(CFG_PATH) as f:
        return EDict(yaml.safe_load(f))


def test_static_shapes(data_cfg):
    ds, loader, _ = build_dataloader(data_cfg, CLASS_NAMES, batch_size=2, training=True)
    batch = next(iter(loader))
    assert batch["points"].shape == (2, 8192, 4)
    assert batch["points_mask"].shape == (2, 8192)
    assert batch["gt_boxes"].shape == (2, 32, 8)
    assert batch["batch_size"] == 2
    # class ids are 1-indexed, padding rows zero
    cls = batch["gt_boxes"][..., 7]
    valid = cls > 0
    assert valid.any()
    assert set(np.unique(cls[valid])) <= {1.0, 2.0}
    # padded box rows are fully zero
    assert (batch["gt_boxes"][~valid] == 0).all()


def test_deterministic_scenes(data_cfg):
    ds, _, _ = build_dataloader(data_cfg, CLASS_NAMES, batch_size=2, training=False)
    p1, b1, n1 = ds.get_raw_scene(3)
    p2, b2, n2 = ds.get_raw_scene(3)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(b1, b2)


def test_eval_shapes(data_cfg):
    ds, loader, _ = build_dataloader(data_cfg, CLASS_NAMES, batch_size=2, training=False)
    batch = next(iter(loader))
    assert not ds.training
    assert batch["points"].shape[0] == 2


def test_augmentation_recorded(data_cfg):
    ds, loader, _ = build_dataloader(data_cfg, CLASS_NAMES, batch_size=1, training=True)
    item = ds[0]
    names = [n for n, _ in item["augmentation_params"]]
    assert "random_world_rotation" in names
    assert "random_world_scaling" in names


def test_replay_reproduces(data_cfg):
    from toda_tpu.datasets import build_dataset

    ds = build_dataset(data_cfg, CLASS_NAMES, training=True)
    np.random.seed(7)
    item1 = ds[0]
    replay = item1["augmentation_params"]
    # replay with different global rng state must give identical output
    points, gt_boxes, gt_names = ds.get_raw_scene(0)
    np.random.seed(123)
    item2 = ds.prepare_data(
        {"points": points, "gt_boxes": gt_boxes, "gt_names": gt_names,
         "frame_id": 0, "replay_params": replay}
    )
    # box geometry identical (point sampling/shuffle still random)
    v1 = item1["gt_boxes"][item1["gt_boxes"][:, 7] > 0]
    v2 = item2["gt_boxes"][item2["gt_boxes"][:, 7] > 0]
    np.testing.assert_allclose(v1, v2, atol=1e-5)


def test_reverse_transform_roundtrip(rng):
    boxes = np.zeros((5, 7), dtype=np.float32)
    boxes[:, :3] = rng.uniform(-10, 10, (5, 3))
    boxes[:, 3:6] = rng.uniform(1, 4, (5, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 5)
    pts = rng.uniform(-10, 10, (20, 4)).astype(np.float32)

    b, p, f = augmentor_utils.random_flip_along_x(boxes, pts, params=True)
    params = [("random_world_flip_x", f)]
    b, p, r = augmentor_utils.global_rotation(b, p, [-0.5, 0.5])
    params.append(("random_world_rotation", r))
    b, p, s = augmentor_utils.global_scaling(b, p, [0.9, 1.1])
    params.append(("random_world_scaling", s))

    restored = augmentor_utils.reverse_boxes_transform(b, params)
    np.testing.assert_allclose(restored[:, :6], boxes[:, :6], atol=1e-4)
    # headings equal modulo 2pi
    dh = (restored[:, 6] - boxes[:, 6] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dh, 0, atol=1e-4)


def test_gt_sampling(data_cfg, tmp_path):
    """DataBaseSampler pastes DB objects and carves background."""
    import pickle

    from toda_tpu.datasets import build_dataset
    from toda_tpu.datasets.augmentor.database_sampler import DataBaseSampler

    ds = build_dataset(data_cfg, CLASS_NAMES, training=True)
    db = ds.create_groundtruth_database(num_scenes=8)
    db_path = tmp_path / "db_infos.pkl"
    with open(db_path, "wb") as f:
        pickle.dump(db, f)

    sampler_cfg = EDict(
        {
            "DB_INFO_PATH": [str(db_path)],
            "PREPARE": {"filter_by_min_points": ["car:5", "pedestrian:5"]},
            "SAMPLE_GROUPS": ["car:12", "pedestrian:12"],
            "LIMIT_WHOLE_SCENE": True,
        }
    )
    sampler = DataBaseSampler(None, sampler_cfg, CLASS_NAMES)
    points, gt_boxes, gt_names = ds.get_raw_scene(0)
    n_before = len(gt_boxes)
    out = sampler({"points": points, "gt_boxes": gt_boxes, "gt_names": gt_names})
    assert len(out["gt_boxes"]) > n_before
    assert len(out["gt_names"]) == len(out["gt_boxes"])
    # no pair of boxes collides
    from toda_tpu.utils import box_utils

    iou = box_utils.boxes3d_nearest_bev_iou(out["gt_boxes"][:, :7], out["gt_boxes"][:, :7])
    np.fill_diagonal(iou, 0)
    assert iou.max() < 0.05


def test_dataloader_prefetch_matches_serial():
    """Background-prefetch loader yields identical batches to the serial path
    (deterministic dummy dataset; the synthetic fixture is stochastic per
    __getitem__, which would confound the comparison)."""
    import numpy as np

    from toda_tpu.datasets import DataLoader

    class Dummy:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return {"points": np.full((4, 3), float(i), np.float32)}

        @staticmethod
        def collate_batch(samples):
            return {"points": np.stack([s["points"] for s in samples])}

    serial = [
        b["points"].copy()
        for b in DataLoader(Dummy(), batch_size=2, drop_last=False, prefetch=0)
    ]
    threaded = [
        b["points"].copy()
        for b in DataLoader(Dummy(), batch_size=2, drop_last=False, prefetch=2)
    ]
    assert len(serial) == len(threaded) == 4
    for a, b in zip(serial, threaded):
        assert np.allclose(a, b)


def test_shared_memory_db_mmap(tmp_path):
    """USE_SHARED_MEMORY path: GT object points served from a consolidated
    mmap-backed .npy (the /dev/shm SharedArray analog)."""
    import numpy as np

    from toda_tpu.config import EDict
    from toda_tpu.datasets.augmentor.database_sampler import DataBaseSampler

    rng = np.random.RandomState(0)
    all_pts = rng.randn(100, 4).astype(np.float32)
    np.save(tmp_path / "gt_db.npy", all_pts)
    infos = {
        "car": [
            {"name": "car", "box3d_lidar": np.asarray([0, 0, 0, 4, 2, 1.6, 0.0]),
             "db_offset": 10, "num_points_in_gt": 20, "difficulty": 0},
        ]
    }
    import pickle

    with open(tmp_path / "dbinfos.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = EDict({
        "DB_INFO_PATH": ["dbinfos.pkl"],
        "DB_DATA_PATH": ["gt_db.npy"],
        "USE_SHARED_MEMORY": True,
        "SAMPLE_GROUPS": ["car:1"],
        "NUM_POINT_FEATURES": 4,
    })
    sampler = DataBaseSampler(tmp_path, cfg, ["car"])
    pts = sampler._load_points(infos["car"][0])
    assert np.allclose(pts, all_pts[10:30])


def test_consolidate_gt_database_and_shm_cache(tmp_path):
    """consolidate_gt_database packs per-object .bin files into one npy +
    offset infos; shm_cache_file stages it once per host (leader-elected)."""
    import pickle

    import numpy as np

    from toda_tpu.config import EDict
    from toda_tpu.datasets.augmentor.database_sampler import (
        DataBaseSampler,
        consolidate_gt_database,
    )
    from toda_tpu.utils.common_utils import shm_cache_clear, shm_cache_file

    rng = np.random.RandomState(1)
    objdir = tmp_path / "gt_database"
    objdir.mkdir()
    infos = {"car": []}
    for i in range(3):
        pts = rng.randn(5 + i, 4).astype(np.float32)
        pts.tofile(objdir / f"obj{i}.bin")
        infos["car"].append({
            "name": "car", "path": f"gt_database/obj{i}.bin",
            "box3d_lidar": np.asarray([i * 10.0, 0, 0, 4, 2, 1.6, 0.0]),
            "num_points_in_gt": 5 + i, "difficulty": 0,
        })
    with open(tmp_path / "dbinfos.pkl", "wb") as f:
        pickle.dump(infos, f)

    npy_path, pkl_path = consolidate_gt_database(tmp_path / "dbinfos.pkl", tmp_path)
    packed = np.load(npy_path)
    assert packed.shape == (5 + 6 + 7, 4)

    # the sampler reads identical points through the mmap path
    cfg = EDict({
        "DB_INFO_PATH": [pkl_path.name],
        "DB_DATA_PATH": [npy_path.name],
        "USE_SHARED_MEMORY": True,
        "SAMPLE_GROUPS": ["car:1"],
        "NUM_POINT_FEATURES": 4,
    })
    sampler = DataBaseSampler(tmp_path, cfg, ["car"])
    with open(pkl_path, "rb") as f:
        shared_infos = pickle.load(f)
    for i, info in enumerate(shared_infos["car"]):
        expect = np.fromfile(objdir / f"obj{i}.bin", np.float32).reshape(-1, 4)
        np.testing.assert_allclose(sampler._load_points(info), expect)

    # shm staging: first call copies, second call reuses the staged file
    shm_dir = tmp_path / "fake_shm"
    staged = shm_cache_file(npy_path, shm_dir=shm_dir)
    assert staged.parent == shm_dir and staged.exists()
    again = shm_cache_file(npy_path, shm_dir=shm_dir)
    assert again == staged
    np.testing.assert_allclose(np.load(staged), packed)
    shm_cache_clear(shm_dir)
    assert not shm_dir.exists()


def test_random_local_frustum_dropout():
    """Per-box slab dropout: top-direction slab removes exactly the in-box
    points above the per-box threshold (reference local_frustum_dropout_top)."""
    from toda_tpu.datasets.augmentor import augmentor_utils as au

    boxes = np.array([[0, 0, 0, 4.0, 2.0, 2.0, 0.0]], np.float32)
    # 3 in-box points at z = -0.8, 0.0, +0.8; one far point
    pts = np.array([
        [0, 0, -0.8, 1.0],
        [0, 0, 0.0, 1.0],
        [0, 0, 0.8, 1.0],
        [50, 50, 0.8, 1.0],
    ], np.float32)
    # replay intensity 0.5 -> threshold z >= (1 - 0.5*2) = 0.0 dropped
    _, out, used, keep = au.random_local_frustum_dropout(
        boxes, pts, directions=("top",), params=[[0.5]]
    )
    assert used == [[0.5]]
    np.testing.assert_array_equal(keep, [True, False, False, True])
    assert len(out) == 2

    # random draw stays within the configured intensity range and replays
    gt, out2, used2, _ = au.random_local_frustum_dropout(
        boxes, pts, intensity_range=(0.1, 0.3), directions=("bottom",)
    )
    assert 0.1 <= used2[0][0] <= 0.3
    _, out3, _, _ = au.random_local_frustum_dropout(
        boxes, pts, directions=("bottom",), params=used2
    )
    np.testing.assert_allclose(out2, out3)


def test_pyramid_helpers_and_augs():
    from toda_tpu.datasets.augmentor import augmentor_utils as au

    rng = np.random.RandomState(3)
    boxes = np.array([
        [0, 0, 0, 4.0, 2.0, 2.0, 0.3],
        [10, 5, 0, 3.0, 1.6, 1.5, -0.5],
    ], np.float32)
    pyr = au.get_pyramids(boxes)
    assert pyr.shape == (2, 6, 15)
    # apex is the box center
    np.testing.assert_allclose(pyr[:, :, :3], np.broadcast_to(boxes[:, None, :3], (2, 6, 3)))

    # a point at the box center belongs to... no pyramid strictly (it's the
    # shared apex); points near a face center belong to exactly one pyramid
    probe = np.array([[1.7, 0.0, 0.0, 0.5]], np.float32)  # near +x face of box 0
    m = au.points_in_pyramids_mask(probe, pyr[0])
    assert m.sum() == 1

    # in-box points union over the 6 pyramids == points strictly in the box
    # (get_points_in_box now carries the reference's 0.1 m x/y margin, so
    # compare against the unmargined membership)
    from toda_tpu.utils import box_utils as bu
    pts = rng.uniform(-3, 3, size=(500, 4)).astype(np.float32)
    mask = bu.points_in_boxes_numpy(pts, boxes[:1, :7])[0]
    m_all = au.points_in_pyramids_mask(pts, pyr[0])
    np.testing.assert_array_equal(m_all.any(-1), mask)

    # dropout removes exactly the points of the dropped pyramids
    np.random.seed(0)
    dense = np.concatenate(
        [rng.uniform(-1.9, 1.9, size=(400, 1)) * np.array([[1.0]]),
         rng.uniform(-0.9, 0.9, size=(400, 1)),
         rng.uniform(-0.9, 0.9, size=(400, 1)),
         rng.uniform(0, 1, size=(400, 1))], axis=1
    ).astype(np.float32)
    gb, pts2, rem = au.local_pyramid_dropout(boxes.copy(), dense.copy(), 1.0)
    assert pts2.shape[0] < dense.shape[0]

    # sparsify caps the points of selected pyramids
    np.random.seed(1)
    gb, pts3, rem = au.local_pyramid_sparsify(boxes.copy(), dense.copy(), 1.0, 10)
    assert pts3.shape[0] <= dense.shape[0]

    # swap keeps total point count and stays finite
    np.random.seed(2)
    two_box_pts = np.concatenate([
        dense, dense + np.array([[10, 5, 0, 0]], np.float32)
    ], axis=0)
    gb, pts4 = au.local_pyramid_swap(boxes.copy(), two_box_pts.copy(), 1.0, 5)
    assert np.isfinite(pts4).all()
    assert pts4.shape[0] == two_box_pts.shape[0]


def test_local_translation_replay():
    from toda_tpu.datasets.augmentor import augmentor_utils as au

    rng = np.random.RandomState(4)
    boxes = np.array([[0, 0, 0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    pts = rng.uniform(-0.9, 0.9, size=(50, 4)).astype(np.float32)
    np.random.seed(7)
    b1, p1, offs = au.random_local_translation_along_x(
        boxes.copy(), pts.copy(), [0.5, 1.0]
    )
    b2, p2, _ = au.random_local_translation_along_x(
        boxes.copy(), pts.copy(), [0.5, 1.0], params=offs
    )
    np.testing.assert_allclose(p1, p2)
    np.testing.assert_allclose(b1, b2)
    assert b1[0, 0] >= 0.5

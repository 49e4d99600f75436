"""Integration: the full TODA loop — stage-1 mix training, pseudo-label
generation with gradient perturbation, stage-2 MixUp + consistency training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from toda_tpu.config import EDict
from toda_tpu.datasets import build_dataloader, build_dataset, build_mixup_dataloader
from toda_tpu.datasets.dataset_cl import CLPairDataset
from toda_tpu.datasets import DataLoader
from toda_tpu.models import build_network
from toda_tpu.runtime.pseudo_label import generate_pseudo_labels
from toda_tpu.runtime.train_cl import make_train_step_cl, select_cl_arrays
from toda_tpu.runtime.train_utils import (
    create_train_state,
    make_train_step,
    select_batch_arrays,
)

BASE_DATASET_YAML = "tools/cfgs/dataset_configs/synthetic_dataset.yaml"


def tiny_dataset_cfg(seed=0):
    with open(BASE_DATASET_YAML) as f:
        cfg = EDict(yaml.safe_load(f))
    cfg.POINT_CLOUD_RANGE = [-20.0, -20.0, -3.0, 20.0, 20.0, 1.0]
    cfg.DATA_PROCESSOR[2].NUM_POINTS = {"train": 2048, "test": 2048}
    cfg.DATA_PROCESSOR[3].VOXEL_SIZE = [0.625, 0.625, 4.0]
    cfg.DATA_PROCESSOR[3].MAX_NUMBER_OF_VOXELS = {"train": 1024, "test": 1024}
    cfg.NUM_SCENES = 4
    cfg.NUM_OBJECTS = [2, 4]
    cfg.SEED = seed
    return cfg


def tiny_model_cfg():
    from toda_tpu.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("tools/cfgs/synthetic_models/pointpillar_synthetic.yaml", EDict())
    m = cfg.MODEL
    m.BACKBONE_2D.LAYER_NUMS = [1, 1]
    m.BACKBONE_2D.LAYER_STRIDES = [2, 2]
    m.BACKBONE_2D.NUM_FILTERS = [32, 64]
    m.BACKBONE_2D.UPSAMPLE_STRIDES = [1, 2]
    m.BACKBONE_2D.NUM_UPSAMPLE_FILTERS = [32, 32]
    m.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 256
    m.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 32
    return cfg


CLASS_NAMES = ["car", "pedestrian"]


def test_stage1_cutmix_training():
    np.random.seed(0)
    mix_cfg = tiny_dataset_cfg(seed=0)
    mix_cfg.DATASET = "CutMixDataset"
    mix_cfg.MIX_TYPE = "cutmix"
    mix_cfg.CUTMIX_PROB = 1.0
    mix_cfg.SOURCE_CFG = tiny_dataset_cfg(seed=0)
    mix_cfg.TARGET_CFG = tiny_dataset_cfg(seed=100)
    cfg = tiny_model_cfg()

    dataset, loader, _ = build_dataloader(mix_cfg, CLASS_NAMES, batch_size=2, training=True)
    assert len(dataset) == 8  # len(src) + len(tgt)
    bundle = build_network(cfg.MODEL, num_class=len(CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    state, _ = create_train_state(bundle, cfg.OPTIMIZATION, total_steps=8, example_batch=batch)
    step = make_train_step(bundle)
    # curriculum knob plumbed every iteration (reference train_utils.py:47-48)
    dataset.train_percent = 0.5
    for b in loader:
        arrays = {k: jnp.asarray(v) for k, v in select_batch_arrays(b).items()}
        state, tb = step(state, arrays)
        assert np.isfinite(float(tb["loss"]))


@pytest.fixture(scope="module")
def base_setup():
    np.random.seed(0)
    cfg = tiny_model_cfg()
    ds_cfg = tiny_dataset_cfg(seed=0)
    dataset, loader, _ = build_dataloader(ds_cfg, CLASS_NAMES, batch_size=2, training=True)
    bundle = build_network(cfg.MODEL, num_class=len(CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    state, _ = create_train_state(bundle, cfg.OPTIMIZATION, total_steps=8, example_batch=batch)
    return cfg, ds_cfg, dataset, bundle, state


def test_pseudo_label_generation(base_setup):
    cfg, ds_cfg, dataset, bundle, state = base_setup
    eval_ds, eval_loader, _ = build_dataloader(ds_cfg, CLASS_NAMES, batch_size=2, training=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    infos = generate_pseudo_labels(
        bundle, variables, eval_loader, eval_ds, CLASS_NAMES,
        score_thresh=0.0, with_perturb=True, eps=1.0,
    )
    assert len(infos) == len(eval_ds)
    for info in infos:
        assert info["gt_boxes"].shape[1] == 7
        assert "point_perturb" in info
        assert set(np.unique(info["point_perturb"])) <= {-1.0, 0.0, 1.0}  # sign(grad)


def test_stage2_mixup_cl_training(base_setup):
    cfg, ds_cfg, dataset, bundle, state = base_setup
    # fabricate pseudo infos referencing base frames
    pseudo = [
        {"index": i, "gt_boxes": np.zeros((1, 7), np.float32) + [1, 1, 0, 4, 2, 1.6, 0],
         "gt_names": np.asarray(["car"]), "score": np.asarray([0.9]),
         "point_perturb": np.asarray([0.1, 0.1, 0.0], np.float32)}
        for i in range(2)
    ]
    mixup_cfg = tiny_dataset_cfg(seed=0)
    mixup_cfg.DATASET = "MixUpDataset"
    mixup_cfg.BASE_CFG = tiny_dataset_cfg(seed=0)
    mixup_cfg.MIXUP_PROB = 1.0
    mixup_cfg.GT_PROB = 0.5
    mixup_cfg.MIXUP_TYPE = "gt+ps_gt+ps"
    mixup_cfg.ADV_ALPHA = 0.5
    mixup_cfg.LABELED_INDICES = [0, 1]

    mix_ds, _, _ = build_mixup_dataloader(
        mixup_cfg, CLASS_NAMES, batch_size=2, pseudo_infos=pseudo, training=True
    )
    cl_ds = CLPairDataset(mix_ds)
    loader = DataLoader(cl_ds, batch_size=2, shuffle=True, drop_last=True)
    batch = next(iter(loader))
    assert "adv" in batch and "org" in batch
    assert batch["adv"]["points"].shape == batch["org"]["points"].shape
    assert "aug_vector" in batch["adv"]

    step = make_train_step_cl(bundle, consistency_weight=0.1, score_thresh=0.0)
    arrays = select_cl_arrays(batch)
    new_state, tb = step(state, arrays)
    for k in ("loss", "loss_adv", "loss_org", "consistency_center", "consistency_size"):
        assert np.isfinite(float(tb[k])), k


def test_reverse_boxes_jnp_roundtrip(rng):
    from toda_tpu.models.consistency import reverse_boxes_jnp
    from toda_tpu.datasets.augmentor import augmentor_utils

    boxes = np.zeros((6, 7), np.float32)
    boxes[:, :3] = rng.uniform(-10, 10, (6, 3))
    boxes[:, 3:6] = rng.uniform(1, 4, (6, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 6)
    pts = rng.uniform(-10, 10, (10, 4)).astype(np.float32)

    b, p, f = augmentor_utils.random_flip_along_x(boxes, pts, params=True)
    b, p, r = augmentor_utils.global_rotation(b, p, [-0.5, 0.5])
    b, p, s = augmentor_utils.global_scaling(b, p, [0.9, 1.1])
    aug_vec = np.asarray([[1.0, 0.0, r, s, 0, 0, 0]], np.float32)

    restored = np.asarray(reverse_boxes_jnp(jnp.asarray(b[None]), jnp.asarray(aug_vec)))[0]
    np.testing.assert_allclose(restored[:, :6], boxes[:, :6], atol=1e-3)
    dh = (restored[:, 6] - boxes[:, 6] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dh, 0, atol=1e-3)


def test_voxel_perturb_roundtrip_survives_resampling():
    """`_k` storage: generate -> store by voxel coords -> apply on a RESAMPLED
    frame; deltas are nonzero inside pseudo boxes and zero outside
    (VERDICT r1 item 8; reference generate_pseudo_labels_perturb_k)."""
    import numpy as np
    from toda_tpu.runtime.pseudo_label import lookup_voxel_perturb, voxelize_perturb

    rng = np.random.RandomState(0)
    pts = rng.uniform(-10, 10, (500, 4)).astype(np.float32)
    boxes = np.asarray([[0.0, 0.0, 0.0, 6.0, 6.0, 20.0, 0.0]], np.float32)
    perturb = np.sign(rng.randn(500, 3)).astype(np.float32)
    vc, vp = voxelize_perturb(
        pts, perturb, boxes, voxel_size=(0.5, 0.5, 0.5), pc_range=(-12, -12, -12)
    )
    assert len(vc) > 0
    info = {
        "p_voxel_coords": vc, "p_voxel_perturb": vp,
        "p_voxel_size": np.asarray([0.5, 0.5, 0.5], np.float32),
        "p_pc_range": np.asarray([-12, -12, -12], np.float32),
    }
    # exact resample (drop half the points): every survivor inside the box
    # still finds its voxel's perturbation
    resampled = pts[::2].copy()
    delta = lookup_voxel_perturb(resampled, info)
    inside = np.abs(resampled[:, :2]).max(axis=1) < 2.9
    outside = np.abs(resampled[:, :2]).max(axis=1) > 4.0
    assert (np.abs(delta[inside]).sum(axis=1) > 0).all()
    assert np.abs(delta[outside]).sum() == 0.0

    # jittered resample: most points still land in a covered voxel
    jittered = resampled.copy()
    jittered[:, :3] += rng.uniform(-0.1, 0.1, (len(jittered), 3)).astype(np.float32)
    dj = lookup_voxel_perturb(jittered, info)
    inside_j = np.abs(jittered[:, :2]).max(axis=1) < 2.5
    assert (np.abs(dj[inside_j]).sum(axis=1) > 0).mean() > 0.3


def test_test_seed_offset_presents_train_scenes():
    """TEST_SEED_OFFSET: 0 makes a test-mode SyntheticDataset present the
    TRAIN scenes — needed so pseudo labels generated by the (test-mode)
    generator loader reference the same frames stage 2 reads back (the
    synthetic analog of the reference pseudo_labels/*.yaml pointing
    DATA_SPLIT.test at the train infos). Default offset keeps val disjoint."""
    ds_cfg = tiny_dataset_cfg(seed=777)
    train_ds = build_dataset(ds_cfg, CLASS_NAMES, training=True)
    val_ds = build_dataset(ds_cfg, CLASS_NAMES, training=False)
    pts_train, boxes_train, _ = train_ds.get_raw_scene(0)
    pts_val, _, _ = val_ds.get_raw_scene(0)
    assert pts_train.shape != pts_val.shape or not np.allclose(pts_train, pts_val)

    ds_cfg2 = tiny_dataset_cfg(seed=777)
    ds_cfg2.TEST_SEED_OFFSET = 0
    pseudo_ds = build_dataset(ds_cfg2, CLASS_NAMES, training=False)
    pts_ps, boxes_ps, _ = pseudo_ds.get_raw_scene(0)
    np.testing.assert_allclose(pts_ps, pts_train)
    np.testing.assert_allclose(boxes_ps, boxes_train)


def test_filter_min_points_boxes():
    """Pseudo boxes with too few interior points are dropped (reconstructed
    reference filtering_min_points_box, generate_pseudo_labels_perturb.py:149)."""
    from toda_tpu.runtime.pseudo_label import filter_min_points_boxes

    rng = np.random.RandomState(0)
    # box A: 20 points inside; box B: 2 points inside; box C: empty
    boxes = np.asarray([
        [0, 0, 0, 2, 2, 2, 0.0],
        [10, 10, 0, 2, 2, 2, 0.0],
        [-10, -10, 0, 2, 2, 2, 0.0],
    ], np.float32)
    pts_a = rng.uniform(-0.8, 0.8, (20, 3)).astype(np.float32)
    pts_b = rng.uniform(9.2, 10.8, (2, 3)).astype(np.float32)
    pts_b[:, 2] -= 10.0
    points = np.concatenate([pts_a, pts_b]).astype(np.float32)
    keep = filter_min_points_boxes(boxes, points, min_points=5)
    assert keep.tolist() == [True, False, False]
    keep1 = filter_min_points_boxes(boxes, points, min_points=1)
    assert keep1.tolist() == [True, True, False]
    # disabled filter keeps everything; empty points drops everything
    assert filter_min_points_boxes(boxes, points, 0).all()
    assert not filter_min_points_boxes(boxes, np.zeros((0, 3), np.float32), 5).any()


def test_mixup_dataset_repeat_multiplies_epoch_length():
    """cfg REPEAT (stage2 CLI --repeat) lengthens the pass over the GT∪pseudo
    pool (reference nuscenes_mixup_adv_dataset.py:280-281)."""
    pseudo = [
        {"index": 0, "gt_boxes": np.zeros((1, 7), np.float32) + [1, 1, 0, 4, 2, 1.6, 0],
         "gt_names": np.asarray(["car"]), "score": np.asarray([0.9])}
    ]
    mixup_cfg = tiny_dataset_cfg(seed=0)
    mixup_cfg.DATASET = "MixUpDataset"
    mixup_cfg.BASE_CFG = tiny_dataset_cfg(seed=0)
    mixup_cfg.LABELED_INDICES = [0, 1]

    plain, _, _ = build_mixup_dataloader(
        mixup_cfg, CLASS_NAMES, batch_size=1, pseudo_infos=pseudo, training=True
    )
    assert len(plain) == 3  # 2 labeled + 1 pseudo

    mixup_cfg.REPEAT = 5
    repeated, _, _ = build_mixup_dataloader(
        mixup_cfg, CLASS_NAMES, batch_size=1, pseudo_infos=pseudo, training=True
    )
    # reference: len(gt_infos) * repeat — only the labeled pool is multiplied
    # (nuscenes_mixup_adv_dataset.py:280-281)
    assert len(repeated) == 10
    _ = repeated[9]  # tail indices are valid samples

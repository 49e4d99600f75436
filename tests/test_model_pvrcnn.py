"""PV-RCNN: VSA keypoints + point head + RoI grid pooling head, plus the shared
RoI machinery (NMS proposal layer, target sampling, canonical transform, decode).
"""

import numpy as np
import jax
import jax.numpy as jnp

from toda_tpu.config import EDict, cfg_from_yaml_file
from toda_tpu.datasets import build_dataloader
from toda_tpu.models import build_network
from toda_tpu.models.roi_heads.roi_utils import (
    assign_targets,
    canonical_gt_of_rois,
    generate_predicted_boxes_roi,
    proposal_layer,
    sample_rois_for_rcnn,
)
from toda_tpu.runtime.train_utils import (
    create_train_state,
    make_train_step,
    select_batch_arrays,
)
from toda_tpu.utils.box_coder_utils import ResidualCoder

CFG = "tools/cfgs/synthetic_models/pvrcnn_synthetic.yaml"


def test_pvrcnn_trains_and_predicts():
    np.random.seed(0)
    cfg = cfg_from_yaml_file(CFG, EDict())
    cfg.DATA_CONFIG.NUM_SCENES = 4
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    state, _ = create_train_state(bundle, cfg.OPTIMIZATION, total_steps=10,
                                  example_batch=batch)
    step = make_train_step(bundle)
    losses = []
    for b in loader:
        arrays = {k: jnp.asarray(v) for k, v in select_batch_arrays(b).items()}
        state, tb = step(state, arrays)
        losses.append(float(tb["loss"]))
    assert np.isfinite(losses).all()
    # the rcnn losses are actually present
    assert "rcnn_loss_cls" in tb and "rcnn_loss_reg" in tb and "point_loss_cls" in tb

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dets = bundle.predict(variables, {
        "points": jnp.asarray(batch["points"]),
        "points_mask": jnp.asarray(batch["points_mask"]),
    })
    assert dets["pred_boxes"].shape[-1] == 7
    assert np.isfinite(np.asarray(dets["pred_boxes"])).all()
    assert np.isfinite(np.asarray(dets["pred_scores"])).all()


def test_rcnn_loss_does_not_backprop_into_rpn():
    """The reference proposal layer runs under @torch.no_grad()
    (roi_head_template.py:46): second-stage (rcnn) losses must have ZERO
    gradient w.r.t. the dense-head parameters — their only path there is
    through the proposal boxes / gt_of_rois target encoding, which must be
    stop-gradded. A leak lets the optimizer satisfy the rcnn reg loss by
    moving the proposals, corrupting the RPN (observed: loss spikes + dead
    proposal recall on the 120-epoch pvrcnn_synthetic_big run)."""
    np.random.seed(0)
    cfg = cfg_from_yaml_file(CFG, EDict())
    cfg.DATA_CONFIG.NUM_SCENES = 2
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in select_batch_arrays(batch).items()}
    arrays["batch_size"] = arrays["points"].shape[0]
    variables = bundle.init(jax.random.PRNGKey(0), arrays)

    from toda_tpu.models.roi_heads.roi_utils import roi_losses

    def rcnn_only(params):
        out, _ = bundle.module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            arrays, training=True, mutable=["batch_stats"],
            rngs={"sampling": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)},
        )
        out = dict(out)
        out["batch_size"] = arrays["batch_size"]
        loss, _ = roi_losses(out, cfg.MODEL.ROI_HEAD.LOSS_CONFIG, bundle.roi_box_coder)
        return loss

    grads = jax.jit(jax.grad(rcnn_only))(variables["params"])
    dh_leaves = jax.tree_util.tree_leaves(grads["dense_head"])
    assert dh_leaves, "dense_head params missing from grad tree"
    leak = max(float(jnp.abs(g).max()) for g in dh_leaves)
    assert leak == 0.0, f"rcnn loss leaks gradient into the RPN (max |g| = {leak})"


def _toy_preds():
    """Two true objects + near-duplicate peaks around the first one."""
    base = np.array(
        [
            [0.0, 0.0, 0.0, 4.0, 2.0, 1.6, 0.0],
            [0.1, 0.05, 0.0, 4.0, 2.0, 1.6, 0.02],   # duplicate of 0
            [-0.1, 0.0, 0.0, 4.1, 2.0, 1.6, -0.02],  # duplicate of 0
            [10.0, 10.0, 0.0, 4.0, 2.0, 1.6, 0.5],   # second object
            [20.0, -5.0, 0.0, 4.0, 2.0, 1.6, 1.0],   # background box
        ],
        dtype=np.float32,
    )
    scores = np.array([0.95, 0.9, 0.85, 0.6, 0.2], dtype=np.float32)
    logits = np.log(scores / (1 - scores))[:, None]
    return jnp.asarray(base[None]), jnp.asarray(logits[None])


def test_proposal_layer_nms_suppresses_duplicates():
    boxes, logits = _toy_preds()
    nms_cfg = {"NMS_PRE_MAXSIZE": 8, "NMS_POST_MAXSIZE": 4, "NMS_THRESH": 0.5}
    rois, scores, labels, mask = proposal_layer(boxes, logits, nms_cfg)
    kept = np.asarray(rois[0])[np.asarray(mask[0])]
    # duplicates of the first object suppressed -> 3 survivors
    assert int(np.asarray(mask[0]).sum()) == 3
    assert np.allclose(kept[0, :2], [0.0, 0.0], atol=1e-4)
    assert np.allclose(kept[1, :2], [10.0, 10.0], atol=1e-4)

    # NMS proposals cover MORE gt at equal budget than static top-K:
    # with budget 2, top-K picks two duplicates of object 0 and misses object 1
    top2 = np.asarray(boxes[0, :2])
    assert np.allclose(top2[1, :2], [0.1, 0.05], atol=1e-4)  # duplicate
    nms2 = kept[:2]
    assert np.allclose(nms2[1, :2], [10.0, 10.0], atol=1e-4)  # second object


def test_sample_rois_quota_and_labels():
    rng = jax.random.PRNGKey(0)
    n = 32
    gt = np.zeros((3, 8), np.float32)
    gt[0] = [0, 0, 0, 4, 2, 1.6, 0, 1]
    gt[1] = [10, 10, 0, 4, 2, 1.6, 0, 1]
    rois = np.zeros((n, 7), np.float32)
    rois[:, 3:6] = [4, 2, 1.6]
    rois[:16, :3] = [0, 0, 0]          # perfect fg on gt0
    rois[16:24, :3] = [0.8, 0.8, 0.0]   # hard bg-ish (partial overlap)
    rois[24:, :3] = [30, 30, 0]         # easy bg
    cfg = {
        "ROI_PER_IMAGE": 16, "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
        "CLS_SCORE_TYPE": "roi_iou", "CLS_FG_THRESH": 0.75, "CLS_BG_THRESH": 0.25,
        "CLS_BG_THRESH_LO": 0.1, "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
    }
    out = sample_rois_for_rcnn(
        rng, jnp.asarray(rois), jnp.ones(n), jnp.ones(n, jnp.int32),
        jnp.ones(n, bool), jnp.asarray(gt), cfg,
    )
    ious = np.asarray(out["gt_iou_of_rois"])
    assert out["rois"].shape == (16, 7)
    # fg quota: 8 slots with iou ~1 (the perfect rois)
    assert (ious[:8] > 0.9).all()
    # reg mask matches iou > REG_FG_THRESH
    assert (np.asarray(out["reg_valid_mask"])[:8] == 1).all()
    # soft iou labels in [0, 1]
    cls = np.asarray(out["rcnn_cls_labels"])
    assert (cls >= 0).all() and (cls <= 1).all()
    assert (cls[:8] > 0.9).all()


def test_canonical_transform_and_decode_roundtrip():
    rng = np.random.RandomState(1)
    b, r = 2, 8
    rois = np.zeros((b, r, 7), np.float32)
    rois[..., :3] = rng.randn(b, r, 3) * 5
    rois[..., 3:6] = 2 + rng.rand(b, r, 3)
    rois[..., 6] = rng.uniform(-np.pi, np.pi, (b, r))
    gt = np.array(rois, copy=True)
    gt[..., :3] += rng.randn(b, r, 3) * 0.3
    gt[..., 3:6] *= 1 + rng.randn(b, r, 3) * 0.05
    gt[..., 6] += rng.randn(b, r) * 0.2

    gt_ct = canonical_gt_of_rois(jnp.asarray(rois), jnp.asarray(gt))
    h = np.asarray(gt_ct[..., 6])
    assert (h >= -np.pi / 2 - 1e-4).all() and (h <= np.pi / 2 + 1e-4).all()

    # perfect-regression round trip: encode the canonical gt, decode, compare
    coder = ResidualCoder(code_size=7)
    rois_anchor = jnp.asarray(rois).at[..., 0:3].set(0.0).at[..., 6].set(0.0)
    reg = coder.encode(gt_ct, rois_anchor)
    _, boxes = generate_predicted_boxes_roi(
        jnp.asarray(rois), jnp.zeros((b, r, 1)), reg, coder
    )
    boxes = np.asarray(boxes)
    assert np.allclose(boxes[..., :6], gt[..., :6], atol=1e-3)
    # heading equal modulo pi (canonical transform folds opposite headings)
    dh = (boxes[..., 6] - gt[..., 6] + np.pi / 2) % np.pi - np.pi / 2
    assert np.abs(dh).max() < 1e-3


def test_assign_targets_batched():
    rng = jax.random.PRNGKey(3)
    b, n, m = 2, 16, 4
    rs = np.random.RandomState(0)
    batch = {
        "rois": jnp.asarray(rs.rand(b, n, 7).astype(np.float32) * 3 + 1),
        "roi_scores": jnp.asarray(rs.rand(b, n).astype(np.float32)),
        "roi_labels": jnp.ones((b, n), jnp.int32),
        "roi_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(
            np.concatenate([rs.rand(b, m, 7).astype(np.float32) * 3 + 1,
                            np.ones((b, m, 1), np.float32)], axis=-1)
        ),
    }
    cfg = {
        "ROI_PER_IMAGE": 8, "FG_RATIO": 0.5, "CLS_SCORE_TYPE": "roi_iou",
        "CLS_FG_THRESH": 0.75, "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
        "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
    }
    t = assign_targets(rng, batch, cfg)
    assert t["rois"].shape == (b, 8, 7)
    assert t["gt_of_rois"].shape == (b, 8, 7)
    assert np.isfinite(np.asarray(t["gt_of_rois"])).all()


def test_pvrcnn_plusplus_trains_and_predicts():
    """PV-RCNN++: SPC keypoint sampling + VectorPool aggregation."""
    np.random.seed(0)
    cfg = cfg_from_yaml_file(
        "tools/cfgs/synthetic_models/pvrcnn_plusplus_synthetic.yaml", EDict()
    )
    cfg.DATA_CONFIG.NUM_SCENES = 2
    cfg.MODEL.PFE.NUM_KEYPOINTS = 128
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    state, _ = create_train_state(bundle, cfg.OPTIMIZATION, total_steps=4,
                                  example_batch=batch)
    step = make_train_step(bundle)
    arrays = {k: jnp.asarray(v) for k, v in
              __import__("toda_tpu.runtime.train_utils", fromlist=["select_batch_arrays"]
                         ).select_batch_arrays(batch).items()}
    state, tb = step(state, arrays)
    assert np.isfinite(float(tb["loss"]))
    assert "rcnn_loss_cls" in tb and "point_loss_cls" in tb

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dets = bundle.predict(variables, {
        "points": jnp.asarray(batch["points"]),
        "points_mask": jnp.asarray(batch["points_mask"]),
    })
    assert np.isfinite(np.asarray(dets["pred_boxes"])).all()

"""Pseudo-label generation, plain and adversarially-perturbed.

Reference: tools/eval_utils/generate_pseudo_labels.py:12-146 (inference sweep ->
per-class score thresholds -> rewrite unlabeled infos with pseudo gt) and
generate_pseudo_labels_perturb.py:100-288 (input-gradient extraction with a
BN-freeze hack). In JAX the gradient w.r.t. the raw point cloud is one
``jax.grad`` with ``training=False`` — no BatchNorm surgery: the perturbation is
FGSM-style eps * sign(d loss / d points) evaluated with the pseudo boxes as
targets (the missing upstream ``perturb_utils.get_perturb`` semantics,
reconstructed from call sites per SURVEY.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .eval_utils import make_predict_step


def make_perturb_step(bundle):
    """Returns jit fn (variables, batch_with_gt) -> (P, 3) sign-of-gradient."""

    def perturb(variables, batch):
        def loss_fn(points):
            b = dict(batch)
            b["points"] = points
            b["batch_size"] = points.shape[0]
            total, _ = bundle.loss(variables, b, training=False, mutable=())
            return total

        g = jax.grad(loss_fn)(batch["points"])
        return jnp.sign(g[..., :3])

    return jax.jit(perturb)


def filter_min_points_boxes(boxes, points, min_points):
    """Keep mask for pseudo boxes containing >= min_points points — the
    reconstructed `filtering_min_points_box` semantics (missing upstream
    perturb_utils; call site generate_pseudo_labels_perturb.py:149 drops
    low-support pseudo boxes before storing perturbations)."""
    from ..utils import box_utils

    if min_points <= 0 or len(boxes) == 0:
        return np.ones(len(boxes), bool)
    if len(points) == 0:
        return np.zeros(len(boxes), bool)
    member = box_utils.points_in_boxes_numpy(points, boxes[:, :7])  # (B, P)
    return member.sum(axis=1) >= min_points


def generate_pseudo_labels(
    bundle,
    variables,
    loader,
    dataset,
    class_names,
    score_thresh=0.2,
    with_perturb=False,
    eps=1.0,
    min_points=0,
    logger=None,
):
    """Sweep the unlabeled split; returns pseudo info list compatible with
    MixUpDataset.pseudo_infos.

    score_thresh: float or {class_name: float} (reference uses 0.2 at 1-10%
    labels, 0.3 at 20% — docs/RUN_MODEL.md:22-24).
    min_points: drop pseudo boxes with fewer interior points (reference
    filtering_min_points_box, generate_pseudo_labels_perturb.py:149).
    """
    predict_step = make_predict_step(bundle)
    perturb_step = make_perturb_step(bundle) if with_perturb else None
    if not isinstance(score_thresh, dict):
        score_thresh = {c: float(score_thresh) for c in class_names}
    thresh_arr = np.asarray([score_thresh[c] for c in class_names], dtype=np.float32)

    pseudo_infos = []
    for batch in loader:
        arrays = {
            "points": jnp.asarray(batch["points"]),
            "points_mask": jnp.asarray(batch["points_mask"]),
        }
        dets = predict_step(variables, arrays)
        dets = {k: np.asarray(v) for k, v in dets.items()}
        b = dets["pred_boxes"].shape[0]

        perturb = None
        if with_perturb:
            # gradient w.r.t. points with the *pseudo* boxes as training targets
            gt_like = np.zeros_like(np.asarray(batch["gt_boxes"]))
            for i in range(b):
                m = dets["pred_mask"][i].astype(bool)
                k = min(m.sum(), gt_like.shape[1])
                sel = np.where(m)[0][:k]
                gt_like[i, :k, :7] = dets["pred_boxes"][i, sel, :7]
                gt_like[i, :k, -1] = dets["pred_labels"][i, sel]  # class is LAST column
            perturb = np.asarray(
                perturb_step(variables, {**arrays, "gt_boxes": jnp.asarray(gt_like)})
            ) * eps

        for i in range(b):
            m = dets["pred_mask"][i].astype(bool)
            boxes = dets["pred_boxes"][i][m]
            scores = dets["pred_scores"][i][m]
            labels = dets["pred_labels"][i][m].astype(int)
            keep = scores >= thresh_arr[np.clip(labels - 1, 0, len(class_names) - 1)]
            if min_points > 0:
                pts_i = np.asarray(batch["points"][i])
                mask_i = np.asarray(batch["points_mask"][i]).astype(bool)
                keep &= filter_min_points_boxes(boxes, pts_i[mask_i], min_points)
            info = {
                "index": batch["frame_id"][i] if "frame_id" in batch else i,
                "gt_boxes": boxes[keep][:, :7],
                "gt_names": np.asarray([class_names[l - 1] for l in labels[keep]]),
                "score": scores[keep],
            }
            if perturb is not None:
                info["point_perturb"] = perturb[i]
                # voxel-coordinate storage (the reference's robust `_k` form,
                # generate_pseudo_labels_perturb_k -> p_voxel_perturb /
                # p_voxel_coords): survives point resampling because the adv
                # dataset looks perturbations up by each point's voxel cell
                pts_i = np.asarray(batch["points"][i])
                mask_i = np.asarray(batch["points_mask"][i]).astype(bool)
                vc, vp = voxelize_perturb(
                    pts_i[mask_i], perturb[i][mask_i],
                    info["gt_boxes"],
                    voxel_size=dataset.voxel_size,
                    pc_range=dataset.point_cloud_range,
                )
                info["p_voxel_coords"] = vc
                info["p_voxel_perturb"] = vp
                info["p_voxel_size"] = np.asarray(dataset.voxel_size, np.float32)
                info["p_pc_range"] = np.asarray(dataset.point_cloud_range, np.float32)
            pseudo_infos.append(info)
    if logger:
        n_boxes = sum(len(p["gt_boxes"]) for p in pseudo_infos)
        logger.info("pseudo labels: %d frames, %d boxes", len(pseudo_infos), n_boxes)
    return pseudo_infos


def voxelize_perturb(points, point_perturb, pseudo_boxes, voxel_size, pc_range):
    """Aggregate per-point perturbations of points INSIDE pseudo boxes to their
    voxel cells: returns (p_voxel_coords (V, 3) int32, p_voxel_perturb (V, 3)).

    Reference `_k` semantics (generate_pseudo_labels_perturb_k: store
    voxel-level perturbations keyed by voxel coords so a re-sampled frame can
    re-attach them)."""
    from ..utils import box_utils

    if len(pseudo_boxes) == 0 or len(points) == 0:
        return np.zeros((0, 3), np.int32), np.zeros((0, 3), np.float32)
    member = box_utils.points_in_boxes_numpy(points, pseudo_boxes[:, :7]).any(axis=0)
    pts = points[member]
    per = np.asarray(point_perturb)[member][:, :3]
    if len(pts) == 0:
        return np.zeros((0, 3), np.int32), np.zeros((0, 3), np.float32)
    vs = np.asarray(voxel_size, np.float32)
    origin = np.asarray(pc_range[:3], np.float32)
    ijk = np.floor((pts[:, :3] - origin) / vs).astype(np.int64)
    in_grid = (ijk >= 0).all(axis=1) & (ijk < (1 << 20)).all(axis=1)
    ijk, per = ijk[in_grid], per[in_grid]
    if len(ijk) == 0:
        return np.zeros((0, 3), np.int32), np.zeros((0, 3), np.float32)
    key = (ijk[:, 2] * (1 << 20) + ijk[:, 1]) * (1 << 20) + ijk[:, 0]
    uniq, inv = np.unique(key, return_inverse=True)
    sums = np.zeros((len(uniq), 3), np.float32)
    np.add.at(sums, inv, per)
    counts = np.bincount(inv, minlength=len(uniq)).astype(np.float32)
    mean = sums / counts[:, None]
    coords = np.stack(
        [uniq % (1 << 20), (uniq >> 20) % (1 << 20), uniq >> 40], axis=1
    ).astype(np.int32)
    return coords, mean


def lookup_voxel_perturb(points, info):
    """(N, 3+) points -> (N, 3) per-point perturbation looked up by voxel cell
    (zero where the frame's stored voxels don't cover a point)."""
    vc = np.asarray(info["p_voxel_coords"], np.int64)
    vp = np.asarray(info["p_voxel_perturb"], np.float32)
    if len(vc) == 0:
        return np.zeros((len(points), 3), np.float32)
    vs = np.asarray(info["p_voxel_size"], np.float32)
    origin = np.asarray(info["p_pc_range"][:3], np.float32)
    ijk = np.floor((points[:, :3] - origin) / vs).astype(np.int64)
    key = (ijk[:, 2] * (1 << 20) + ijk[:, 1]) * (1 << 20) + ijk[:, 0]
    vkey = (vc[:, 2] * (1 << 20) + vc[:, 1]) * (1 << 20) + vc[:, 0]
    order = np.argsort(vkey)
    vkey_sorted = vkey[order]
    pos = np.searchsorted(vkey_sorted, key)
    pos = np.clip(pos, 0, len(vkey_sorted) - 1)
    hit = vkey_sorted[pos] == key
    out = np.zeros((len(points), 3), np.float32)
    out[hit] = vp[order][pos[hit]]
    return out

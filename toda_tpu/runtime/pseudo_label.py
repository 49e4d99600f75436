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


def generate_pseudo_labels(
    bundle,
    variables,
    loader,
    dataset,
    class_names,
    score_thresh=0.2,
    with_perturb=False,
    eps=1.0,
    logger=None,
):
    """Sweep the unlabeled split; returns pseudo info list compatible with
    MixUpDataset.pseudo_infos.

    score_thresh: float or {class_name: float} (reference uses 0.2 at 1-10%
    labels, 0.3 at 20% — docs/RUN_MODEL.md:22-24).
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
            info = {
                "index": batch["frame_id"][i] if "frame_id" in batch else i,
                "gt_boxes": boxes[keep][:, :7],
                "gt_names": np.asarray([class_names[l - 1] for l in labels[keep]]),
                "score": scores[keep],
            }
            if perturb is not None:
                info["point_perturb"] = perturb[i]
            pseudo_infos.append(info)
    if logger:
        n_boxes = sum(len(p["gt_boxes"]) for p in pseudo_infos)
        logger.info("pseudo labels: %d frames, %d boxes", len(pseudo_infos), n_boxes)
    return pseudo_infos

"""AnchorHeadMulti — CBGS grouped multi-head anchor head (nuScenes).

Reference: pcdet/models/dense_heads/anchor_head_multi.py:1-373 (SingleHead per
RPN_HEAD_CFGS group over a shared conv, optional separate per-regression-target
branches, per-head class label spaces). JAX redesign: each group is an
independent anchor head over its OWN anchor subset and a locally-remapped gt
class space — the torch version's (a, H, W) anchor-permutation bookkeeping
disappears because heads never share an anchor tensor.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .anchor_head_single import anchor_head_loss, generate_predicted_boxes


class AnchorHeadMulti(nn.Module):
    model_cfg: dict
    input_channels: int
    head_num_classes: tuple  # classes per head group
    head_num_anchors: tuple  # anchors-per-location per head group
    code_size: int

    @nn.compact
    def __call__(self, batch_dict, training=False):
        x = batch_dict["spatial_features_2d"]  # (B, H, W, C)
        shared = self.model_cfg.get("SHARED_CONV_NUM_FILTER", None)
        if shared:
            x = nn.Conv(int(shared), (3, 3), padding="SAME", use_bias=False,
                        name="shared_conv")(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                             epsilon=1e-3, name="shared_bn")(x)
            x = nn.relu(x)
        b = x.shape[0]
        sep_reg = self.model_cfg.get("SEPARATE_REG_CONFIG", None)
        use_dir = self.model_cfg.get("USE_DIRECTION_CLASSIFIER", False)
        num_bins = self.model_cfg.get("NUM_DIR_BINS", 2)

        heads = []
        for gi, (nc, a) in enumerate(zip(self.head_num_classes, self.head_num_anchors)):
            h = x
            cls = nn.Conv(
                a * nc, (3, 3) if sep_reg else (1, 1), padding="SAME",
                bias_init=nn.initializers.constant(-float(np.log((1 - 0.01) / 0.01))),
                name=f"h{gi}_cls",
            )(h)
            if sep_reg is not None:
                nmid, nfil = int(sep_reg["NUM_MIDDLE_CONV"]), int(sep_reg["NUM_MIDDLE_FILTER"])
                parts = []
                for reg_spec in sep_reg["REG_LIST"]:
                    rname, rch = reg_spec.split(":")
                    r = h
                    for k in range(nmid):
                        r = nn.Conv(nfil, (3, 3), padding="SAME", use_bias=False,
                                    name=f"h{gi}_{rname}_mid{k}")(r)
                        r = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                                         epsilon=1e-3, name=f"h{gi}_{rname}_bn{k}")(r)
                        r = nn.relu(r)
                    parts.append(
                        nn.Conv(a * int(rch), (3, 3), padding="SAME",
                                name=f"h{gi}_{rname}_out")(r).reshape(b, -1, a, int(rch))
                    )
                box = jnp.concatenate(parts, axis=-1).reshape(b, -1, self.code_size)
            else:
                box = nn.Conv(a * self.code_size, (1, 1), name=f"h{gi}_box")(h)
                box = box.reshape(b, -1, self.code_size)
            out = {
                "cls_preds": cls.reshape(b, -1, nc),
                "box_preds": box,
            }
            if use_dir:
                d = nn.Conv(a * num_bins, (1, 1), name=f"h{gi}_dir")(h)
                out["dir_cls_preds"] = d.reshape(b, -1, num_bins)
            heads.append(out)
        batch_dict["multihead_preds"] = heads
        return batch_dict


def multi_head_loss(batch_dict, head_targets, head_anchors, model_cfg, head_num_classes,
                    box_coder):
    """Sum of per-head anchor losses (reference AnchorHeadMulti.get_loss)."""
    total, tb = 0.0, {}
    for gi, (out, targets, anchors, nc) in enumerate(
        zip(batch_dict["multihead_preds"], head_targets, head_anchors, head_num_classes)
    ):
        out = dict(out)
        out["batch_size"] = batch_dict["batch_size"]
        loss, htb = anchor_head_loss(out, targets, anchors, model_cfg, nc, box_coder)
        total = total + loss
        tb.update({f"h{gi}_{k}": v for k, v in htb.items()})
    tb["rpn_loss"] = total
    return total, tb


def multi_head_predicted_boxes(batch_dict, head_anchors, head_label_indices, model_cfg,
                               box_coder):
    """Decode each head against its anchors; concat with GLOBAL class labels.

    Returns (boxes (B, N, 7+), scores (B, N), labels (B, N))."""
    boxes_all, scores_all, labels_all = [], [], []
    for out, anchors, label_idx in zip(
        batch_dict["multihead_preds"], head_anchors, head_label_indices
    ):
        cls_logits, boxes = generate_predicted_boxes(out, anchors, model_cfg, box_coder)
        probs = jax.nn.sigmoid(cls_logits)  # (B, N, nc_h)
        scores = probs.max(axis=-1)
        local = probs.argmax(axis=-1)
        labels = jnp.asarray(label_idx, dtype=jnp.int32)[local]
        boxes_all.append(boxes)
        scores_all.append(scores)
        labels_all.append(labels)
    return (
        jnp.concatenate(boxes_all, axis=1),
        jnp.concatenate(scores_all, axis=1),
        jnp.concatenate(labels_all, axis=1),
    )

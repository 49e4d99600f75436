"""Stage-2 two-view (adv, org) train step with consistency loss.

Reference: the missing ``train_utils_cl.train_model_cl`` (imported but absent
upstream, SURVEY.md caveats) + model_fn_decorator_cl (pcdet/models/__init__.py:
88-125) + the DistModel double-forward DDP wrapper (stage2_mixup_train_cl.py:
61-73). In JAX both forwards live in ONE jitted step, so the reference's
single-allreduce trick is automatic: XLA sees one gradient reduction.
"""

import jax
import jax.numpy as jnp

from ..models.consistency import consistency_loss, reverse_boxes_jnp

CL_ARRAY_KEYS = ("points", "points_mask", "gt_boxes", "aug_vector")


def select_cl_arrays(batch):
    return {
        view: {k: jnp.asarray(batch[view][k]) for k in CL_ARRAY_KEYS if k in batch[view]}
        for view in ("adv", "org")
    }


def make_train_step_cl(bundle, consistency_weight=0.1, score_thresh=0.3, topk=32):
    def train_step(state, batch):
        adv, org = batch["adv"], batch["org"]
        bsz = adv["points"].shape[0]

        def loss_fn(params):
            v1 = {"params": params, "batch_stats": state.batch_stats}
            out_a, st1 = bundle.module.apply(
                v1, {**adv, "batch_size": bsz}, training=True, mutable=["batch_stats"]
            )
            v2 = {"params": params, "batch_stats": st1["batch_stats"]}
            out_o, st2 = bundle.module.apply(
                v2, {**org, "batch_size": bsz}, training=True, mutable=["batch_stats"]
            )
            loss_a, tb_a = bundle.head_loss(out_a, adv["gt_boxes"], bsz)
            loss_o, tb_o = bundle.head_loss(out_o, org["gt_boxes"], bsz)

            boxes_a, scores_a = bundle.decode_topk(out_a, k=topk)
            boxes_o, scores_o = bundle.decode_topk(out_o, k=topk)
            boxes_a = reverse_boxes_jnp(boxes_a, adv["aug_vector"])
            boxes_o = reverse_boxes_jnp(boxes_o, org["aug_vector"])
            c_loss, s_loss = consistency_loss(
                boxes_a, scores_a, boxes_o, scores_o, score_thresh=score_thresh
            )
            total = loss_a + loss_o + consistency_weight * (c_loss + s_loss)
            tb = {
                "loss": total, "loss_adv": loss_a, "loss_org": loss_o,
                "consistency_center": c_loss, "consistency_size": s_loss,
            }
            return total, (tb, st2)

        (loss, (tb, new_model_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(batch_stats=new_model_state["batch_stats"])
        return new_state, tb

    return jax.jit(train_step, donate_argnums=(0,))

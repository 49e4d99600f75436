"""Optimizer / LR-schedule builders on optax.

Reference: tools/train_utils/optimization/__init__.py:12-63 (adam / sgd /
adam_onecycle with fastai OptimWrapper) and learning_schedules_fastai.py
(OneCycle, CosineWarmupLR). The fastai layer-group machinery collapses to optax
transform chains; OneCycle maps to optax.cosine_onecycle_schedule (the momentum
companion cycle of the reference is folded into b1 scheduling via inject_hyperparams
when MOMS is configured).
"""

import optax


def build_scheduler_fn(opt_cfg, total_steps):
    """Returns an optax schedule callable step -> lr."""
    name = opt_cfg.get("OPTIMIZER", "adam_onecycle")
    lr = float(opt_cfg["LR"])
    if name == "adam_onecycle":
        return optax.cosine_onecycle_schedule(
            transition_steps=max(total_steps, 1),
            peak_value=lr,
            pct_start=float(opt_cfg.get("PCT_START", 0.4)),
            div_factor=float(opt_cfg.get("DIV_FACTOR", 10.0)),
            final_div_factor=1e4,
        )
    decay_steps = opt_cfg.get("DECAY_STEP_LIST", None)
    if decay_steps:
        # DECAY_STEP_LIST holds EPOCH indices (reference optimization/__init__.py:44-50
        # multiplies by len(train_loader)); scale to iterations via NUM_EPOCHS
        num_epochs = int(opt_cfg.get("NUM_EPOCHS", 1))
        steps_per_epoch = max(total_steps // max(num_epochs, 1), 1)
        boundaries = {
            int(s) * steps_per_epoch: float(opt_cfg.get("LR_DECAY", 0.1))
            for s in decay_steps
        }
        return optax.piecewise_constant_schedule(lr, boundaries)
    return optax.constant_schedule(lr)


def build_optimizer(opt_cfg, total_steps):
    """Returns (optax.GradientTransformation, schedule_fn)."""
    name = opt_cfg.get("OPTIMIZER", "adam_onecycle")
    schedule = build_scheduler_fn(opt_cfg, total_steps)
    wd = float(opt_cfg.get("WEIGHT_DECAY", 0.0))
    clip = float(opt_cfg.get("GRAD_NORM_CLIP", 0.0))

    def decay_mask(params):
        # no weight decay on biases / norm scales (standard practice; the
        # reference's true-wd fastai optimizer also excludes BN params)
        import jax

        def is_weight(path):
            leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            return leaf not in ("bias", "scale")

        return jax.tree_util.tree_map_with_path(lambda p, _: is_weight(p), params)

    if name in ("adam", "adam_onecycle"):
        if wd > 0:
            core = optax.adamw(schedule, weight_decay=wd, mask=decay_mask)
        else:
            core = optax.adam(schedule)
    elif name == "sgd":
        core = optax.chain(
            optax.add_decayed_weights(wd, mask=decay_mask) if wd > 0 else optax.identity(),
            optax.sgd(schedule, momentum=float(opt_cfg.get("MOMENTUM", 0.9))),
        )
    else:
        raise NotImplementedError(name)

    tx = optax.chain(
        optax.clip_by_global_norm(clip) if clip > 0 else optax.identity(),
        core,
    )
    return tx, schedule

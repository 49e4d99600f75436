"""Optimizer / LR-schedule builders on optax.

Reference: tools/train_utils/optimization/__init__.py:12-63 (adam / sgd /
adam_onecycle with fastai OptimWrapper) and learning_schedules_fastai.py
(OneCycle :60-114, CosineWarmupLR :117-136). The fastai layer-group machinery
collapses to optax transform chains. OneCycle maps to
optax.cosine_onecycle_schedule for the LR, and the reference's momentum
companion cycle (MOMS[0] -> MOMS[1] during warmup, back to MOMS[0] after) is
implemented as a b1 schedule via optax.inject_hyperparams. Non-onecycle
optimizers honor the LR_WARMUP/WARMUP_EPOCH cosine warmup fallback.
"""

import jax.numpy as jnp
import optax


def _annealing_cos(start, end, t):
    """fastai annealing_cos: cosine interpolation start -> end over t in [0, 1]."""
    return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * t))


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
    num_epochs = int(opt_cfg.get("NUM_EPOCHS", 1))
    steps_per_epoch = max(total_steps // max(num_epochs, 1), 1)
    decay_steps = opt_cfg.get("DECAY_STEP_LIST", None)
    if decay_steps:
        # DECAY_STEP_LIST holds EPOCH indices (reference optimization/__init__.py:44-50
        # multiplies by len(train_loader)); scale to iterations via NUM_EPOCHS
        boundaries = {
            int(s) * steps_per_epoch: float(opt_cfg.get("LR_DECAY", 0.1))
            for s in decay_steps
        }
        base = optax.piecewise_constant_schedule(lr, boundaries)
    else:
        base = optax.constant_schedule(lr)
    if opt_cfg.get("LR_WARMUP", False):
        # CosineWarmupLR fallback (reference optimization/__init__.py:52-56):
        # cosine ramp lr/div_factor -> lr over WARMUP_EPOCH epochs
        warm_steps = max(int(opt_cfg.get("WARMUP_EPOCH", 1)) * steps_per_epoch, 1)
        div = float(opt_cfg.get("DIV_FACTOR", 10.0))

        def sched(step):
            t = jnp.clip(step / warm_steps, 0.0, 1.0)
            warm_lr = _annealing_cos(lr / div, lr, t)
            return jnp.where(step < warm_steps, warm_lr, base(step))

        return sched
    return base


def build_b1_schedule(opt_cfg, total_steps):
    """The OneCycle momentum companion (reference learning_schedules_fastai.py:60-114):
    b1 anneals MOMS[0] -> MOMS[1] over the PCT_START warmup, then back to
    MOMS[0] for the remainder, both via cosine."""
    moms = [float(m) for m in opt_cfg.get("MOMS", [0.95, 0.85])]
    pct = float(opt_cfg.get("PCT_START", 0.4))
    total = max(total_steps, 1)
    warm = max(int(total * pct), 1)

    def sched(step):
        step = jnp.clip(step, 0, total)
        t1 = jnp.clip(step / warm, 0.0, 1.0)
        t2 = jnp.clip((step - warm) / max(total - warm, 1), 0.0, 1.0)
        up = _annealing_cos(moms[0], moms[1], t1)
        down = _annealing_cos(moms[1], moms[0], t2)
        return jnp.where(step < warm, up, down)

    return sched


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
        kwargs = {}
        if name == "adam_onecycle":
            kwargs["b1"] = build_b1_schedule(opt_cfg, total_steps)
        if wd > 0:
            core = optax.inject_hyperparams(optax.adamw, static_args=("mask",))(
                learning_rate=schedule, weight_decay=wd, mask=decay_mask, **kwargs
            )
        else:
            core = optax.inject_hyperparams(optax.adam)(
                learning_rate=schedule, **kwargs
            )
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

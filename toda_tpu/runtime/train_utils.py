"""Training loop: jitted train step over a DP mesh, epoch driver, checkpointing.

Reference: tools/train_utils/train_utils.py:11-176 (train_one_epoch / train_model /
checkpoint_state). Redesign: the per-iteration body (voxelize + forward + loss +
backward + clip + update + BN-stat update) is ONE jitted function; timing metrics
come from host wall-clock around the device step (the reference's
data_time/forward_time/batch_time surface, train_utils.py:23-86).
"""

import os
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from flax.training import train_state

from ..parallel import make_mesh, replicate, shard_batch
from ..utils.common_utils import AverageMeter
from . import checkpoint as ckpt_lib
from .optimization import build_optimizer


class TrainState(train_state.TrainState):
    batch_stats: Any = None


ARRAY_KEYS = (
    "points", "points_mask", "gt_boxes",
    # camera items (CaDDN): present only when the dataset's GET_ITEM_LIST
    # requests them
    "images", "trans_lidar_to_cam", "trans_cam_to_img",
)


def select_batch_arrays(batch):
    """Keep only the static-shape array fields the jitted step consumes."""
    out = {k: v for k, v in batch.items() if k in ARRAY_KEYS}
    return out


def make_train_step(bundle):
    def train_step(state, batch):
        batch = dict(batch)
        batch["batch_size"] = batch["points"].shape[0]

        # per-step rng for RoI sampling / dropout, derived from the step counter
        step_rng = jax.random.fold_in(jax.random.PRNGKey(42), state.step)

        def loss_fn(params):
            total, (tb, new_model_state) = bundle.loss(
                {"params": params, "batch_stats": state.batch_stats}, batch, rng=step_rng
            )
            return total, (tb, new_model_state)

        (loss, (tb, new_model_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(batch_stats=new_model_state["batch_stats"])
        tb = dict(tb)
        tb["loss"] = loss
        return new_state, tb

    return jax.jit(train_step, donate_argnums=(0,))


def create_train_state(bundle, opt_cfg, total_steps, example_batch, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    batch = dict(select_batch_arrays(example_batch))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = bundle.init(rng, batch)
    tx, schedule = build_optimizer(opt_cfg, total_steps)
    state = TrainState.create(
        apply_fn=bundle.module.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )
    return state, schedule


def train_model(
    bundle,
    state,
    train_loader,
    opt_cfg,
    start_epoch,
    total_epochs,
    ckpt_save_dir,
    schedule=None,
    logger=None,
    ckpt_save_interval=1,
    max_ckpt_save_num=30,
    tb_log=None,
    use_mesh=True,
    train_step=None,
    hooks=None,
):
    """Epoch driver (reference train_utils.train_model)."""
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    train_step = train_step or make_train_step(bundle)
    if mesh is not None:
        state = replicate(state, mesh)

    # debug-mode cross-host race detector (SURVEY §5): every N iters all
    # processes checksum their view of the replicated params and assert
    # agreement. 0 = off (the default; it costs a host transfer + barrier).
    checksum_every = int(os.environ.get("TODA_DEBUG_CHECKSUM", "0"))

    accumulated_iter = int(state.step)
    total_its = len(train_loader)
    for cur_epoch in range(start_epoch, total_epochs):
        train_loader.set_epoch(cur_epoch)
        data_meter, batch_meter = AverageMeter(), AverageMeter()
        end = time.time()
        # curriculum knob for mix processors (reference train_utils.py:47-48) —
        # set BEFORE fetching the batch so the first batch of the epoch already
        # sees the up-to-date schedule position
        train_loader.dataset.train_percent = accumulated_iter / max(
            total_its * total_epochs, 1
        )
        for it, batch in enumerate(train_loader):
            data_meter.update(time.time() - end)
            train_loader.dataset.train_percent = (accumulated_iter + 1) / max(
                total_its * total_epochs, 1
            )
            arrays = {k: jnp.asarray(v) for k, v in select_batch_arrays(batch).items()}
            if mesh is not None:
                arrays = shard_batch(arrays, mesh)
            state, tb = train_step(state, arrays)
            if hooks:
                for h in hooks:
                    h(state, batch, tb, accumulated_iter)
            if checksum_every and accumulated_iter % checksum_every == 0:
                from ..utils import commu_utils

                commu_utils.assert_params_in_sync(
                    state.params, tag=f"iter {accumulated_iter}"
                )
            accumulated_iter += 1
            batch_meter.update(time.time() - end)
            end = time.time()
            if logger and (it % max(total_its // 4, 1) == 0):
                from ..utils import commu_utils

                lr = float(schedule(accumulated_iter)) if schedule else 0.0
                # per-iter timing averaged across ranks (reference
                # train_utils.py:62-65 average_reduce_value)
                data_avg = commu_utils.average_reduce_value(data_meter.avg)
                batch_avg = commu_utils.average_reduce_value(batch_meter.avg)
                logger.info(
                    "epoch %d it %d/%d loss %.4f lr %.2e data %.3fs batch %.3fs",
                    cur_epoch, it, total_its, float(tb["loss"]), lr,
                    data_avg, batch_avg,
                )
            if tb_log is not None:
                # full tb_dict surface (reference train_utils.py:82-86): loss
                # components, lr, and host-side timings
                for k, v in tb.items():
                    if np.ndim(v) == 0:
                        tb_log.add_scalar(f"train/{k}", float(v), accumulated_iter)
                if schedule is not None:
                    tb_log.add_scalar(
                        "meta_data/learning_rate", float(schedule(accumulated_iter)),
                        accumulated_iter,
                    )
                tb_log.add_scalar("meta_data/data_time", data_meter.val, accumulated_iter)
                tb_log.add_scalar("meta_data/batch_time", batch_meter.val, accumulated_iter)

        if cur_epoch % ckpt_save_interval == 0 or cur_epoch == total_epochs - 1:
            # collective: every process must call (orbax syncs across hosts and
            # writes from the primary) — a rank-0-only call deadlocks multi-host
            ckpt_lib.save_checkpoint(
                ckpt_save_dir, state, epoch=cur_epoch + 1, max_keep=max_ckpt_save_num
            )
    return state

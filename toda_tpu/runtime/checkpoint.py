"""Checkpoint save/restore/resume on orbax.

Reference: tools/train_utils/train_utils.py:127-176 (checkpoint_state,
save_checkpoint, FIFO pruning beyond max_ckpt_save_num) and
detector3d_template.py:361-411 (resume / partial transfer loads). State is the
full TrainState pytree {params, batch_stats, opt_state, step} + epoch; process 0
writes (multi-host safe); stage transitions load params-only (`load_params_only`).
"""

import shutil
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..utils.common_utils import scan_dir_for_ckpts


def _ckpt_path(ckpt_dir, epoch):
    return (Path(ckpt_dir) / f"checkpoint_epoch_{epoch}").resolve()


def save_checkpoint(ckpt_dir, state, epoch, max_keep=30):
    """Write `checkpoint_epoch_{epoch}`. In multi-process runs EVERY process must
    call this (orbax's save is a cross-host collective; only the primary host
    writes array data) — the analog of reference rank-0 checkpoint_state
    (train_utils.py:127-139) is the primary-host write, not a rank-0-only call."""
    ckpt_dir = Path(ckpt_dir)
    if jax.process_index() == 0:
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        # prune oldest beyond max_keep (reference train_utils.py:129-134)
        existing = scan_dir_for_ckpts(ckpt_dir)
        for stale in existing[: max(0, len(existing) - max_keep + 1)]:
            shutil.rmtree(stale, ignore_errors=True)

    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_ckpt_path(ckpt_dir, epoch), payload, force=True)
    return _ckpt_path(ckpt_dir, epoch)


def load_checkpoint(path, state=None):
    """Restore a full training checkpoint. If `state` is given, returns it with
    params/batch_stats/opt_state/step replaced (resume); else the raw payload.

    The resume restore MUST use the live state as the target pytree: a bare
    restore rebuilds generic dicts/lists, silently dropping the typed optax
    state nodes (ScaleByAdamState, InjectStatefulHyperparamsState, ...) whose
    attribute access the next apply_gradients relies on."""
    ckptr = ocp.PyTreeCheckpointer()
    if state is None:
        return ckptr.restore(str(Path(path).resolve()))
    target = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": 0,
    }
    payload = ckptr.restore(str(Path(path).resolve()), item=target)
    return (
        state.replace(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            step=payload["step"],
        ),
        payload.get("epoch", 0),
    )


def load_params_only(path, state):
    """Weights-only transfer (the reference's --pretrained_model path,
    stage2_mixup_train.py:127-132): params + batch_stats, optimizer reset."""
    payload = load_checkpoint(path)
    return state.replace(params=payload["params"], batch_stats=payload["batch_stats"])


def latest_checkpoint(ckpt_dir):
    ckpts = scan_dir_for_ckpts(ckpt_dir)
    return ckpts[-1] if ckpts else None

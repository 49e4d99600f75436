"""Worker for tests/test_parallel.py::test_merged_eval_matches_single_process.

Runs one process of a 2-process CPU jax.distributed job: shards the synthetic
dataset, runs eval_one_epoch with a deterministic fake predictor, and (rank 0)
dumps the merged result dict to OUT_JSON. Not collected by pytest (no test_
prefix).
"""

import json
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")


def fake_predict_step(variables, arrays):
    """Deterministic detections: one box at the mean of the valid points."""
    import jax.numpy as jnp

    pts, mask = arrays["points"], arrays["points_mask"]
    w = mask.astype(jnp.float32)[..., None]
    center = (pts[..., :3] * w).sum(axis=1) / jnp.clip(w.sum(axis=1), 1.0, None)
    b = pts.shape[0]
    k = 4
    boxes = jnp.zeros((b, k, 7))
    boxes = boxes.at[:, 0, :3].set(center)
    boxes = boxes.at[:, 0, 3:6].set(jnp.asarray([4.0, 2.0, 1.6]))
    det_mask = jnp.zeros((b, k), jnp.int32).at[:, 0].set(1)
    return {
        "pred_boxes": boxes,
        "pred_scores": jnp.full((b, k), 0.9) * det_mask,
        "pred_labels": det_mask,
        "pred_mask": det_mask,
    }


def build(world_cfg):
    import numpy as np

    from toda_tpu.config import EDict, cfg_from_yaml_file
    from toda_tpu.datasets import build_dataloader

    np.random.seed(0)
    cfg = cfg_from_yaml_file(
        "tools/cfgs/synthetic_models/pointpillar_synthetic_tiny.yaml", EDict()
    )
    cfg.DATA_CONFIG.NUM_SCENES = 6
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False,
        dist=world_cfg["dist"],
    )
    loader.drop_last = False
    return cfg, dataset, loader


class FakeBundle:
    post_cfg = {"RECALL_THRESH_LIST": [0.3, 0.5]}


def main():
    port, rank, world, out_json = sys.argv[1:5]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=int(world),
        process_id=int(rank),
    )
    from toda_tpu.runtime.eval_utils import eval_one_epoch

    cfg, dataset, loader = build({"dist": True})
    result, annos = eval_one_epoch(
        FakeBundle(), None, loader, dataset, cfg.CLASS_NAMES,
        predict_step=fake_predict_step,
    )
    if jax.process_index() == 0:
        with open(out_json, "w") as f:
            json.dump({k: float(v) for k, v in result.items()}, f)


if __name__ == "__main__":
    main()

"""Measure proposal recall: SECOND-IoU static-top-N fast path vs per-frame NMS.

The SECOND-IoU RoI stage takes a static top-N proposal shortcut when the head
config has no NMS_CONFIG (detector3d._make_proposals) on the claim that the
IoU-rescoring head is insensitive to duplicate proposals. This script trains
the synthetic SECOND-IoU config briefly, then evaluates proposal recall
(recall_roi_*, runtime/eval_utils.py) under BOTH proposal modes and prints
the delta — the measurement VERDICT r2 weak #3 asked for.

Run: JAX_PLATFORMS=cpu python tools/measure_roi_recall.py
"""

import copy
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax.numpy as jnp

    from toda_tpu.config import EDict, cfg_from_yaml_file
    from toda_tpu.datasets import build_dataloader
    from toda_tpu.models import build_network
    from toda_tpu.runtime.eval_utils import eval_one_epoch
    from toda_tpu.runtime.train_utils import (
        create_train_state, make_train_step, select_batch_arrays,
    )

    root = Path(__file__).resolve().parents[1]
    cfg = cfg_from_yaml_file(
        str(root / "tools/cfgs/synthetic_models/second_iou_synthetic.yaml"), EDict()
    )
    cfg.DATA_CONFIG.NUM_SCENES = 16
    np.random.seed(0)
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=4, training=True
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    state, _ = create_train_state(bundle, cfg.OPTIMIZATION, 160, batch)
    step = make_train_step(bundle)
    for epoch in range(40):
        loader.set_epoch(epoch)
        for b in loader:
            arrays = {k: jnp.asarray(v) for k, v in select_batch_arrays(b).items()}
            state, tb = step(state, arrays)
    print(f"trained 10 epochs, final loss {float(tb['loss']):.3f}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    eval_ds, eval_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=4, training=False
    )

    results = {}
    for mode in ("static_topN", "proposal_nms"):
        mcfg = copy.deepcopy(cfg.MODEL)
        if mode == "proposal_nms":
            mcfg.ROI_HEAD.NMS_CONFIG = EDict({
                "TEST": {
                    "NMS_TYPE": "nms_bev", "MULTI_CLASSES_NMS": False,
                    "NMS_PRE_MAXSIZE": 1024, "NMS_POST_MAXSIZE": 128,
                    "NMS_THRESH": 0.7,
                }
            })
        b2 = build_network(mcfg, num_class=len(cfg.CLASS_NAMES), dataset=eval_ds)
        result, _ = eval_one_epoch(
            b2, variables, eval_loader, eval_ds, cfg.CLASS_NAMES
        )
        results[mode] = {
            k: round(float(v), 4) for k, v in result.items() if "recall" in k
        }
        print(mode, results[mode])
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

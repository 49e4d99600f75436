"""Trained-accuracy evidence on the hermetic synthetic dataset (VERDICT r2 #4:
no real nuScenes/Waymo data can exist in this environment, so the committed
accuracy artifact is a full train->eval run on the synthetic fixture with the
nuScenes-protocol metric backend).

Trains the given config to convergence and writes EVIDENCE.md with the final
loss curve points, recall, and metric numbers.

Run (TPU): python tools/evidence_run.py [cfg] [epochs]
"""

import datetime
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from toda_tpu.config import EDict, cfg_from_yaml_file
    from toda_tpu.datasets import build_dataloader
    from toda_tpu.models import build_network
    from toda_tpu.runtime.eval_utils import eval_one_epoch
    from toda_tpu.runtime.train_utils import (
        create_train_state, make_train_step, select_batch_arrays,
    )

    root = Path(__file__).resolve().parents[1]
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else (
        "tools/cfgs/synthetic_models/second_synthetic.yaml"
    )
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    cfg = cfg_from_yaml_file(str(root / cfg_path), EDict())
    np.random.seed(0)
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES,
        batch_size=int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU), training=True,
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    batch = next(iter(loader))
    total_steps = len(loader) * epochs
    state, _ = create_train_state(bundle, cfg.OPTIMIZATION, total_steps, batch)
    step = make_train_step(bundle)

    losses = []
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        ep = []
        for b in loader:
            arrays = {k: jnp.asarray(v) for k, v in select_batch_arrays(b).items()}
            state, tb = step(state, arrays)
            ep.append(float(tb["loss"]))
        losses.append(float(np.mean(ep)))
        if epoch % 5 == 0 or epoch == epochs - 1:
            print(f"epoch {epoch}: loss {losses[-1]:.4f}", flush=True)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_ds, eval_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=4, training=False
    )
    result, _ = eval_one_epoch(bundle, variables, eval_loader, eval_ds, cfg.CLASS_NAMES)
    result = {k: round(float(v), 4) for k, v in result.items()}
    print(json.dumps(result, indent=1))

    out = root / "EVIDENCE.md"
    backend = jax.default_backend()
    block = f"""
## {Path(cfg_path).stem} — {epochs} epochs, {backend}, {datetime.date.today()}

Loss: {losses[0]:.3f} -> {losses[-1]:.3f} (per-epoch means: {', '.join(f'{v:.2f}' for v in losses[::max(epochs // 8, 1)])})

Eval ({cfg.MODEL.POST_PROCESSING.get('EVAL_METRIC', 'synthetic')} metric):
```json
{json.dumps(result, indent=1)}
```
"""
    header = (
        "# Trained-accuracy evidence (synthetic fixture)\n\n"
        "No real nuScenes/Waymo/KITTI data can be materialized in this zero-egress\n"
        "environment; protocol parity of the metric backends is pinned by\n"
        "tests/golden/metrics_golden.json and the per-backend protocol tests.\n"
        "This file records full train->eval runs on the synthetic dataset as the\n"
        "end-to-end accuracy artifact (VERDICT r2 next-round #4).\n"
    )
    if out.exists():
        txt = out.read_text()
    else:
        txt = header
    out.write_text(txt + block)
    print("wrote", out)


if __name__ == "__main__":
    main()

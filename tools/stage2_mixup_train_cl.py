"""Stage-2 adversarial MixUp + consistency-loss training.

Reference CLI: tools/stage2_mixup_train_cl.py (222 LoC) with the DistModel
two-forward wrapper and the missing train_utils_cl (reconstructed in
toda_tpu/runtime/train_cl.py). The dataset yields (adv, org) pairs — adv with
fresh augmentation + stored adversarial point perturbations, org with replayed
params + one extra transform — and the loss adds 0.1 x (center + size)
consistency between the two views mapped back to the canonical frame.
"""

import argparse
import datetime
import time

import _init_path  # noqa: F401
import jax
import numpy as np

from toda_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
from toda_tpu.datasets import DataLoader, build_mixup_dataloader
from toda_tpu.datasets.dataset_cl import CLPairDataset
from toda_tpu.models import build_network
from toda_tpu.runtime import checkpoint as ckpt_lib
from toda_tpu.runtime.train_cl import make_train_step_cl, select_cl_arrays
from toda_tpu.runtime.train_utils import create_train_state
from toda_tpu.utils import common_utils


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--pseudo_info_path", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--pretrained_model", type=str, default=None)
    parser.add_argument("--fix_random_seed", action="store_true")
    parser.add_argument("--skip_eval", action="store_true",
                        help="skip the post-training target-domain eval")
    parser.add_argument("--repeat", type=int, default=0,
                        help="epoch-length multiplier over the GT∪pseudo pool "
                             "(reference --repeat -> DATA_CONFIG.REPEAT)")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    from cli_args import add_common_train_args, init_from_args, log_compat_notes

    add_common_train_args(parser)
    args = parser.parse_args()
    init_from_args(args)
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)
    if args.repeat:
        cfg.DATA_CONFIG.REPEAT = args.repeat
    if args.fix_random_seed:
        common_utils.set_random_seed(666)

    output_dir = cfg.ROOT_DIR / "output" / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    logger = common_utils.create_logger(
        output_dir / f"log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    )

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    base_ds, _, _ = build_mixup_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=batch_size,
        pseudo_infos=args.pseudo_info_path, training=True, logger=logger,
    )
    log_compat_notes(args, logger)
    cl_cfg = cfg.MODEL.get("CL_CFG", {})
    dataset = CLPairDataset(base_ds)
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=True, drop_last=True,
                        prefetch=args.workers if args.workers > 0 else 2)

    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    example = next(iter(loader))
    state, schedule = create_train_state(
        bundle, cfg.OPTIMIZATION, len(loader) * epochs,
        example_batch=example["adv"],
    )
    if args.pretrained_model:
        state = ckpt_lib.load_params_only(args.pretrained_model, state)
        logger.info("transferred stage-1 weights from %s", args.pretrained_model)
    start_epoch = 0
    resume = args.ckpt or ckpt_lib.latest_checkpoint(ckpt_dir)
    if resume:
        state, start_epoch = ckpt_lib.load_checkpoint(resume, state)
        logger.info("resumed from %s (epoch %d)", resume, start_epoch)

    step = make_train_step_cl(
        bundle,
        consistency_weight=float(cl_cfg.get("WEIGHT", 0.1)),
        score_thresh=float(cl_cfg.get("SCORE_THRESH", 0.3)),
    )
    total_its = len(loader) * epochs
    it = start_epoch * len(loader)
    for epoch in range(start_epoch, epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        for batch in loader:
            dataset.train_percent = it / max(total_its, 1)
            state, tb = step(state, select_cl_arrays(batch))
            it += 1
        logger.info(
            "epoch %d: loss %.4f (adv %.4f org %.4f cons %.4f/%.4f) %.1fs",
            epoch, float(tb["loss"]), float(tb["loss_adv"]), float(tb["loss_org"]),
            float(tb["consistency_center"]), float(tb["consistency_size"]),
            time.time() - t0,
        )
        # collective: orbax save syncs across processes (primary host writes)
        ckpt_lib.save_checkpoint(ckpt_dir, state, epoch=epoch + 1)
    logger.info("stage-2 CL training done")

    if not args.skip_eval and "DATA_CONFIG_TEST" in cfg:
        # target-domain eval (reference evaluates DATA_CONFIG_TEST post-stage)
        from toda_tpu.runtime.eval_utils import evaluate_target_domain

        evaluate_target_domain(
            cfg, state, batch_size, logger=logger, result_dir=output_dir / "eval",
        )


if __name__ == "__main__":
    main()

"""Stage-1 inter-domain mix training (TODA).

Reference CLI: tools/stage1_cutmix_train.py (201 LoC) — same skeleton as train.py
with build_cutmix_dataloader and the curriculum `train_percent` plumbed per
iteration (handled inside toda_tpu.runtime.train_utils.train_model).
"""

import argparse
import datetime

import _init_path  # noqa: F401

from toda_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file, log_config_to_file
from toda_tpu.datasets import build_cutmix_dataloader
from toda_tpu.models import build_network
from toda_tpu.parallel import get_dist_info
from toda_tpu.runtime import checkpoint as ckpt_lib
from toda_tpu.runtime.train_utils import create_train_state, train_model
from toda_tpu.utils import common_utils


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--pretrained_model", type=str, default=None)
    parser.add_argument("--fix_random_seed", action="store_true")
    parser.add_argument("--skip_eval", action="store_true",
                        help="skip the post-training target-domain eval")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    from cli_args import add_common_train_args, init_from_args, log_compat_notes

    add_common_train_args(parser)
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)

    init_from_args(args)
    rank, world = get_dist_info()
    if args.fix_random_seed:
        common_utils.set_random_seed(666)

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS
    output_dir = cfg.ROOT_DIR / "output" / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    logger = common_utils.create_logger(
        output_dir / f"log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt", rank=rank
    )
    log_config_to_file(cfg, logger=logger)
    log_compat_notes(args, logger)

    dataset, loader, _ = build_cutmix_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=batch_size,
        dist=world > 1, training=True, logger=logger, workers=args.workers,
    )
    # stage 1 trains the unified-class detector (reference forces num_class=1
    # via the car-class remap, stage1_cutmix_train.py:115)
    num_class = len(cfg.CLASS_NAMES)
    bundle = build_network(cfg.MODEL, num_class=num_class, dataset=dataset)
    example = next(iter(loader))
    state, schedule = create_train_state(
        bundle, cfg.OPTIMIZATION, len(loader) * epochs, example
    )
    if args.pretrained_model:
        state = ckpt_lib.load_params_only(args.pretrained_model, state)
    resume = args.ckpt or ckpt_lib.latest_checkpoint(ckpt_dir)
    start_epoch = 0
    if resume:
        state, start_epoch = ckpt_lib.load_checkpoint(resume, state)

    state = train_model(
        bundle, state, loader, cfg.OPTIMIZATION, start_epoch=start_epoch,
        total_epochs=epochs, ckpt_save_dir=ckpt_dir, schedule=schedule, logger=logger,
        ckpt_save_interval=args.ckpt_save_interval,
        max_ckpt_save_num=args.max_ckpt_save_num,
    )
    logger.info("stage-1 training done")

    if not args.skip_eval and "DATA_CONFIG_TEST" in cfg:
        # target-domain eval (reference stage1_cutmix_train.py:186-200)
        from toda_tpu.runtime.eval_utils import evaluate_target_domain

        evaluate_target_domain(
            cfg, state, batch_size, logger=logger,
            result_dir=output_dir / "eval", dist=world > 1,
        )


if __name__ == "__main__":
    main()

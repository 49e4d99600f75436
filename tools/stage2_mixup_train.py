"""Stage-2 target-oriented MixUp training (no consistency loss).

Reference CLI: tools/stage2_mixup_train.py (203 LoC): build_mixup_dataloader over
GT ∪ pseudo infos, weights transferred from the stage-1 checkpoint via
--pretrained_model (optimizer fresh).
"""

import argparse
import datetime

import _init_path  # noqa: F401

from toda_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
from toda_tpu.datasets import build_mixup_dataloader
from toda_tpu.models import build_network
from toda_tpu.runtime import checkpoint as ckpt_lib
from toda_tpu.runtime.train_utils import create_train_state, train_model
from toda_tpu.utils import common_utils


def parse_args():
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
    from cli_args import add_common_train_args

    add_common_train_args(parser)
    return parser.parse_args()


def setup(args):
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)
    if getattr(args, "repeat", 0):
        cfg.DATA_CONFIG.REPEAT = args.repeat
    if args.fix_random_seed:
        common_utils.set_random_seed(666)
    output_dir = cfg.ROOT_DIR / "output" / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    logger = common_utils.create_logger(
        output_dir / f"log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    )
    return output_dir, ckpt_dir, logger


def main():
    args = parse_args()
    from cli_args import init_from_args, log_compat_notes

    init_from_args(args)
    output_dir, ckpt_dir, logger = setup(args)
    log_compat_notes(args, logger)
    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    dataset, loader, _ = build_mixup_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=batch_size,
        pseudo_infos=args.pseudo_info_path, training=True, logger=logger,
        workers=args.workers,
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    example = next(iter(loader))
    state, schedule = create_train_state(bundle, cfg.OPTIMIZATION, len(loader) * epochs, example)
    if args.pretrained_model:
        state = ckpt_lib.load_params_only(args.pretrained_model, state)
        logger.info("transferred stage-1 weights from %s", args.pretrained_model)
    start_epoch = 0
    resume = args.ckpt or ckpt_lib.latest_checkpoint(ckpt_dir)
    if resume:
        state, start_epoch = ckpt_lib.load_checkpoint(resume, state)
        logger.info("resumed from %s (epoch %d)", resume, start_epoch)

    state = train_model(
        bundle, state, loader, cfg.OPTIMIZATION, start_epoch=start_epoch,
        total_epochs=epochs, ckpt_save_dir=ckpt_dir, schedule=schedule, logger=logger,
        ckpt_save_interval=args.ckpt_save_interval,
        max_ckpt_save_num=args.max_ckpt_save_num,
    )
    logger.info("stage-2 training done")

    if not args.skip_eval and "DATA_CONFIG_TEST" in cfg:
        # target-domain eval (reference stage2_mixup_train.py post-train eval)
        from toda_tpu.runtime.eval_utils import evaluate_target_domain

        evaluate_target_domain(
            cfg, state, batch_size, logger=logger, result_dir=output_dir / "eval",
        )


if __name__ == "__main__":
    main()

"""Training entry point.

Reference CLI surface: tools/train.py (202 LoC): --cfg_file, --batch_size,
--epochs, --extra_tag, --ckpt, --pretrained_model, auto-resume from the newest
checkpoint, output/<exp_group>/<tag>/<extra_tag> run-dir convention, cfg dump into
the log. Distributed launch is jax-native: one process per host,
jax.distributed.initialize via --num_processes/--process_id (the analog of the
torchrun/SLURM launchers, scripts/dist_train.sh).
"""

import argparse
import datetime
import shutil
from pathlib import Path

import _init_path  # noqa: F401
import numpy as np

from toda_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file, log_config_to_file
from toda_tpu.datasets import build_dataloader
from toda_tpu.models import build_network
from toda_tpu.parallel import get_dist_info
from toda_tpu.runtime import checkpoint as ckpt_lib
from toda_tpu.runtime.train_utils import create_train_state, train_model
from toda_tpu.utils import common_utils


def parse_config():
    parser = argparse.ArgumentParser(description="toda_tpu trainer")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None, help="global batch size")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--pretrained_model", type=str, default=None)
    parser.add_argument("--fix_random_seed", action="store_true")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    parser.add_argument("--eval_after_train", action="store_true")
    parser.add_argument("--num_epochs_to_eval", type=int, default=0,
                        help="also evaluate the last N saved checkpoints after "
                             "training (reference train.py post-train eval)")
    # reference-CLI compatibility flags shared by every training driver
    from cli_args import add_common_train_args

    add_common_train_args(parser)
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, _ = parse_config()
    from cli_args import init_from_args

    init_from_args(args)
    rank, world = get_dist_info()
    dist = world > 1

    if args.fix_random_seed:
        common_utils.set_random_seed(666)

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    if dist:
        assert batch_size % world == 0, "global batch size must divide world size"
        batch_size = batch_size // world
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    output_dir = cfg.ROOT_DIR / "output" / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    output_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    log_file = output_dir / f"log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    logger = common_utils.create_logger(log_file, rank=rank)
    logger.info("********** Start logging **********")
    from cli_args import log_compat_notes

    log_compat_notes(args, logger)
    log_config_to_file(cfg, logger=logger)
    if rank == 0:
        shutil.copyfile(args.cfg_file, output_dir / Path(args.cfg_file).name)

    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=batch_size,
        dist=dist, training=True, logger=logger, workers=args.workers,
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    total_steps = len(loader) * epochs
    example = next(iter(loader))
    state, schedule = create_train_state(bundle, cfg.OPTIMIZATION, total_steps, example)

    start_epoch = 0
    if args.pretrained_model:
        state = ckpt_lib.load_params_only(args.pretrained_model, state)
        logger.info("loaded pretrained model from %s", args.pretrained_model)
    resume_from = args.ckpt or ckpt_lib.latest_checkpoint(ckpt_dir)
    if resume_from:
        state, start_epoch = ckpt_lib.load_checkpoint(resume_from, state)
        logger.info("resumed from %s (epoch %d)", resume_from, start_epoch)

    # training scalars into the run dir (reference train_utils.py:82-86 tb_log)
    tb_log = None
    if rank == 0:
        from toda_tpu.utils.scalar_writer import create_scalar_writer

        tb_log = create_scalar_writer(output_dir / "tensorboard")

    logger.info("********** Start training (epochs %d->%d) **********", start_epoch, epochs)
    state = train_model(
        bundle, state, loader, cfg.OPTIMIZATION,
        start_epoch=start_epoch, total_epochs=epochs,
        ckpt_save_dir=ckpt_dir, schedule=schedule, logger=logger,
        ckpt_save_interval=args.ckpt_save_interval,
        max_ckpt_save_num=args.max_ckpt_save_num,
        tb_log=tb_log,
    )
    if tb_log is not None:
        tb_log.flush()
    logger.info("********** Training done **********")

    if args.num_epochs_to_eval > 0:
        # reference train.py tail: repeat_eval_ckpt over the last N checkpoints
        from toda_tpu.runtime.eval_utils import evaluate_target_domain

        for c in common_utils.scan_dir_for_ckpts(ckpt_dir)[-args.num_epochs_to_eval:]:
            eval_state, ep = ckpt_lib.load_checkpoint(str(c), state)
            result, _ = evaluate_target_domain(
                cfg, eval_state, batch_size, logger=logger,
                result_dir=output_dir / "eval" / f"epoch_{ep}", dist=dist,
            )
            logger.info("post-train eval epoch %d: %s", ep, result)

    if args.eval_after_train:
        # stage configs carry a target-domain DATA_CONFIG_TEST distinct from the
        # MIX train config (reference stage1_cutmix_train.py:186-200 evaluates
        # the target domain after stage training); the helper rebuilds the
        # bundle over the eval domain's metadata
        from toda_tpu.runtime.eval_utils import evaluate_target_domain

        result, _ = evaluate_target_domain(
            cfg, state, batch_size, logger=logger,
            result_dir=output_dir / "eval", dist=dist,
        )
        if tb_log is not None:
            for k, v in result.items():
                tb_log.add_scalar(f"eval/{k}", float(v), epochs)
            tb_log.flush()


if __name__ == "__main__":
    main()

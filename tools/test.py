"""Evaluation entry point.

Reference CLI surface: tools/test.py (208 LoC): --cfg_file, --ckpt,
--eval_all (poll the ckpt dir and evaluate each new checkpoint, with an
eval_list record file so trainer restarts are tolerated).
"""

import argparse
import datetime
import pickle
import time
from pathlib import Path

import _init_path  # noqa: F401
import numpy as np

from toda_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
from toda_tpu.datasets import build_dataloader
from toda_tpu.models import build_network
from toda_tpu.parallel import get_dist_info
from toda_tpu.runtime import checkpoint as ckpt_lib
from toda_tpu.runtime.eval_utils import eval_one_epoch, make_predict_step
from toda_tpu.runtime.train_utils import create_train_state
from toda_tpu.utils import common_utils


def parse_config():
    parser = argparse.ArgumentParser(description="toda_tpu evaluator")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--eval_all", action="store_true")
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--max_waiting_mins", type=int, default=30)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    # --- reference-CLI compatibility (tools/test.py in rasd3/TODA) ---
    parser.add_argument("--workers", type=int, default=0,
                        help="loader prefetch depth (reference num_workers analog)")
    parser.add_argument("--eval_tag", type=str, default="default",
                        help="subdirectory under eval/ separating result sets")
    parser.add_argument("--start_epoch", type=int, default=0,
                        help="--eval_all skips checkpoints before this epoch")
    parser.add_argument("--save_to_file", action="store_true",
                        help="write per-frame detection files (KITTI label .txt "
                             "format for the kitti adapter) under final_result/data")
    parser.add_argument("--launcher", choices=["none", "pytorch", "slurm"],
                        default="none", help="accepted for reference-script compat")
    parser.add_argument("--tcp_port", type=int, default=None,
                        help="compat: unused (jax.distributed coordinator instead)")
    parser.add_argument("--local_rank", type=int, default=None,
                        help="compat: torch launchers inject this; ignored here")
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def eval_ckpt(bundle, state, ckpt_path, loader, dataset, logger, result_root,
              predict_step=None, save_to_file=False):
    state, epoch = ckpt_lib.load_checkpoint(ckpt_path, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    result_dir = Path(result_root) / f"epoch_{epoch}"
    output_path = None
    if save_to_file:
        # reference eval_utils.py:26 final_output_dir layout
        output_path = result_dir / "final_result" / "data"
        output_path.mkdir(parents=True, exist_ok=True)
    result, det_annos = eval_one_epoch(
        bundle, variables, loader, dataset, cfg.CLASS_NAMES, logger=logger,
        result_dir=result_dir, predict_step=predict_step, output_path=output_path,
    )
    result_dir.mkdir(parents=True, exist_ok=True)
    with open(result_dir / "result.pkl", "wb") as f:
        pickle.dump(det_annos, f)
    return result, epoch


def repeat_eval_ckpt(bundle, state, args, ckpt_dir, loader, dataset, logger, result_root):
    """Watcher: evaluate each new checkpoint as training produces them
    (reference test.py:86-132)."""
    record = result_root / f"eval_list_{cfg.TAG}.txt"
    evaluated = set()
    if record.exists():
        evaluated = set(record.read_text().split())
    wait_start = time.time()
    predict_step = make_predict_step(bundle)
    while True:
        ckpts = [c for c in common_utils.scan_dir_for_ckpts(ckpt_dir) if str(c) not in evaluated]
        if args.start_epoch:
            import re

            def _ep(p):
                m = re.search(r"(\d+)$", Path(p).name)
                return int(m.group(1)) if m else 0

            ckpts = [c for c in ckpts if _ep(c) >= args.start_epoch]
        if not ckpts:
            if time.time() - wait_start > args.max_waiting_mins * 60:
                break
            time.sleep(30)
            continue
        wait_start = time.time()
        for c in ckpts:
            result, epoch = eval_ckpt(
                bundle, state, c, loader, dataset, logger, result_root, predict_step,
                save_to_file=args.save_to_file,
            )
            logger.info("ckpt %s: %s", c.name, result)
            evaluated.add(str(c))
            with open(record, "a") as f:
                f.write(str(c) + "\n")


def main():
    args, _ = parse_config()
    rank, world = get_dist_info()
    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU

    output_dir = cfg.ROOT_DIR / "output" / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    result_root = output_dir / "eval"
    if args.eval_tag != "default":
        result_root = result_root / args.eval_tag
    result_root.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / f"log_test_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    logger = common_utils.create_logger(log_file, rank=rank)

    np.random.seed(1024)
    data_cfg = cfg.get("DATA_CONFIG_TEST", cfg.DATA_CONFIG)
    dataset, loader, _ = build_dataloader(
        data_cfg, cfg.CLASS_NAMES, batch_size=batch_size, training=False,
        logger=logger, workers=args.workers,
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    example = next(iter(loader))
    state, _ = create_train_state(bundle, cfg.OPTIMIZATION, total_steps=1,
                                  example_batch=example)

    if args.eval_all:
        ckpt_dir = Path(args.ckpt_dir) if args.ckpt_dir else output_dir / "ckpt"
        repeat_eval_ckpt(bundle, state, args, ckpt_dir, loader, dataset, logger, result_root)
    else:
        assert args.ckpt is not None, "--ckpt required unless --eval_all"
        result, epoch = eval_ckpt(
            bundle, state, args.ckpt, loader, dataset, logger, result_root,
            save_to_file=args.save_to_file,
        )
        logger.info("final result: %s", result)


if __name__ == "__main__":
    main()

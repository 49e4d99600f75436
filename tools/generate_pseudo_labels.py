"""Pseudo-label generation CLI — plain and adversarially-perturbed.

Covers the reference's three scripts (tools/generate_pseudo_labels.py,
generate_pseudo_labels_perturb.py, generate_pseudo_labels_perturb_k.py) with one
entry point: --perturb enables input-gradient extraction (jax.grad w.r.t. raw
points replaces the BN-freeze/voxel-grad machinery; per-point sign-gradients are
stored in the pseudo infos, subsuming both the point- and voxel-level variants).
"""

import argparse
import datetime
import pickle

import _init_path  # noqa: F401
import jax

from toda_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
from toda_tpu.datasets import build_dataloader
from toda_tpu.models import build_network
from toda_tpu.runtime import checkpoint as ckpt_lib
from toda_tpu.runtime.pseudo_label import generate_pseudo_labels
from toda_tpu.runtime.train_utils import create_train_state
from toda_tpu.utils import common_utils


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--score_thresh", "--pseudo_thresh", dest="score_thresh",
                        type=float, default=0.2)
    parser.add_argument("--perturb", action="store_true")
    parser.add_argument("--eps", type=float, default=1.0)
    parser.add_argument("--min_points", type=int, default=0,
                        help="drop pseudo boxes with fewer interior points "
                             "(reference filtering_min_points_box)")
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--workers", type=int, default=0,
                        help="loader prefetch depth (reference num_workers analog)")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)

    output_dir = cfg.ROOT_DIR / "output" / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = common_utils.create_logger(
        output_dir / f"log_pseudo_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    )

    data_cfg = cfg.get("UNLABEL_DATA_CONFIG", cfg.DATA_CONFIG)
    dataset, loader, _ = build_dataloader(
        data_cfg, cfg.CLASS_NAMES, batch_size=args.batch_size or 2,
        training=False, logger=logger, workers=args.workers,
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    example = next(iter(loader))
    state, _ = create_train_state(bundle, cfg.OPTIMIZATION, 1, example)
    state, _ = ckpt_lib.load_checkpoint(args.ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    infos = generate_pseudo_labels(
        bundle, variables, loader, dataset, cfg.CLASS_NAMES,
        score_thresh=args.score_thresh, with_perturb=args.perturb, eps=args.eps,
        min_points=args.min_points, logger=logger,
    )
    out_path = args.output or (output_dir / "pseudo_infos.pkl")
    with open(out_path, "wb") as f:
        pickle.dump(infos, f)
    logger.info("wrote %d pseudo infos to %s", len(infos), out_path)


if __name__ == "__main__":
    main()

"""Single-scene inference demo: run a checkpoint on one frame, save a BEV image.

Reference: tools/demo.py (112 LoC, mayavi/open3d scene rendering). Headless here:
writes a PNG via the pure-numpy BEV rasterizer (toda_tpu/utils/simplevis.py).
"""

import argparse

import _init_path  # noqa: F401
import numpy as np

from toda_tpu.config import cfg, cfg_from_yaml_file
from toda_tpu.datasets import build_dataloader
from toda_tpu.models import build_network
from toda_tpu.runtime import checkpoint as ckpt_lib
from toda_tpu.runtime.eval_utils import make_predict_step
from toda_tpu.runtime.train_utils import create_train_state
from toda_tpu.utils import common_utils
from toda_tpu.utils.simplevis import nuscene_vis


def save_png(path, img):
    try:
        from PIL import Image

        Image.fromarray(img).save(path)
    except ImportError:
        np.save(str(path) + ".npy", img)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--data_path", type=str, default=None,
                        help="raw point-cloud file or directory (reference "
                             "DemoDataset): bypasses the config's dataset infos")
    parser.add_argument("--ext", type=str, default=".bin", choices=[".bin", ".npy"],
                        help="raw file format: KITTI float32 Nx4 .bin or .npy")
    parser.add_argument("--out", type=str, default="demo_bev.png")
    parser.add_argument("--view", type=str, default="bev", choices=["bev", "3d", "both"],
                        help="bev: rasterized top-down PNG; 3d: matplotlib 3D scene "
                             "(the headless analog of the reference's open3d viewer)")
    args = parser.parse_args()
    cfg_from_yaml_file(args.cfg_file, cfg)
    logger = common_utils.create_logger()

    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False, logger=logger
    )
    bundle = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    if args.data_path:
        # reference tools/demo.py DemoDataset: run straight off raw scan files,
        # routed through the SAME encoder/processor chain as the real adapters
        from pathlib import Path

        p = Path(args.data_path)
        files = sorted(p.glob(f"*{args.ext}")) if p.is_dir() else [p]
        if not files:
            raise SystemExit(f"no {args.ext} files found under {p}")
        frame = args.frame if p.is_dir() else 0
        if not 0 <= frame < len(files):
            raise SystemExit(
                f"--frame {args.frame} out of range: {len(files)} file(s) under {p}"
            )
        f = files[frame]
        if f.suffix == ".bin":
            pts = np.fromfile(f, dtype=np.float32).reshape(-1, 4)
        else:
            pts = np.load(f)
        n_feat = len(dataset.point_feature_encoder.src_feature_list)
        if pts.shape[1] < n_feat:  # pad missing feature columns (e.g. timestamp)
            pts = np.concatenate(
                [pts, np.zeros((len(pts), n_feat - pts.shape[1]), np.float32)], axis=1
            )
        item = dataset.prepare_data({"points": pts[:, :n_feat], "frame_id": f.stem})
        logger.info("raw scan %s: %d points", f.name, len(pts))
        frame_desc = f.name
    else:
        item = dataset[args.frame]
        frame_desc = f"frame {args.frame}"
    batch = dataset.collate_batch([item])
    state, _ = create_train_state(bundle, cfg.OPTIMIZATION, 1, batch)
    if args.ckpt:
        state, _ = ckpt_lib.load_checkpoint(args.ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    import jax.numpy as jnp

    dets = make_predict_step(bundle)(
        variables,
        {"points": jnp.asarray(batch["points"]), "points_mask": jnp.asarray(batch["points_mask"])},
    )
    dets = {k: np.asarray(v)[0] for k, v in dets.items()}
    m = dets["pred_mask"].astype(bool)
    logger.info("%s: %d detections", frame_desc, m.sum())

    pts = batch["points"][0][batch["points_mask"][0]]
    if "gt_boxes" in batch:
        gt = batch["gt_boxes"][0]
        gt = gt[gt[:, 7] > 0][:, :7] if gt.shape[1] > 7 else gt
    else:
        gt = np.zeros((0, 7), np.float32)  # raw scans carry no annotations
    if args.view in ("bev", "both"):
        img = nuscene_vis(
            pts, boxes=gt, pred_boxes=dets["pred_boxes"][m][:, :7],
            pc_range=tuple(dataset.point_cloud_range),
        )
        save_png(args.out, img)
        logger.info("wrote %s", args.out)
    if args.view in ("3d", "both"):
        from toda_tpu.utils.simplevis import scene_vis_3d

        out3d = (args.out if args.view == "3d"
                 else args.out.rsplit(".", 1)[0] + "_3d.png")
        scene_vis_3d(pts, boxes=gt, pred_boxes=dets["pred_boxes"][m][:, :7],
                     out_path=out3d)
        logger.info("wrote %s", out3d)


if __name__ == "__main__":
    main()

"""Dataset info-pkl generation CLI — the analog of the reference's
`python -m pcdet.datasets.<x>.<x>_dataset create_<x>_infos` entry points
(ref kitti_dataset.py:425-470, nuscenes_dataset.py:500-560,
waymo_dataset.py:660-720), unified under one dispatcher.

All five datasets run devkit-free: kitti/waymo from their raw files,
nuscenes/lyft from the raw JSON tables, pandaset from the gzip-pickled
DataFrames + poses.json.

Examples:
  python tools/create_infos.py kitti    --data_path data/kitti
  python tools/create_infos.py nuscenes --data_path data/nuscenes --version v1.0-mini
  python tools/create_infos.py waymo    --data_path data/waymo/raw --save_path data/waymo
"""

import argparse
import pickle
from pathlib import Path

import _init_path  # noqa: F401

from toda_tpu.config import EDict
from toda_tpu.utils import common_utils


def _kitti(args, logger):
    from toda_tpu.datasets.dataset import DatasetTemplate
    from toda_tpu.datasets.kitti.kitti_dataset import KittiDataset

    save = Path(args.save_path or args.data_path)
    for split, fname in (("train", "kitti_infos_train.pkl"),
                         ("val", "kitti_infos_val.pkl")):
        cfg = EDict({
            "DATASET": "KittiDataset", "DATA_PATH": args.data_path,
            "DATA_SPLIT": {"train": split, "test": split},
            "INFO_PATH": {"train": [], "test": []},
            "POINT_CLOUD_RANGE": [0, -40.0, -3.0, 70.4, 40.0, 1.0],
            "POINT_FEATURE_ENCODING": {
                "encoding_type": "absolute_coordinates_encoding",
                "used_feature_list": ["x", "y", "z", "intensity"],
                "src_feature_list": ["x", "y", "z", "intensity"],
            },
            "DATA_PROCESSOR": [], "DATA_AUGMENTOR": {"AUG_CONFIG_LIST": []},
        })
        ds = KittiDataset.__new__(KittiDataset)
        DatasetTemplate.__init__(ds, dataset_cfg=cfg, class_names=None,
                                 training=split == "train", logger=logger)
        ds.infos = []
        try:
            infos = ds.get_infos()
        except FileNotFoundError as e:
            logger.warning("split %s skipped (%s)", split, e)
            continue
        with open(save / fname, "wb") as f:
            pickle.dump(infos, f)
        logger.info("%s: %d infos -> %s", split, len(infos), save / fname)
        if split == "train" and args.with_gt_db:
            ds.infos = infos
            db = ds.create_groundtruth_database(
                used_classes=args.classes.split(","),
                out_path=save / "kitti_dbinfos_train.pkl")
            logger.info("gt database: %d classes", len(db))


def _nuscenes(args, logger):
    from toda_tpu.datasets.dataset import DatasetTemplate
    from toda_tpu.datasets.nuscenes.nuscenes_dataset import NuScenesDataset
    from toda_tpu.datasets.nuscenes.nuscenes_utils import create_nuscenes_infos

    save = Path(args.save_path or args.data_path)
    train, val = create_nuscenes_infos(
        args.version or "v1.0-mini", args.data_path, save_path=save,
        max_sweeps=args.max_sweeps, logger=logger)
    logger.info("train %d / val %d infos", len(train), len(val))
    if args.with_gt_db:
        classes = args.classes.split(",")
        ds = NuScenesDataset.__new__(NuScenesDataset)
        DatasetTemplate.__init__(
            ds, dataset_cfg=EDict({
                "POINT_CLOUD_RANGE": [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0],
                "POINT_FEATURE_ENCODING": {
                    "encoding_type": "absolute_coordinates_encoding",
                    "used_feature_list": ["x", "y", "z", "intensity", "timestamp"],
                    "src_feature_list": ["x", "y", "z", "intensity", "timestamp"],
                },
                "DATA_PROCESSOR": [], "DATA_AUGMENTOR": {"AUG_CONFIG_LIST": []},
            }), class_names=classes, training=True,
            root_path=args.data_path, logger=logger)
        ds.infos, ds.max_sweeps, ds.shift_coor = train, args.max_sweeps, None
        tag = f"{args.max_sweeps}sweeps"
        db = ds.create_groundtruth_database(
            used_classes=classes, out_path=save / f"nuscenes_dbinfos_{tag}.pkl")
        logger.info("gt database: %s", {k: len(v) for k, v in db.items()})
        for pct in args.sub_db_percents:
            ds.create_sub_groundtruth_database(
                pct / 100.0,
                out_path=save / f"nuscenes_dbinfos_{tag}_{pct:g}pct.pkl")
            logger.info("sub gt database: %g%%", pct)


def _waymo(args, logger):
    from toda_tpu.datasets.dataset import DatasetTemplate
    from toda_tpu.datasets.waymo.waymo_dataset import (
        WaymoDataset,
        create_waymo_infos,
    )

    save = Path(args.save_path or args.data_path)
    # npy tree under the layout WaymoDataset loads by default:
    # <root>/waymo_processed_data/<sequence>/NNNN.npy
    infos = create_waymo_infos(
        args.data_path, save / "waymo_processed_data",
        sampled_interval=args.sampled_interval, logger=logger)
    with open(save / "waymo_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    logger.info("%d infos -> %s", len(infos), save / "waymo_infos_train.pkl")
    if args.with_gt_db:
        classes = args.classes.split(",")
        ds = WaymoDataset.__new__(WaymoDataset)
        DatasetTemplate.__init__(
            ds, dataset_cfg=EDict({
                "POINT_CLOUD_RANGE": [-75.2, -75.2, -2.0, 75.2, 75.2, 4.0],
                "POINT_FEATURE_ENCODING": {
                    "encoding_type": "absolute_coordinates_encoding",
                    "used_feature_list": ["x", "y", "z", "intensity", "elongation"],
                    "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
                },
                "DATA_PROCESSOR": [], "DATA_AUGMENTOR": {"AUG_CONFIG_LIST": []},
            }), class_names=classes, training=True, root_path=save,
            logger=logger)
        ds.infos = infos
        ds.data_path = save / "waymo_processed_data"
        db = ds.create_groundtruth_database(
            used_classes=classes, out_path=save / "waymo_dbinfos_train.pkl")
        logger.info("gt database: %s", {k: len(v) for k, v in db.items()})


def _lyft(args, logger):
    from toda_tpu.datasets.lyft.lyft_dataset import create_lyft_infos

    train, val = create_lyft_infos(
        args.data_path, version=args.version or "trainval",
        save_path=args.save_path or args.data_path,
        max_sweeps=args.max_sweeps, logger=logger)
    logger.info("train %d / val %d infos", len(train), len(val))


def _pandaset(args, logger):
    from toda_tpu.datasets.pandaset.pandaset_dataset import (
        create_pandaset_infos,
    )

    train, val = create_pandaset_infos(
        EDict({}), None, args.data_path, args.save_path or args.data_path,
        logger=logger)
    logger.info("train %d / val %d infos", len(train), len(val))


def _consolidate(args, logger):
    """Pack a per-object-file GT database into one .npy + offset infos for the
    USE_SHARED_MEMORY sampler path (optionally staged into /dev/shm at train
    time via SHM_CACHE)."""
    from toda_tpu.datasets.augmentor.database_sampler import consolidate_gt_database

    if not args.dbinfos:
        raise SystemExit("--dbinfos is required for `consolidate`")
    consolidate_gt_database(
        args.dbinfos, args.data_path,
        num_point_features=args.num_point_features, logger=logger,
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset",
                        choices=["kitti", "nuscenes", "waymo", "lyft", "pandaset",
                                 "consolidate"])
    parser.add_argument("--data_path", required=True,
                        help="raw dataset root (waymo: dir of .tfrecord files)")
    parser.add_argument("--save_path", default=None,
                        help="output dir for info pkls (default: data_path)")
    parser.add_argument("--version", default=None,
                        help="nuscenes/lyft table version (defaults: "
                             "nuscenes v1.0-mini, lyft trainval)")
    parser.add_argument("--max_sweeps", type=int, default=10)
    parser.add_argument("--sampled_interval", type=int, default=1,
                        help="waymo: keep every Nth frame")
    parser.add_argument("--with_gt_db", action="store_true",
                        help="kitti: also build the GT copy-paste database")
    parser.add_argument("--classes", default="Car,Pedestrian,Cyclist",
                        help="classes for the GT database (comma-separated; "
                             "nuScenes uses its lowercase names, e.g. "
                             "car,pedestrian,truck)")
    parser.add_argument("--sub_db_percents", type=float, nargs="*", default=[],
                        help="nuscenes: also build SSDA labeled-percentage "
                             "sub GT databases (e.g. 1 5 10)")
    parser.add_argument("--dbinfos", default=None,
                        help="consolidate: path to the dbinfos pkl to pack")
    parser.add_argument("--num_point_features", type=int, default=4)
    args = parser.parse_args()
    logger = common_utils.create_logger()
    {"kitti": _kitti, "nuscenes": _nuscenes, "waymo": _waymo,
     "lyft": _lyft, "pandaset": _pandaset,
     "consolidate": _consolidate}[args.dataset](args, logger)


if __name__ == "__main__":
    main()

"""Aux subsystem tests: simplevis raster, waymo adapter on fabricated npys."""

import pickle

import numpy as np

from toda_tpu.utils.simplevis import nuscene_vis


def test_simplevis_raster(rng):
    pts = rng.uniform(-40, 40, (3000, 4)).astype(np.float32)
    boxes = np.array([[0, 0, 0, 4, 2, 1.6, 0.3]], np.float32)
    img = nuscene_vis(pts, boxes=boxes, pred_boxes=boxes + 0.5,
                      pc_range=(-50, -50, -5, 50, 50, 3))
    assert img.shape == (1000, 1000, 3)
    assert img.dtype == np.uint8
    assert img.max() > 0
    # green gt outline and red pred outline present
    assert (img[..., 1] == 255).any()
    assert (img[..., 0] == 255).any()


def test_waymo_adapter(tmp_path, rng):
    import yaml
    from toda_tpu.config import EDict
    from toda_tpu.datasets import build_dataloader

    seq = "segment-000"
    (tmp_path / "waymo_processed_data" / seq).mkdir(parents=True)
    infos = []
    for i in range(2):
        pts = rng.uniform(-50, 50, (3000, 6)).astype(np.float32)
        np.save(tmp_path / "waymo_processed_data" / seq / f"{i:04d}.npy", pts)
        boxes = np.zeros((2, 7), np.float32)
        boxes[:, :2] = rng.uniform(-30, 30, (2, 2))
        boxes[:, 3:6] = [4.8, 2.1, 1.8]
        infos.append(
            {
                "point_cloud": {"lidar_sequence": seq, "sample_idx": i},
                "annos": {
                    "name": np.asarray(["Vehicle", "Pedestrian"]),
                    "gt_boxes_lidar": boxes,
                    "num_points_in_gt": np.asarray([50, 50]),
                },
            }
        )
    with open(tmp_path / "waymo_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)

    with open("tools/cfgs/dataset_configs/synthetic_dataset.yaml") as f:
        cfg = EDict(yaml.safe_load(f))
    cfg.DATASET = "WaymoDataset"
    cfg.DATA_PATH = str(tmp_path)
    cfg.INFO_PATH = {"train": ["waymo_infos_train.pkl"], "test": ["waymo_infos_train.pkl"]}
    cfg.POINT_CLOUD_RANGE = [-75.0, -75.0, -2.0, 75.0, 75.0, 4.0]
    cfg.POINT_FEATURE_ENCODING = {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity", "elongation"],
        "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
    }
    cfg.DATA_PROCESSOR[2].NUM_POINTS = {"train": 4096, "test": 4096}

    ds, loader, _ = build_dataloader(cfg, ["Vehicle", "Pedestrian"], batch_size=2,
                                     training=True)
    assert len(ds) == 2
    pts, boxes, names = ds.get_raw_scene(0)
    assert pts.shape[1] == 5
    batch = next(iter(loader))
    assert batch["points"].shape == (2, 4096, 5)


def test_all_configs_parse():
    """Every YAML in the corpus parses through the inheritance chain and carries
    the sections its kind requires."""
    from pathlib import Path

    from toda_tpu.config import EDict, cfg_from_yaml_file

    root = Path("tools/cfgs")
    count = 0
    for path in sorted(root.rglob("*.yaml")):
        if path.parent.name == "dataset_configs":
            continue
        cfg = cfg_from_yaml_file(str(path), EDict())
        if path.name.startswith("_"):
            continue  # dataset-fragment include (e.g. ssda_expt domain defs)
        assert "DATA_CONFIG" in cfg, path
        if path.parent.name != "pseudo_labels":
            assert "MODEL" in cfg and "NAME" in cfg.MODEL, path
        if path.parent.name.startswith("stage1"):
            assert cfg.DATA_CONFIG.DATASET == "CutMixDataset", path
            assert "MIX_TYPE" in cfg.DATA_CONFIG, path
        if path.parent.name == "stage2_advmix":
            assert cfg.DATA_CONFIG.DATASET == "MixUpDataset", path
        count += 1
    assert count >= 40, count


def test_waymo_aph_native():
    """APH == AP for aligned headings; pi-flipped headings zero the heading
    weight; LEVEL_1 excludes low-point gts."""
    import numpy as np

    from toda_tpu.utils.waymo_eval_native import waymo_eval

    rng = np.random.RandomState(0)
    gt, det_good, det_flip = [], [], []
    for _ in range(6):
        n = 8
        boxes = np.zeros((n, 7), np.float32)
        boxes[:, 0] = np.arange(n) * 12.0 - 40.0  # grid layout: no box overlap
        boxes[:, 1] = rng.uniform(-3, 3, n)
        boxes[:, 3:6] = [4.5, 2.0, 1.7]
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
        npts = np.full(n, 50); npts[-2:] = 2  # two LEVEL_2-only gts
        gt.append({"boxes_lidar": boxes, "name": np.asarray(["vehicle"] * n),
                   "difficulty": np.ones(n), "num_points_in_gt": npts})
        scores = np.linspace(0.9, 0.5, n).astype(np.float32)
        det_good.append({"boxes_lidar": boxes.copy(),
                         "name": np.asarray(["vehicle"] * n), "score": scores})
        flipped = boxes.copy(); flipped[:, 6] += np.pi
        det_flip.append({"boxes_lidar": flipped,
                         "name": np.asarray(["vehicle"] * n), "score": scores})

    _, good = waymo_eval(det_good, gt, ["vehicle"])
    assert good["vehicle_LEVEL_2/AP"] > 0.99
    assert abs(good["vehicle_LEVEL_2/APH"] - good["vehicle_LEVEL_2/AP"]) < 1e-6
    assert good["vehicle_LEVEL_1/AP"] > 0.99  # low-point gts excluded, still perfect

    _, flip = waymo_eval(det_flip, gt, ["vehicle"])
    assert flip["vehicle_LEVEL_2/AP"] > 0.99      # IoU unaffected by pi flip
    assert flip["vehicle_LEVEL_2/APH"] < 0.01     # heading weight zero


def test_scalar_writer_jsonl_and_default(tmp_path):
    """Run-dir observability (reference train_utils.py:82-86 tensorboardX
    surface): create_scalar_writer must yield an add_scalar/flush/close object
    that persists scalars under the log dir — TB event files when tensorboard
    is importable, scalars.jsonl otherwise."""
    import json

    from toda_tpu.utils.scalar_writer import create_scalar_writer

    w = create_scalar_writer(tmp_path / "jl", prefer_tensorboard=False)
    w.add_scalar("train/loss", 1.5, 0)
    w.add_scalar("train/loss", 1.25, 1)
    w.flush()
    rows = [json.loads(l) for l in (tmp_path / "jl" / "scalars.jsonl").read_text().splitlines()]
    assert [r["value"] for r in rows] == [1.5, 1.25]
    assert rows[1]["step"] == 1 and rows[0]["tag"] == "train/loss"
    w.close()

    d = create_scalar_writer(tmp_path / "tb")  # whichever backend is available
    d.add_scalar("train/lr", 0.01, 0)
    d.flush()
    assert any((tmp_path / "tb").iterdir())
    d.close()


def test_cli_launcher_env_mapping(monkeypatch):
    """--launcher pytorch maps torchrun env (MASTER_ADDR/PORT, RANK/WORLD_SIZE)
    onto the jax.distributed coordinator inputs; slurm sets the slurm path."""
    import argparse
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from cli_args import add_common_train_args, resolve_launcher

    def parse(argv):
        p = argparse.ArgumentParser()
        add_common_train_args(p)
        return p.parse_args(argv)

    monkeypatch.setenv("MASTER_ADDR", "10.0.0.7")
    monkeypatch.setenv("MASTER_PORT", "29500")
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "2")
    args = resolve_launcher(parse(["--launcher", "pytorch"]))
    assert args.coordinator_address == "10.0.0.7:29500"
    assert args.num_processes == 4 and args.process_id == 2

    # explicit flags win over env
    args = resolve_launcher(parse(
        ["--launcher", "pytorch", "--coordinator_address", "h:1",
         "--num_processes", "2", "--process_id", "1"]))
    assert args.coordinator_address == "h:1"
    assert args.num_processes == 2 and args.process_id == 1

    # --tcp_port overrides MASTER_PORT (reference flag precedence)
    args = resolve_launcher(parse(["--launcher", "pytorch", "--tcp_port", "18888"]))
    assert args.coordinator_address == "10.0.0.7:18888"

    args = resolve_launcher(parse(["--launcher", "slurm"]))
    assert args.slurm

"""Devkit-free Waymo TFRecord extraction tests (VERDICT r2 missing #5).

Fabricates a valid .tfrecord sequence (TFRecord framing with real masked
crc32c, protobuf wire encoding per the public waymo dataset.proto/label.proto
field numbers, zlib-compressed MatrixFloat range images) and pins
create_waymo_infos end-to-end: npy artifact layout, info schema, label
conversion, and the range-image -> cartesian math.
"""

import pickle
import zlib

import numpy as np
import pytest

from toda_tpu.datasets.waymo import tfrecord_io as tio
from toda_tpu.datasets.waymo.waymo_dataset import create_waymo_infos


def enc_matrix_float(arr):
    arr = np.asarray(arr, np.float32)
    shape = tio.enc_field_bytes(2, tio.enc_packed_varints(1, arr.shape))
    return tio.enc_packed_floats(1, arr.reshape(-1)) + shape


def enc_range_image(ri, pose=None):
    msg = tio.enc_field_bytes(1, zlib.compress(enc_matrix_float(ri)))
    if pose is not None:
        msg += tio.enc_field_bytes(3, zlib.compress(enc_matrix_float(pose)))
    return msg


def enc_transform(mat):
    return tio.enc_packed_doubles(1, np.asarray(mat, np.float64).reshape(-1))


def enc_laser_calibration(name, extrinsic, inc_min, inc_max, beams=()):
    msg = tio.enc_field_varint(1, name)
    if len(beams):
        msg += tio.enc_packed_doubles(2, beams)
    msg += tio.enc_field_double(3, inc_min) + tio.enc_field_double(4, inc_max)
    msg += tio.enc_field_bytes(5, enc_transform(extrinsic))
    return msg


def enc_label(cls_type, box7, num_pts=10, obj_id="obj-0"):
    x, y, z, l, w, h, heading = box7  # noqa: E741
    box = (
        tio.enc_field_double(1, x) + tio.enc_field_double(2, y)
        + tio.enc_field_double(3, z) + tio.enc_field_double(4, w)
        + tio.enc_field_double(5, l) + tio.enc_field_double(6, h)
        + tio.enc_field_double(7, heading)
    )
    return (
        tio.enc_field_bytes(1, box)
        + tio.enc_field_varint(3, cls_type)
        + tio.enc_field_bytes(4, obj_id.encode())
        + tio.enc_field_varint(5, 1)
        + tio.enc_field_varint(6, 2)
        + tio.enc_field_varint(7, num_pts)
    )


def enc_frame(range_image, labels, extrinsic=np.eye(4), inc=(-0.3, 0.3),
              pose_ri=None, ts=123456, ctx="fake_context"):
    context = (
        tio.enc_field_bytes(1, ctx.encode())
        + tio.enc_field_bytes(2, (  # one camera calibration
            tio.enc_field_varint(1, 1) + tio.enc_field_varint(4, 1920)
            + tio.enc_field_varint(5, 1280)
        ))
        + tio.enc_field_bytes(3, enc_laser_calibration(
            tio.LASER_TOP, extrinsic, inc[0], inc[1]))
    )
    laser = tio.enc_field_varint(1, tio.LASER_TOP) + tio.enc_field_bytes(
        2, enc_range_image(range_image, pose_ri)
    )
    frame = (
        tio.enc_field_bytes(1, context)
        + tio.enc_field_varint(2, ts)
        + tio.enc_field_bytes(3, enc_transform(np.eye(4)))
        + tio.enc_field_bytes(5, laser)
    )
    for lab in labels:
        frame += tio.enc_field_bytes(6, lab)
    return frame


def make_range_image(h=4, w=8):
    """Channels: range, intensity, elongation, NLZ. Three live pixels."""
    ri = np.zeros((h, w, 4), np.float32)
    ri[0, 3, 0] = 10.0  # top beam
    ri[0, 3, 1] = 0.5
    ri[0, 3, 2] = 0.25
    ri[2, 6, 0] = 5.0
    ri[3, 0, 0] = 2.0
    ri[3, 0, 3] = 1.0  # in a no-label zone
    return ri


@pytest.fixture()
def fake_sequence(tmp_path):
    ri = make_range_image()
    labels = [
        enc_label(1, [5.0, 1.0, 0.5, 4.5, 2.0, 1.6, 0.3], num_pts=25),
        enc_label(0, [0, 0, 0, 1, 1, 1, 0]),  # unknown -> dropped
        enc_label(2, [-3.0, 2.0, 0.0, 0.8, 0.7, 1.7, -1.1], num_pts=7),
    ]
    frames = [enc_frame(ri, labels, ts=1000 + i) for i in range(3)]
    raw = tmp_path / "raw"
    raw.mkdir()
    tio.write_tfrecords(raw / "segment-0001.tfrecord", frames)
    return tmp_path, raw, ri


def test_tfrecord_framing_crc_roundtrip(tmp_path):
    recs = [b"hello", b"x" * 1000, b""]
    tio.write_tfrecords(tmp_path / "a.tfrecord", recs)
    got = list(tio.read_tfrecords(tmp_path / "a.tfrecord", check_crc=True))
    assert got == recs


def test_range_image_math_identity_extrinsic():
    """range preserved, z = r*sin(row inclination) with rows reversed."""
    ri = make_range_image()
    pts, nlz = tio.range_image_to_points(
        ri, np.eye(4), inclination_range=(-0.3, 0.3)
    )
    assert pts.shape == (3, 5)
    r = np.linalg.norm(pts[:, :3], axis=1)
    np.testing.assert_allclose(r, [10.0, 5.0, 2.0], rtol=1e-5)
    # uniform fill: incl_i = (0.5 + i)/H * 0.6 - 0.3, rows REVERSED (row 0 =
    # highest beam)
    h = 4
    incl = ((0.5 + np.arange(h)) / h * 0.6 - 0.3)[::-1]
    np.testing.assert_allclose(
        pts[:, 2], [10 * np.sin(incl[0]), 5 * np.sin(incl[2]), 2 * np.sin(incl[3])],
        rtol=1e-5,
    )
    # azimuth of column j: ((W - j - 0.5)/W * 2 - 1) * pi
    az = ((8 - 3 - 0.5) / 8 * 2 - 1) * np.pi
    np.testing.assert_allclose(
        pts[0, :2], [10 * np.cos(incl[0]) * np.cos(az), 10 * np.cos(incl[0]) * np.sin(az)],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(pts[0, 3:], [0.5, 0.25], rtol=1e-6)
    np.testing.assert_allclose(nlz, [0.0, 0.0, 1.0])


def test_range_image_pixel_pose_identity_is_noop():
    """Identity per-pixel pose + identity frame pose must not move points."""
    ri = make_range_image()
    base, _ = tio.range_image_to_points(ri, np.eye(4), inclination_range=(-0.3, 0.3))
    pose = np.zeros(ri.shape[:2] + (6,), np.float32)  # rpy=0, xyz=0
    via, _ = tio.range_image_to_points(
        ri, np.eye(4), inclination_range=(-0.3, 0.3),
        pixel_pose=pose, frame_pose=np.eye(4),
    )
    np.testing.assert_allclose(base, via, atol=1e-5)


def test_range_image_pixel_pose_translation():
    """A pure-translation pixel pose shifts points by (t - frame translation)."""
    ri = make_range_image()
    base, _ = tio.range_image_to_points(ri, np.eye(4), inclination_range=(-0.3, 0.3))
    pose = np.zeros(ri.shape[:2] + (6,), np.float32)
    pose[..., 3] = 2.0  # +2 m x in global frame
    via, _ = tio.range_image_to_points(
        ri, np.eye(4), inclination_range=(-0.3, 0.3),
        pixel_pose=pose, frame_pose=np.eye(4),
    )
    np.testing.assert_allclose(via[:, 0], base[:, 0] + 2.0, atol=1e-5)
    np.testing.assert_allclose(via[:, 1:3], base[:, 1:3], atol=1e-5)


def test_create_waymo_infos_end_to_end(fake_sequence):
    tmp_path, raw, ri = fake_sequence
    save = tmp_path / "waymo_processed_data"
    infos = create_waymo_infos(raw, save, sampled_interval=1)
    assert len(infos) == 3
    info = infos[0]
    assert info["point_cloud"]["lidar_sequence"] == "segment-0001"
    assert info["frame_id"] == "segment-0001_000"
    assert info["metadata"]["context_name"] == "fake_context"
    assert info["image"]["image_shape_0"] == (1280, 1920)
    np.testing.assert_allclose(info["pose"], np.eye(4))

    annos = info["annos"]
    assert list(annos["name"]) == ["Vehicle", "Pedestrian"]  # unknown dropped
    np.testing.assert_allclose(
        annos["gt_boxes_lidar"][0], [5.0, 1.0, 0.5, 4.5, 2.0, 1.6, 0.3], rtol=1e-6
    )
    assert list(annos["num_points_in_gt"]) == [25, 7]
    assert list(annos["difficulty"]) == [1, 1]

    pts = np.load(save / "segment-0001" / "0000.npy")
    assert pts.shape == (3, 6)  # x y z intensity elongation nlz
    np.testing.assert_allclose(
        np.linalg.norm(pts[:, :3], axis=1), [10.0, 5.0, 2.0], rtol=1e-5
    )
    assert info["num_points_of_each_lidar"] == [3]

    # idempotent re-run loads the cached pkl
    infos2 = create_waymo_infos(raw, save, sampled_interval=1)
    assert len(infos2) == 3


def test_waymo_dataset_loads_extracted_artifacts(fake_sequence):
    """The adapter consumes the extraction output directly."""
    import yaml

    from toda_tpu.config import EDict
    from toda_tpu.datasets import build_dataloader

    tmp_path, raw, ri = fake_sequence
    save = tmp_path / "waymo_processed_data"
    infos = create_waymo_infos(raw, save, sampled_interval=1)
    with open(tmp_path / "waymo_infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)

    with open("tools/cfgs/dataset_configs/synthetic_dataset.yaml") as fy:
        cfg = EDict(yaml.safe_load(fy))
    cfg.DATASET = "WaymoDataset"
    cfg.DATA_PATH = str(tmp_path)
    cfg.PROCESSED_DATA_TAG = "waymo_processed_data"
    cfg.INFO_PATH = {"train": ["waymo_infos_val.pkl"], "test": ["waymo_infos_val.pkl"]}
    cfg.POINT_CLOUD_RANGE = [-40.0, -40.0, -3.0, 40.0, 40.0, 3.0]
    cfg.POINT_FEATURE_ENCODING = {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity"],
        "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
    }
    cfg.DATA_PROCESSOR[2].NUM_POINTS = {"train": 512, "test": 512}
    ds, loader, _ = build_dataloader(
        cfg, ["Vehicle", "Pedestrian"], batch_size=2, training=False
    )
    assert len(ds) == 3
    pts, boxes, names = ds.get_raw_scene(0)
    assert pts.shape[1] == 5
    assert boxes.shape == (2, 7)
    batch = next(iter(loader))
    assert batch["points"].shape[0] == 2

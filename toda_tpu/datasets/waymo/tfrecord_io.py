"""Devkit-free Waymo TFRecord extraction: framing, protobuf wire codec,
Frame schema views, and range-image -> point-cloud conversion.

The reference extraction (pcdet/datasets/waymo/waymo_utils.py:1-246) needs
tensorflow + the waymo_open_dataset pip package; neither is assumed here.
Everything below is re-derived from the PUBLIC formats:

  * TFRecord framing: <u64le length> <u32le masked-crc32c(length)> <payload>
    <u32le masked-crc32c(payload)> (the TensorFlow record format);
  * protobuf wire format: varint tags (field_num << 3 | wire_type), wire
    types 0 (varint) / 1 (64-bit) / 2 (length-delimited) / 5 (32-bit);
  * the waymo-open-dataset `dataset.proto` / `label.proto` field numbers
    (documented at each schema constant below);
  * range_image_utils.extract_point_cloud_from_range_image math: spherical
    (azimuth from reversed column ratio + extrinsic yaw correction,
    inclination from the reversed beam list or the uniform min/max fill) ->
    cartesian in sensor frame -> extrinsic to vehicle frame -> optional
    per-pixel pose (rolling-shutter) correction for the TOP lidar.

The writer half exists so tests can fabricate valid .tfrecord fixtures.
"""

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# crc32c (software, Castagnoli polynomial) + the TFRecord masking
# ---------------------------------------------------------------------------

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    return _CRC_TABLE


def crc32c(data):
    tbl = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc(data):
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# TFRecord framing
# ---------------------------------------------------------------------------


def read_tfrecords(path, check_crc=False):
    """Yields record payloads from a TFRecord file."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack("<Q", header[:8])
            if check_crc:
                (crc,) = struct.unpack("<I", header[8:12])
                assert crc == masked_crc(header[:8]), "length crc mismatch"
            payload = f.read(length)
            tail = f.read(4)
            if check_crc:
                (crc,) = struct.unpack("<I", tail)
                assert crc == masked_crc(payload), "payload crc mismatch"
            yield payload


def write_tfrecords(path, records):
    with open(path, "wb") as f:
        for payload in records:
            header = struct.pack("<Q", len(payload))
            f.write(header)
            f.write(struct.pack("<I", masked_crc(header)))
            f.write(payload)
            f.write(struct.pack("<I", masked_crc(payload)))


# ---------------------------------------------------------------------------
# protobuf wire codec (decode + encode-for-tests)
# ---------------------------------------------------------------------------


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def parse_fields(buf):
    """buf -> {field_num: [value, ...]} with raw wire values (int for varint,
    bytes for length-delimited, 8/4-byte bytes for fixed)."""
    fields = {}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = buf[pos : pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos : pos + 4]
            pos += 4
        else:  # groups (3/4) do not occur in the waymo protos
            raise ValueError(f"unsupported wire type {wt}")
        fields.setdefault(field, []).append(val)
    return fields


def first(fields, num, default=None):
    v = fields.get(num)
    return v[0] if v else default


def as_double(v, default=0.0):
    return struct.unpack("<d", v)[0] if v is not None else default


def as_float(v, default=0.0):
    return struct.unpack("<f", v)[0] if v is not None else default


def packed_doubles(v):
    return np.frombuffer(v, dtype="<f8") if v else np.zeros(0)


def packed_floats(v):
    return np.frombuffer(v, dtype="<f4") if v else np.zeros(0, np.float32)


def packed_varints(v):
    out = []
    pos = 0
    while pos < len(v):
        x, pos = _read_varint(v, pos)
        out.append(x)
    return out


# encoder (tests / fixtures)


def enc_varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def enc_tag(field, wt):
    return enc_varint((field << 3) | wt)


def enc_field_varint(field, n):
    return enc_tag(field, 0) + enc_varint(n)


def enc_field_double(field, x):
    return enc_tag(field, 1) + struct.pack("<d", x)


def enc_field_bytes(field, payload):
    return enc_tag(field, 2) + enc_varint(len(payload)) + payload


def enc_packed_doubles(field, xs):
    return enc_field_bytes(field, np.asarray(xs, "<f8").tobytes())


def enc_packed_floats(field, xs):
    return enc_field_bytes(field, np.asarray(xs, "<f4").tobytes())


def enc_packed_varints(field, xs):
    return enc_field_bytes(field, b"".join(enc_varint(int(x)) for x in xs))


# ---------------------------------------------------------------------------
# waymo-open-dataset schema views (field numbers from the public protos)
# ---------------------------------------------------------------------------
#
# dataset.proto: Frame{context=1, timestamp_micros=2, pose=3, images=4,
#   lasers=5, laser_labels=6}; Transform{transform=1 packed double};
#   Context{name=1, camera_calibrations=2, laser_calibrations=3};
#   CameraCalibration{name=1, intrinsic=2, extrinsic=3, width=4, height=5};
#   LaserCalibration{name=1, beam_inclinations=2, beam_inclination_min=3,
#   beam_inclination_max=4, extrinsic=5};
#   Laser{name=1, ri_return1=2, ri_return2=3};
#   RangeImage{range_image_compressed=1, camera_projection_compressed=2,
#   range_image_pose_compressed=3} (zlib-compressed MatrixFloat/MatrixInt32);
#   MatrixFloat{data=1 packed float, shape=2}; MatrixShape{dims=1 packed int32}.
# label.proto: Label{box=1, metadata=2, type=3, id=4,
#   detection_difficulty_level=5, tracking_difficulty_level=6,
#   num_lidar_points_in_box=7};
#   Label.Box{center_x=1, center_y=2, center_z=3, width=4, length=5,
#   height=6, heading=7}.

LASER_TOP = 1
WAYMO_CLASSES = ["unknown", "Vehicle", "Pedestrian", "Sign", "Cyclist"]


def parse_matrix_float(buf):
    f = parse_fields(buf)
    data = packed_floats(first(f, 1))
    shape_f = parse_fields(first(f, 2, b""))
    dims = packed_varints(first(shape_f, 1, b""))
    return data.reshape(dims) if dims else data


def parse_transform(buf):
    f = parse_fields(buf)
    t = packed_doubles(first(f, 1))
    return t.reshape(4, 4) if t.size == 16 else np.eye(4)


def parse_range_image(buf):
    """RangeImage message -> dict of decompressed matrices."""
    f = parse_fields(buf)
    out = {}
    ri = first(f, 1)
    if ri:
        out["range_image"] = parse_matrix_float(zlib.decompress(ri))
    pose = first(f, 3)
    if pose:
        out["pose"] = parse_matrix_float(zlib.decompress(pose))
    return out


def parse_laser_calibration(buf):
    f = parse_fields(buf)
    return {
        "name": first(f, 1, 0),
        "beam_inclinations": packed_doubles(first(f, 2)),
        "beam_inclination_min": as_double(first(f, 3)),
        "beam_inclination_max": as_double(first(f, 4)),
        "extrinsic": parse_transform(first(f, 5, b"")),
    }


def parse_label(buf):
    f = parse_fields(buf)
    box_f = parse_fields(first(f, 1, b""))
    box = {
        "center_x": as_double(first(box_f, 1)),
        "center_y": as_double(first(box_f, 2)),
        "center_z": as_double(first(box_f, 3)),
        "width": as_double(first(box_f, 4)),
        "length": as_double(first(box_f, 5)),
        "height": as_double(first(box_f, 6)),
        "heading": as_double(first(box_f, 7)),
    }
    return {
        "box": box,
        "type": first(f, 3, 0),
        "id": (first(f, 4, b"") or b"").decode("utf-8", "replace"),
        "detection_difficulty_level": first(f, 5, 0),
        "tracking_difficulty_level": first(f, 6, 0),
        "num_lidar_points_in_box": first(f, 7, 0),
    }


def parse_frame(buf):
    """Frame message -> dict with context/pose/lasers/labels."""
    f = parse_fields(buf)
    ctx_f = parse_fields(first(f, 1, b""))
    cameras = []
    for cam in ctx_f.get(2, []):
        cf = parse_fields(cam)
        cameras.append(
            {"name": first(cf, 1, 0), "width": first(cf, 4, 0), "height": first(cf, 5, 0)}
        )
    lasers = []
    for l in f.get(5, []):
        lf = parse_fields(l)
        lasers.append(
            {
                "name": first(lf, 1, 0),
                "ri_return1": parse_range_image(first(lf, 2, b"")),
                "ri_return2": parse_range_image(first(lf, 3, b"")),
            }
        )
    return {
        "context_name": (first(ctx_f, 1, b"") or b"").decode("utf-8", "replace"),
        "camera_calibrations": cameras,
        "laser_calibrations": [
            parse_laser_calibration(c) for c in ctx_f.get(3, [])
        ],
        "timestamp_micros": first(f, 2, 0),
        "pose": parse_transform(first(f, 3, b"")),
        "lasers": lasers,
        "laser_labels": [parse_label(x) for x in f.get(6, [])],
    }


# ---------------------------------------------------------------------------
# range image -> point cloud (range_image_utils math, numpy)
# ---------------------------------------------------------------------------


def _rotation_from_euler(roll, pitch, yaw):
    """R_z(yaw) @ R_y(pitch) @ R_x(roll), elementwise over arrays."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    r = np.empty(roll.shape + (3, 3))
    r[..., 0, 0] = cy * cp
    r[..., 0, 1] = cy * sp * sr - sy * cr
    r[..., 0, 2] = cy * sp * cr + sy * sr
    r[..., 1, 0] = sy * cp
    r[..., 1, 1] = sy * sp * sr + cy * cr
    r[..., 1, 2] = sy * sp * cr - cy * sr
    r[..., 2, 0] = -sp
    r[..., 2, 1] = cp * sr
    r[..., 2, 2] = cp * cr
    return r


def range_image_to_points(range_image, extrinsic, beam_inclinations=None,
                          inclination_range=None, pixel_pose=None, frame_pose=None):
    """(H, W, >=4) range image -> (N, 5) [x y z intensity elongation] in the
    vehicle frame + (N,) NLZ flags, for pixels with range > 0.

    Math follows range_image_utils.extract_point_cloud_from_range_image:
    azimuth_j = ((W - j - 0.5)/W * 2 - 1) * pi - atan2(extrinsic[1,0],
    extrinsic[0,0]); inclination per row from the REVERSED beam list (row 0 is
    the highest beam) or the uniform (0.5+i)/H fill of [min, max]; spherical ->
    sensor xyz -> extrinsic -> optional per-pixel pose (TOP lidar rolling
    shutter): vehicle -> global via pixel pose, back via inv(frame_pose).
    """
    h, w = range_image.shape[:2]
    dist = range_image[..., 0]
    mask = dist > 0

    if beam_inclinations is not None and len(beam_inclinations):
        incl = np.asarray(beam_inclinations)[::-1]
    else:
        lo, hi = inclination_range
        incl = ((0.5 + np.arange(h)) / h * (hi - lo) + lo)[::-1]
    az_corr = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    ratios = (w - np.arange(w) - 0.5) / w
    azimuth = (ratios * 2 - 1) * np.pi - az_corr

    az = np.broadcast_to(azimuth[None, :], (h, w))
    inc = np.broadcast_to(incl[:, None], (h, w))
    x = dist * np.cos(inc) * np.cos(az)
    y = dist * np.cos(inc) * np.sin(az)
    z = dist * np.sin(inc)
    pts = np.stack([x, y, z], axis=-1)  # sensor frame
    pts = pts @ extrinsic[:3, :3].T + extrinsic[:3, 3]

    if pixel_pose is not None and frame_pose is not None:
        rot = _rotation_from_euler(
            pixel_pose[..., 0], pixel_pose[..., 1], pixel_pose[..., 2]
        )  # (H, W, 3, 3)
        trans = pixel_pose[..., 3:6]
        pts_global = np.einsum("hwij,hwj->hwi", rot, pts) + trans
        inv = np.linalg.inv(frame_pose)
        pts = pts_global @ inv[:3, :3].T + inv[:3, 3]

    sel = mask
    feat = [pts[sel]]
    intensity = range_image[..., 1][sel] if range_image.shape[-1] > 1 else 0 * dist[sel]
    elongation = range_image[..., 2][sel] if range_image.shape[-1] > 2 else 0 * dist[sel]
    nlz = range_image[..., 3][sel] if range_image.shape[-1] > 3 else -1 + 0 * dist[sel]
    points = np.concatenate(
        [feat[0], intensity[:, None], elongation[:, None]], axis=-1
    ).astype(np.float32)
    return points, nlz.astype(np.float32)

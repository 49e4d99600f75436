"""Common utilities (logging, seeding, geometry helpers, meters).

Reference surface: pcdet/utils/common_utils.py. Distributed helpers live in
``toda_tpu/parallel`` (JAX process groups replace torch.distributed init).
"""

import logging
import random
from pathlib import Path

import numpy as np


def check_numpy_to_array(x):
    """Return (np.asarray(x), was_numpy_or_list flag)."""
    if isinstance(x, np.ndarray):
        return x, True
    return np.asarray(x), False


def limit_period(val, offset=0.5, period=np.pi):
    """Wrap angles into [-offset*period, (1-offset)*period).

    Works on numpy arrays, python scalars, and jax arrays (pure arithmetic).
    Reference: pcdet/utils/common_utils.py:42-46.
    """
    return val - np.floor(val / period + offset) * period


def limit_period_jnp(val, offset=0.5, period=np.pi):
    import jax.numpy as jnp

    return val - jnp.floor(val / period + offset) * period


def drop_info_with_name(info, name):
    """Filter annotation dict rows whose 'name' equals ``name`` (e.g. 'DontCare')."""
    ret_info = {}
    keep_indices = [i for i, x in enumerate(info["name"]) if x != name]
    for key in info.keys():
        ret_info[key] = info[key][keep_indices]
    return ret_info


def rotate_points_along_z(points, angle):
    """Rotate points around the z-axis (numpy, host side).

    Args:
        points: (B, N, 3 + C) or (N, 3 + C)
        angle: (B,) or scalar, radians (counter-clockwise)
    Reference semantics: pcdet/utils/common_utils.py:49-68.
    """
    points = np.asarray(points)
    single = points.ndim == 2
    if single:
        points = points[None]
        angle = np.asarray([angle], dtype=points.dtype)
    angle = np.asarray(angle, dtype=points.dtype)
    cosa, sina = np.cos(angle), np.sin(angle)
    zeros, ones = np.zeros_like(cosa), np.ones_like(cosa)
    rot = np.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)
    pts_rot = np.matmul(points[:, :, :3], rot)
    pts_rot = np.concatenate([pts_rot, points[:, :, 3:]], axis=-1)
    return pts_rot[0] if single else pts_rot


def rotate_points_along_z_jnp(points, angle):
    """Jittable z-rotation. points (..., N, 3+C), angle (...,)."""
    import jax.numpy as jnp

    cosa, sina = jnp.cos(angle), jnp.sin(angle)
    zeros, ones = jnp.zeros_like(cosa), jnp.ones_like(cosa)
    rot = jnp.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=-1
    ).reshape(angle.shape + (3, 3))
    pts_rot = jnp.matmul(points[..., :3], rot)
    return jnp.concatenate([pts_rot, points[..., 3:]], axis=-1)


def mask_points_by_range(points, limit_range):
    mask = (
        (points[:, 0] >= limit_range[0])
        & (points[:, 0] <= limit_range[3])
        & (points[:, 1] >= limit_range[1])
        & (points[:, 1] <= limit_range[4])
    )
    return mask


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range):
    """Voxel (z,y,x) int coords -> metric xyz centers.

    Reference: pcdet/utils/common_utils.py:71-87 (torch) — numpy/jnp-generic here.
    """
    assert voxel_coords.shape[-1] == 3
    voxel_centers = voxel_coords[..., [2, 1, 0]].astype(np.float32)  # -> (xyz)
    voxel_size = np.asarray(voxel_size, dtype=np.float32) * downsample_times
    pc_range = np.asarray(point_cloud_range[0:3], dtype=np.float32)
    return (voxel_centers + 0.5) * voxel_size + pc_range


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    logger = logging.getLogger(str(log_file) if log_file else __name__)
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else logging.ERROR)
        console.setFormatter(formatter)
        logger.addHandler(console)
        if log_file is not None:
            fh = logging.FileHandler(log_file)
            fh.setLevel(log_level if rank == 0 else logging.ERROR)
            fh.setFormatter(formatter)
            logger.addHandler(fh)
    logger.propagate = False
    return logger


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


def keep_arrays_by_name(gt_names, used_classes):
    inds = [i for i, x in enumerate(gt_names) if x in used_classes]
    return np.array(inds, dtype=np.int64)


def get_pad_params(desired_size, cur_size):
    assert desired_size >= cur_size
    return (0, desired_size - cur_size)


class AverageMeter:
    """Running average tracker (reference: common_utils.py:252-267)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def pad_to(arr, size, axis=0, value=0.0):
    """Pad ``arr`` along ``axis`` to ``size`` with ``value`` (truncating if longer).

    The universal ragged->static adapter of this framework: every per-frame quantity
    (points, boxes, voxels) passes through here before batching.
    """
    arr = np.asarray(arr)
    n = arr.shape[axis]
    if n == size:
        return arr
    if n > size:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, size)
        return arr[tuple(sl)]
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, size - n)
    return np.pad(arr, pad_width, mode="constant", constant_values=value)


def scan_dir_for_ckpts(ckpt_dir, pattern="checkpoint_epoch_*"):
    """List checkpoints sorted by epoch number (resume helper)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return []
    ckpts = list(ckpt_dir.glob(pattern))

    def epoch_of(p):
        try:
            return int(str(p.name).split("_")[-1].split(".")[0])
        except ValueError:
            return -1

    return sorted(ckpts, key=epoch_of)


def shm_cache_file(src_path, shm_dir="/dev/shm/toda_tpu", timeout_s=600.0):
    """Stage a file into /dev/shm once per host; every process gets the shm path.

    The reference loads the GT database into shared memory with a rank-leader
    SharedArray create + dist barrier (database_sampler.py:59-86,
    common_utils.py:245-249 sa_create). Here the leader is elected with an
    O_EXCL lock file and publishes via atomic rename, so it works for ANY mix
    of host processes (no process group required); non-leaders poll until the
    published copy appears. Falls back to the source path when /dev/shm is
    unavailable.
    """
    import os
    import shutil
    import time

    src_path = Path(src_path)
    shm_dir = Path(shm_dir)
    dst = shm_dir / src_path.name
    if dst.exists():
        return dst
    try:
        shm_dir.mkdir(parents=True, exist_ok=True)
    except OSError:
        return src_path

    lock = dst.with_suffix(dst.suffix + ".lock")
    try:
        fd = os.open(str(lock), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        fd = None
    except OSError:
        return src_path

    if fd is not None:  # leader: copy to a temp name, then atomic rename
        try:
            tmp = dst.with_suffix(dst.suffix + f".tmp{os.getpid()}")
            shutil.copyfile(str(src_path), str(tmp))
            os.replace(str(tmp), str(dst))
        finally:
            os.close(fd)
            lock.unlink(missing_ok=True)
        return dst

    deadline = time.monotonic() + timeout_s
    while not dst.exists():
        if not lock.exists() and not dst.exists():
            # leader died before publishing — retry the election
            return shm_cache_file(src_path, shm_dir=shm_dir, timeout_s=timeout_s)
        if time.monotonic() > deadline:
            return src_path  # give up on sharing, read the original
        time.sleep(0.05)
    return dst


def shm_cache_clear(shm_dir="/dev/shm/toda_tpu"):
    """Remove this host's staged shm copies (the reference's SharedArray
    teardown, database_sampler.py __del__)."""
    import shutil

    shm_dir = Path(shm_dir)
    if shm_dir.exists():
        shutil.rmtree(shm_dir, ignore_errors=True)

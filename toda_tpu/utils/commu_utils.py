"""Cross-process communication helpers.

Reference: pcdet/utils/commu_utils.py:35-180 (pickle-based all_gather of
arbitrary objects, reduce_dict, all_reduce, average_reduce_value,
concat_all_gather, synchronize barrier — all over NCCL) and the filesystem
result merge common_utils.merge_results_dist (:201-221).

JAX mapping: fixed-shape device values reduce inside jit (psum emitted by XLA);
these helpers cover the HOST-side patterns — arbitrary picklable objects and
barriers — via jax.experimental.multihost_utils. Every function degrades to a
no-op/identity in single-process runs (the common case on one TPU VM).
"""

import pickle

import jax
import numpy as np


def get_world_size():
    return jax.process_count()


def get_rank():
    return jax.process_index()


def synchronize():
    """Barrier across processes (reference commu_utils.synchronize)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("toda_tpu_barrier")


def all_gather(data):
    """Gather arbitrary picklable objects from every process -> list (ordered by
    rank). Replaces the pickle->ByteTensor->size-exchange dance of the reference
    (commu_utils.all_gather) with multihost_utils' padded byte gather."""
    world = jax.process_count()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.asarray([payload.size]))
    max_size = int(np.max(sizes))
    padded = np.zeros(max_size, dtype=np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)  # (world, max_size)
    out = []
    for r in range(world):
        out.append(pickle.loads(gathered[r][: int(sizes[r][0])].tobytes()))
    return out


def merge_results_dist(part_results, total_size):
    """Merge per-process partial result lists into one rank-interleaved list of
    length total_size (reference common_utils.merge_results_dist — there via
    tmpdir pickles + barriers; here via the byte all_gather)."""
    parts = all_gather(part_results)
    merged = []
    for tup in zip(*parts):
        merged.extend(tup)
    # zip(*) drops tails of uneven shards; append leftovers in rank order
    longest = max(len(p) for p in parts)
    for i in range(min(len(p) for p in parts), longest):
        for p in parts:
            if i < len(p):
                merged.append(p[i])
    return merged[:total_size]


def average_reduce_value(value):
    """Mean of a python scalar across processes (reference
    commu_utils.average_reduce_value, used for per-iter timing telemetry)."""
    if jax.process_count() == 1:
        return value
    vals = all_gather(float(value))
    return float(np.mean(vals))


def reduce_dict(input_dict, average=True):
    """Reduce a {str: scalar} dict across processes (reference reduce_dict)."""
    if jax.process_count() == 1:
        return dict(input_dict)
    keys = sorted(input_dict.keys())
    gathered = all_gather([float(input_dict[k]) for k in keys])
    arr = np.asarray(gathered)  # (world, K)
    red = arr.mean(axis=0) if average else arr.sum(axis=0)
    return dict(zip(keys, red.tolist()))


def concat_all_gather(array):
    """Concatenate a numpy array across processes along axis 0."""
    if jax.process_count() == 1:
        return np.asarray(array)
    parts = all_gather(np.asarray(array))
    return np.concatenate(parts, axis=0)


def params_checksum(tree):
    """Cheap order-independent checksum of this process's addressable view
    of a (replicated) pytree: f64 sum of per-leaf abs-sums."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            arr = np.asarray(leaf.addressable_shards[0].data)
        else:
            arr = np.asarray(leaf)
        total += float(np.abs(arr.astype(np.float64)).sum())
    return total


def assert_params_in_sync(tree, tag="params", rtol=1e-9):
    """Debug-mode cross-host race detector (SURVEY §5 rebuild item: the
    reference has no sanitizers; the TPU analog is an explicit cross-host
    checksum assert). Every process checksums its addressable view of the
    replicated parameters and asserts all processes agree — a divergence
    means a desynced optimizer step, a non-deterministic host-side input
    path leaking into params, or a collective bug. Gate via
    TODA_DEBUG_CHECKSUM=N (checked every N train iters). No-op single-process
    only in the sense that agreement is trivially true."""
    local = params_checksum(tree)
    sums = all_gather(local)
    ref = sums[0]
    bad = [
        (r, s) for r, s in enumerate(sums)
        if abs(s - ref) > rtol * max(abs(ref), 1.0)
    ]
    if bad:
        raise AssertionError(
            f"cross-host param checksum divergence at {tag}: rank sums {sums}"
        )
    return local

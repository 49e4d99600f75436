"""Device-mesh data parallelism.

TPU-native replacement for the reference's whole distributed layer (SURVEY.md §2.0):
torch.distributed init (common_utils.py:134-176) -> jax.distributed.initialize;
DistributedSampler -> per-process index sharding (datasets.DataLoader);
DDP gradient allreduce -> XLA-inserted psum via sharded-batch jit over a Mesh;
commu_utils collectives -> jax collectives + multihost utils.

The model here: params replicated over the 'dp' axis, batch sharded on axis 0.
Under jit, XLA emits the gradient all-reduce over ICI automatically — there is no
hand-written DDP machinery to maintain.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host process-group formation (the analog of init_dist_pytorch/_slurm,
    reference common_utils.py:134-176). No-op for single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return get_dist_info()


def init_dist_slurm(port=29500):
    """Derive the process group from the SLURM environment
    (reference common_utils.init_dist_slurm :134-158: SLURM_PROCID /
    SLURM_NTASKS / node list -> master addr). Returns (rank, world)."""
    import os
    import subprocess

    if "SLURM_PROCID" not in os.environ:
        return get_dist_info()
    proc_id = int(os.environ["SLURM_PROCID"])
    ntasks = int(os.environ["SLURM_NTASKS"])
    if ntasks <= 1:
        return get_dist_info()
    node_list = os.environ["SLURM_NODELIST"]
    addr = subprocess.getoutput(f"scontrol show hostname {node_list} | head -n1").strip()
    port = int(os.environ.get("MASTER_PORT", port))
    jax.distributed.initialize(
        coordinator_address=f"{addr}:{port}",
        num_processes=ntasks,
        process_id=proc_id,
    )
    return get_dist_info()


def get_dist_info():
    """(rank, world_size) in process terms (reference common_utils.py:179-198)."""
    return jax.process_index(), jax.process_count()


def make_mesh(devices=None, axis_name="dp"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name="dp"):
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="dp"):
    """Form the global sharded batch from this process's host-local arrays.

    Single-process: a plain device_put with leading-dim sharding (the argument
    IS the global batch). Multi-process: each process's loader holds only its
    shard (datasets/__init__.py idx[rank::world]), so the global array must be
    assembled with jax.make_array_from_process_local_data — device_put against
    a global mesh would mis-read the local shard as the full global value
    (SURVEY.md §2.0 "TPU-native equivalent"; the analog of DistributedSampler
    feeding DDP, reference tools/train.py:70-74).
    """
    sh = batch_sharding(mesh, axis_name)
    nproc = jax.process_count()

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            if nproc > 1:
                local = np.asarray(x)
                global_shape = (local.shape[0] * nproc,) + local.shape[1:]
                return jax.make_array_from_process_local_data(sh, local, global_shape)
            return jax.device_put(x, sh)
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

"""Shared reference-compatible CLI arguments for the training-style drivers.

The reference's tools/{train,stage1_cutmix_train,stage2_mixup_train,
stage2_mixup_train_cl,generate_pseudo_labels}.py all carry the same launch
boilerplate (workers/launcher/tcp_port/local_rank/sync_bn/...); this module is
the single place those flags are declared and mapped onto the jax-native
runtime so reference launch scripts keep working against every driver.
"""

import os


def add_common_train_args(parser):
    parser.add_argument("--ckpt", type=str, default=None,
                        help="resume checkpoint (default: newest in the run dir)")
    parser.add_argument("--ckpt_save_interval", type=int, default=1)
    parser.add_argument("--max_ckpt_save_num", type=int, default=30)
    parser.add_argument("--workers", type=int, default=0,
                        help="loader prefetch depth (reference num_workers analog)")
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--slurm", action="store_true",
                        help="derive the process group from SLURM_* env")
    parser.add_argument("--launcher", choices=["none", "pytorch", "slurm"],
                        default="none",
                        help="reference launcher names: slurm -> SLURM_* env init; "
                             "pytorch -> MASTER_ADDR/PORT + RANK/WORLD_SIZE env")
    parser.add_argument("--sync_bn", action="store_true",
                        help="accepted for compatibility: global-batch (sync) BN "
                             "statistics are ALWAYS on in this runtime")
    parser.add_argument("--merge_all_iters_to_one_epoch", action="store_true",
                        help="accepted for compatibility: the persistent threaded "
                             "loader never re-initializes between epochs")
    parser.add_argument("--tcp_port", type=int, default=None,
                        help="compat: folded into --coordinator_address")
    parser.add_argument("--local_rank", type=int, default=None,
                        help="compat: torch launchers inject this; process identity "
                             "comes from --process_id / the SLURM env here")
    return parser


def resolve_launcher(args):
    """Map the reference launcher names onto jax.distributed init inputs."""
    if args.launcher == "slurm":
        args.slurm = True
    elif args.launcher == "pytorch" and args.coordinator_address is None:
        # torchrun-style launch: the reference init_dist_pytorch reads the
        # same MASTER_ADDR/PORT + RANK/WORLD_SIZE env set
        addr = os.environ.get("MASTER_ADDR")
        port = args.tcp_port or os.environ.get("MASTER_PORT")
        if addr and port:
            args.coordinator_address = f"{addr}:{port}"
        else:
            raise RuntimeError(
                "--launcher pytorch requires the torchrun env (MASTER_ADDR + "
                "MASTER_PORT or --tcp_port); found MASTER_ADDR=%r MASTER_PORT=%r. "
                "Run under torchrun, or pass --coordinator_address explicitly, "
                "or drop --launcher for single-process training."
                % (addr, os.environ.get("MASTER_PORT"))
            )
        if args.num_processes is None and os.environ.get("WORLD_SIZE"):
            args.num_processes = int(os.environ["WORLD_SIZE"])
        if args.process_id is None and os.environ.get("RANK"):
            args.process_id = int(os.environ["RANK"])
    return args


def init_from_args(args):
    """Initialize the process group per the resolved launcher flags."""
    from toda_tpu.parallel import init_distributed

    resolve_launcher(args)
    if getattr(args, "slurm", False):
        from toda_tpu.parallel.mesh import init_dist_slurm

        init_dist_slurm()
    else:
        init_distributed(args.coordinator_address, args.num_processes, args.process_id)


def log_compat_notes(args, logger):
    if getattr(args, "sync_bn", False):
        logger.info("--sync_bn: global-batch BN statistics are always on here")
    if getattr(args, "merge_all_iters_to_one_epoch", False):
        logger.info("--merge_all_iters_to_one_epoch: no-op (persistent loader)")

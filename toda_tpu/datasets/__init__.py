"""Dataset registry + dataloader builders.

Reference: pcdet/datasets/__init__.py:68-157 (build_dataloader and the distributed
samplers). The torch DataLoader/DistributedSampler machinery is replaced by a
lightweight host loader: per-process index sharding (`indices[rank::world]`), numpy
collation, and an iterator the train loop feeds straight to jit (device_put happens
at the jit boundary; on TPU hosts there are no fork-based worker processes).
"""

import numpy as np

from .dataset import DatasetTemplate
from .synthetic.synthetic_dataset import SyntheticDataset

__all__ = {
    "DatasetTemplate": DatasetTemplate,
    "SyntheticDataset": SyntheticDataset,
}


def _register_lazy():
    # heavier adapters are imported lazily so the core package has no optional deps
    from .nuscenes.nuscenes_dataset import NuScenesDataset  # noqa

    __all__["NuScenesDataset"] = NuScenesDataset


class DataLoader:
    """Minimal epoch-based loader over a DatasetTemplate with static-shape collate.

    prefetch > 0 runs __getitem__ + collate on a background thread with a
    bounded queue, overlapping host preprocessing with the device step — the
    analog of the reference's num_workers DataLoader processes
    (pcdet/datasets/__init__.py:68-157), sized for TPU hosts with few cores.
    """

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=True,
                 rank=0, world_size=1, seed=0, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rank = rank
        self.world_size = world_size
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        if self.world_size > 1:
            # ALWAYS pad to a multiple of world_size so every rank sees the same
            # number of batches regardless of drop_last (unequal per-rank step
            # counts desynchronize the jitted collective step -> multi-host hang;
            # the reference DistributedSampler pads the same way).
            pad = (-len(idx)) % self.world_size
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.rank :: self.world_size]
        return idx

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, idx, b):
        chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
        if len(chunk) < self.batch_size and not self.drop_last:
            chunk = np.concatenate([chunk, idx[: self.batch_size - len(chunk)]])
        samples = [self.dataset[int(i)] for i in chunk]
        return self.dataset.collate_batch(samples)

    def __iter__(self):
        idx = self._indices()
        nb = len(self)
        if self.prefetch <= 0 or nb <= 1:
            for b in range(nb):
                yield self._make_batch(idx, b)
            return

        import queue
        import threading

        q = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def worker():
            try:
                for b in range(nb):
                    q.put(self._make_batch(idx, b))
            except BaseException as e:  # surface errors on the consumer side
                q.put(e)
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def build_dataset(dataset_cfg, class_names, training=True, root_path=None, logger=None, **kwargs):
    name = dataset_cfg.DATASET
    if name == "SyntheticDataset":
        cls = SyntheticDataset
    elif name == "NuScenesDataset":
        _register_lazy()
        cls = __all__["NuScenesDataset"]
    elif name == "KittiDataset":
        from .kitti.kitti_dataset import KittiDataset as cls
    elif name == "WaymoDataset":
        from .waymo.waymo_dataset import WaymoDataset as cls
    elif name == "LyftDataset":
        from .lyft.lyft_dataset import LyftDataset as cls
    elif name == "PandasetDataset":
        from .pandaset.pandaset_dataset import PandasetDataset as cls
    elif name == "CutMixDataset":
        from .mix_dataset import CutMixDataset as cls
    elif name == "MixUpDataset":
        from .mix_dataset import MixUpDataset as cls
    else:
        raise KeyError(f"unknown dataset: {name}")
    return cls(
        dataset_cfg=dataset_cfg,
        class_names=class_names,
        training=training,
        root_path=root_path,
        logger=logger,
        **kwargs,
    )


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False, root_path=None,
                     workers=0, logger=None, training=True, seed=0, total_epochs=0,
                     dataset=None, **dataset_kwargs):
    """Returns (dataset, dataloader, sampler_like) mirroring the reference tuple."""
    import jax

    if dataset is None:
        dataset = build_dataset(
            dataset_cfg, class_names, training, root_path, logger, **dataset_kwargs
        )
    rank = jax.process_index() if dist else 0
    world = jax.process_count() if dist else 1
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=training,
        drop_last=training,
        rank=rank,
        world_size=world,
        seed=seed,
        # the reference's num_workers DataLoader processes map to the
        # background-thread prefetch depth here (workers=0 keeps the default)
        prefetch=workers if workers > 0 else 2,
    )
    return dataset, loader, loader


def build_cutmix_dataloader(dataset_cfg, class_names, batch_size, **kwargs):
    """Stage-1 loader (reference pcdet/datasets/__init__.py build_cutmix_dataloader)."""
    return build_dataloader(dataset_cfg, class_names, batch_size, **kwargs)


def build_mixup_dataloader(dataset_cfg, class_names, batch_size, pseudo_infos=None, **kwargs):
    """Stage-2 loader (reference build_mixup_dataloader with pseudo_info_path)."""
    import pickle

    if isinstance(pseudo_infos, (str, bytes)):
        with open(pseudo_infos, "rb") as f:
            pseudo_infos = pickle.load(f)
    return build_dataloader(
        dataset_cfg, class_names, batch_size, pseudo_infos=pseudo_infos, **kwargs
    )

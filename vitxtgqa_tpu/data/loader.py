"""Batched, shuffled, epoch-seeded data loading with device prefetch.

Replaces torch DataLoader + DistributedSampler + BatchCollator
(reference: pythia/datasets/multi_dataset.py:254-293, samplers.py:10-66).

Design for TPU: the loader yields fixed-shape numpy batches on the host;
`prefetch_to_device` overlaps host assembly with device compute by keeping a
small queue of device-resident batches.  Sharding across processes follows
the DistributedSampler contract (epoch-seeded permutation, pad to a
world-size multiple, rank slice) so multi-host runs see disjoint data.
"""

from __future__ import annotations

import collections
import itertools
import threading
import queue as queue_mod
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

from vitxtgqa_tpu.data.dataset import collate


class EpochSampler:
    """Epoch-seeded shuffled (or sequential) index sharding.

    Same contract as the reference DistributedSampler (samplers.py:10-66):
    permutation seeded by epoch, padded to a multiple of world size, sliced
    by rank.
    """

    def __init__(
        self,
        n: int,
        shuffle: bool = True,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
    ):
        self.n = n
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def indices(self) -> List[int]:
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(self.n).tolist()
        else:
            order = list(range(self.n))
        total = -(-self.n // self.world_size) * self.world_size
        order += order[: total - len(order)]
        return order[self.rank : total : self.world_size]


_PROCESS_DATASETS: Dict[int, Any] = {}


def _worker_init(key: int, dataset: Any) -> None:
    """forkserver initializer: each worker unpickles the dataset once (the
    warmed processor caches ride along) and serves fetches from it."""
    _PROCESS_DATASETS[key] = dataset


def _process_fetch(key: int, idx: int):
    """Top-level fetch for process workers: the dataset object lives in the
    module-global registry (set by `_worker_init` under forkserver, or
    inherited through fork); only the small (key, idx) args and the sample
    dict cross the pipe per call."""
    return _PROCESS_DATASETS[key][idx]


class DataLoader:
    """Assemble samples into collated fixed-shape batches.

    `num_workers > 0` parallelises sample assembly:
      * ``worker_mode="process"`` (default) forks a worker pool, matching
        the reference's torch DataLoader num_workers processes
        (multi_dataset.py:254-272) — the per-sample python loops (OCR grid
        assembly, m4c_answer matching) are GIL-bound, so processes are the
        only way to scale them;
      * ``worker_mode="thread"`` uses threads (numpy/npy IO and the
        GIL-releasing native PHOC overlap, python stays serial) — the
        fallback where fork is unsafe/unavailable.
    Like the reference, per-worker answer-shuffle RNG streams make sample
    contents independent of worker count only in aggregate, not bit-exactly.
    """

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        rank: int = 0,
        world_size: int = 1,
        num_workers: int = 0,
        collate_fn: Callable = collate,
        pad_last: bool = False,
        worker_mode: str = "process",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.num_workers = num_workers
        self.worker_mode = worker_mode
        self._pool = None
        self._fetch_fn = None
        # pad the final partial batch to full size (repeating trailing
        # samples) so every batch has one static shape — no recompiles and
        # clean mesh sharding; host["n_valid"] records the real count
        self.pad_last = pad_last
        self.sampler = EpochSampler(
            len(dataset), shuffle=shuffle, seed=seed, rank=rank, world_size=world_size
        )

    def set_epoch(self, epoch: int) -> None:
        self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.sampler.indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _fetch(self, idx: int):
        return self.dataset[idx]

    def _emit(self, samples: List[Any], n_real: int) -> Dict[str, Any]:
        batch = self.collate_fn(samples)
        batch["host"]["n_valid"] = n_real
        return batch

    def _make_pool(self):
        """Returns (pool, fetch_fn).  Pools persist across epochs (the
        torch `persistent_workers=True` behaviour) — forkserver spawn +
        dataset unpickle happens once per loader, not per epoch.

        Process contexts: prefer `forkserver` (safe when JAX's threads are
        already running — plain fork from a multithreaded trainer can
        deadlock); fall back to `fork` (zero-copy dataset inheritance)
        where forkserver is unavailable, then to threads."""
        if self._pool is not None:
            return self._pool, self._fetch_fn
        if self.num_workers <= 0:
            self._fetch_fn = lambda chunk: [self._fetch(i) for i in chunk]
            return None, self._fetch_fn
        fetch = None
        if self.worker_mode == "process":
            import multiprocessing as mp

            methods = mp.get_all_start_methods()
            method = (
                "forkserver" if "forkserver" in methods
                else "fork" if "fork" in methods else None
            )
            if method is not None:
                from concurrent.futures import ProcessPoolExecutor

                key = id(self.dataset)
                if method == "forkserver":
                    pool = ProcessPoolExecutor(
                        max_workers=self.num_workers,
                        mp_context=mp.get_context(method),
                        initializer=_worker_init,
                        initargs=(key, self.dataset),
                    )
                else:
                    _PROCESS_DATASETS[key] = self.dataset
                    pool = ProcessPoolExecutor(
                        max_workers=self.num_workers,
                        mp_context=mp.get_context(method),
                    )
                chunksize = max(1, self.batch_size // (4 * self.num_workers))

                def fetch(chunk):
                    return list(
                        pool.map(
                            _process_fetch,
                            [key] * len(chunk),
                            chunk,
                            chunksize=chunksize,
                        )
                    )

        if fetch is None:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            fetch = lambda chunk: list(pool.map(self._fetch, chunk))
        self._pool, self._fetch_fn = pool, fetch
        return pool, fetch

    def close(self) -> None:
        """Shut down persistent worker pools (idempotent)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
            self._fetch_fn = None
            _PROCESS_DATASETS.pop(id(self.dataset), None)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        indices = self.sampler.indices()
        _, fetch = self._make_pool()
        for start in range(0, len(indices), self.batch_size):
            chunk = indices[start : start + self.batch_size]
            n_real = len(chunk)
            if n_real < self.batch_size:
                if self.drop_last:
                    return
                if self.pad_last:
                    pad = [chunk[-1]] * (self.batch_size - n_real)
                    chunk = chunk + pad
            yield self._emit(fetch(chunk), n_real)


def infinite_batches(
    loader: DataLoader,
    start_epoch: int = 0,
    epoch_cb: Optional[Callable[[int], None]] = None,
) -> Iterator[Dict[str, Any]]:
    """Epoch-incrementing endless iterator (the trainer counts iterations,
    not epochs — reference: base_trainer.py:216-245).

    ``start_epoch`` resumes the epoch-seeded shuffle where a restored
    checkpoint left off (the reference restores current_epoch from the
    checkpoint and re-seeds the sampler with it: checkpoint.py:131-136,
    base_trainer.py:216-223); ``epoch_cb`` reports each epoch boundary so
    the trainer can persist the counter into the next checkpoint."""
    for epoch in itertools.count(start_epoch):
        loader.set_epoch(epoch)
        if epoch_cb is not None:
            epoch_cb(epoch)
        yield from loader


def prefetch_batches(
    it: Iterator[Dict[str, Any]],
    size: int = 2,
    device_put: Optional[Callable] = None,
    keep_host: bool = False,
) -> Iterator[Dict[str, Any]]:
    """Background-thread prefetch; optionally device_put tensor subtrees.

    Overlaps host-side batch assembly (and H2D transfer when `device_put`
    is given) with device compute — the jnp equivalent of pin_memory +
    non-blocking copies.  JAX dispatch (device_put included) is
    thread-safe, so the H2D of batch t+1..t+size rides under the device's
    compute of batch t.

    ``keep_host`` preserves the original numpy tensors under
    "tensors_host" (metrics/decoding consumers avoid a device_get of the
    whole batch).  Worker exceptions re-raise in the consumer instead of
    silently ending the stream.
    """
    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=size)
    sentinel = object()
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that gives up when the consumer is gone: a plain
        # q.put would block a worker forever if the generator is
        # abandoned mid-stream (eval raising, an early break), leaking
        # one thread per abandoned prefetch
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue_mod.Full:
                continue
        return False

    def worker():
        try:
            for batch in it:
                if device_put is not None:
                    batch = dict(batch)
                    if keep_host:
                        batch["tensors_host"] = batch["tensors"]
                    batch["tensors"] = device_put(batch["tensors"])
                if not _put(batch):
                    return
        except BaseException as e:  # propagate into the consuming thread
            _put(("__prefetch_error__", e))
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, tuple) and len(item) == 2 and item[0] == "__prefetch_error__":
                raise item[1]
            yield item
    finally:
        stop.set()
        try:  # unblock a worker waiting on a full queue
            while True:
                q.get_nowait()
        except queue_mod.Empty:
            pass

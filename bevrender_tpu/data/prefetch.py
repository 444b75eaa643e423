"""Host->device input pipeline: threaded decode + double-buffered prefetch.

Replaces the reference's ``DataLoader(num_workers, pin_memory)``
(train.py:674-689). Decode/augment runs in a thread pool (PIL releases the
GIL for the hot parts); finished batches are pushed to device asynchronously
so the accelerator never waits on the host for steady-state steps. TPU-first:
on-device tensors are NHWC and the normalize/view-split work already happened
in numpy, so the jitted step gets dense float32 arrays it can cast to bf16.
"""

from __future__ import annotations

import collections
import concurrent.futures
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import jax
import numpy as np


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    # np.stack: measured at parity with the native memcpy path for typical
    # batch shapes (NATIVE_PREPROC_BENCH.json stack_ms 2.45 vs 2.55), without
    # the per-field contiguity checks + ctypes pointer setup. native.stack
    # stays available for callers with large same-shape fields that benefit.
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def group_batches(
    it: Iterator[Dict[str, np.ndarray]], k: int
) -> Iterator[Dict[str, np.ndarray]]:
    """Stack ``k`` consecutive batches into one ``(k, B, ...)`` super-batch
    (``TrainConfig.steps_per_dispatch``): the jitted multi-step scan then runs
    k optimizer steps per device dispatch, amortizing per-step RPC/copy cost.
    A trailing partial group is yielded at its natural size (one extra
    compile at most, since the remainder is constant across epochs)."""
    buf: List[Dict[str, np.ndarray]] = []
    for b in it:
        buf.append(b)
        if len(buf) == k:
            yield collate(buf)
            buf = []
    if buf:
        yield collate(buf)


class DataLoader:
    """Minimal map-style loader: shuffling, batching, drop_last, threaded
    ``__getitem__``; mirrors the reference loader's semantics
    (drop_last=True, train.py:680)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 2,
        drop_last: bool = True,
        seed: int = 0,
        sampler: Optional[Sequence[int]] = None,
        process_shard: Optional[tuple] = None,
    ):
        """``process_shard=(process_index, process_count)`` makes this the
        multi-host sampler: every process shuffles the SAME global index list
        (shared seed), then takes a strided shard — DistributedSampler
        semantics (train.py:667-672). ``batch_size`` is then the per-process
        batch; the global batch is ``batch_size * process_count``."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.sampler = sampler
        self.process_shard = process_shard
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle seed per epoch (DistributedSampler.set_epoch parity,
        train.py:180-181)."""
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.process_shard is not None:
            # padded shard: every process sees exactly ceil(n / pc) indices
            _, pc = self.process_shard
            n = -(-n // pc)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = (
            np.asarray(self.sampler)
            if self.sampler is not None
            else np.arange(len(self.dataset))
        )
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(idx)
        if self.process_shard is not None:
            # pad the shared permutation (wrapping) so every process gets an
            # EQUAL shard and iterates the same number of batches — matches
            # DistributedSampler's index padding (train.py:668); unequal
            # shards would desync the lockstep SPMD step on the last batch
            pi, pc = self.process_shard
            pad = (-len(idx)) % pc
            if pad and len(idx):
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[pi::pc]  # strided shard of the padded permutation
        usable = len(idx) - (len(idx) % self.batch_size) if self.drop_last else len(idx)
        batches = [
            idx[i : i + self.batch_size] for i in range(0, usable, self.batch_size)
        ]
        if not batches:
            return iter(())

        pool = concurrent.futures.ThreadPoolExecutor(self.num_workers)

        def load(batch_idx):
            return collate([self.dataset[int(i)] for i in batch_idx])

        def gen():
            try:
                pending = collections.deque()
                ahead = self.num_workers + 1
                for b in batches[:ahead]:
                    pending.append(pool.submit(load, b))
                next_submit = ahead
                while pending:
                    fut = pending.popleft()
                    if next_submit < len(batches):
                        pending.append(pool.submit(load, batches[next_submit]))
                        next_submit += 1
                    yield fut.result()
            finally:
                pool.shutdown(wait=False, cancel_futures=True)

        return gen()


def device_prefetch(
    it: Iterator[Dict[str, np.ndarray]],
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
    preprocess: Optional[Callable] = None,
) -> Iterator[Dict[str, jax.Array]]:
    """Keep ``size`` batches in flight on device (async dispatch).

    Single-host: plain (sharded) ``device_put``. Multi-host (the sharding
    spans non-addressable devices): each process feeds its local shard of the
    batch-axis and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — every process must iterate in
    lockstep with its own per-process loader shard (``DataLoader`` with
    ``process_shard``); replaces the reference's DistributedSampler + DDP
    input path (train.py:667-689).
    """
    multihost = jax.process_count() > 1 and sharding is not None

    def put(batch):
        if multihost:
            out = {
                k: jax.make_array_from_process_local_data(sharding, v)
                for k, v in batch.items()
            }
            if preprocess is not None:
                out = preprocess(out)
            return out
        if sharding is not None:
            out = {k: jax.device_put(v, sharding) for k, v in batch.items()}
        else:
            out = {k: jax.device_put(v) for k, v in batch.items()}
        if preprocess is not None:
            # jitted on-device resize/split/normalize (data/preprocess.py);
            # runs async behind the same prefetch window
            out = preprocess(out)
        return out

    # ``device_put`` can BLOCK on the host->device copy (it does on
    # remote-attached/tunneled TPUs, where each array is an RPC), so the puts
    # run in a dedicated thread and the consumer only ever pops finished
    # batches — the copy cost overlaps the previous step's compute instead of
    # sitting on the dispatch critical path.
    import queue as queue_mod

    q: queue_mod.Queue = queue_mod.Queue(maxsize=max(1, size))
    _END = object()

    def feeder():
        try:
            for batch in it:
                q.put(put(batch))
        except BaseException as e:  # surface dataset errors to the consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item

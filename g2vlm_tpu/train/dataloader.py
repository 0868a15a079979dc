"""Background-prefetching loader: dataset/packer threads overlap host work
(decode/resize/pack) with device steps — the role of torch DataLoader workers
+ pin_memory + SimpleCustomBatch.cuda() in the reference
(data/dataset_base.py:640-796)."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class _WorkerDone:
    """End-of-stream sentinel enqueued when a worker's iterator exhausts."""


class PrefetchLoader:
    """Wraps an iterable with N producer threads and a bounded queue.

    Each worker runs its own iterator built by `make_iter(worker_id)` (the
    dataset shards by worker_id, matching the reference's per-worker file
    splits). Items interleave nondeterministically across workers, like a
    torch DataLoader with num_workers > 1.
    """

    def __init__(
        self,
        make_iter: Callable[[int], Iterable],
        num_workers: int = 1,
        prefetch: int = 4,
        transform: Optional[Callable] = None,
    ):
        self.make_iter = make_iter
        self.num_workers = max(1, num_workers)
        self.queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self.transform = transform
        self._stop = threading.Event()
        self._threads = []
        self._started = False

    def _worker(self, wid: int):
        try:
            for item in self.make_iter(wid):
                if self._stop.is_set():
                    return
                if self.transform is not None:
                    item = self.transform(item)
                while not self._stop.is_set():
                    try:
                        self.queue.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except Exception as e:  # surface worker failures to the consumer
            self.queue.put(e)
        finally:
            # end-of-stream sentinel: finite iterators (eval sweeps, smoke
            # runs) terminate the consumer instead of deadlocking on get()
            self.queue.put(_WorkerDone())

    def _start(self):
        for wid in range(self.num_workers):
            t = threading.Thread(target=self._worker, args=(wid,), daemon=True)
            t.start()
            self._threads.append(t)
        self._started = True

    def __iter__(self) -> Iterator:
        if not self._started:
            self._start()
        live = self.num_workers
        while live > 0:
            item = self.queue.get()
            if isinstance(item, _WorkerDone):
                live -= 1
                continue
            if isinstance(item, Exception):
                raise item
            yield item

    def close(self):
        self._stop.set()

"""Async batch prefetch pipeline.

Replaces the reference's background loop threads + ``TaskQueue`` +
``GraphPool`` machinery (``common/task_queue.h``, ``graph_pool.h``,
per-arch loop files): a producer thread runs sample+extract for upcoming
batches into a bounded queue while the main thread trains — the ``--pipeline``
overlap of arch6 (``dist_loops_arch6.cc:55-199``).  JAX dispatch is already
async on device; the thread exists to hide the *host* work (miss gather,
shuffling) and the device→host sync points.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


class Prefetcher:
    """Bounded producer/consumer pipeline (GraphPool analog).

    ``produce`` is called in a background thread for every item of ``work``;
    results arrive in order via iteration.  Exceptions propagate to the
    consumer.  ``depth`` bounds in-flight batches (reference
    ``max_copying_jobs`` / GraphPool capacity).
    """

    _SENTINEL = object()

    def __init__(
        self,
        work: Iterable,
        produce: Callable,
        depth: int = 2,
    ):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._work = work
        self._produce = produce
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._stop = threading.Event()
        self._thread.start()

    def _run(self):
        try:
            for item in self._work:
                if self._stop.is_set():
                    break
                out = self._produce(item)
                while not self._stop.is_set():
                    try:
                        self._q.put(out, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # propagate to consumer
            self._q.put(("__error__", e))
            return
        self._q.put(self._SENTINEL)

    def __iter__(self) -> Iterator:
        while True:
            out = self._q.get()
            if out is self._SENTINEL:
                return
            if isinstance(out, tuple) and len(out) == 2 and out[0] == "__error__":
                raise out[1]
            yield out

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

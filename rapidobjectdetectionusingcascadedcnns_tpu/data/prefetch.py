"""Host-parallel input pipeline: batch prefetching + per-host sharding.

The reference's only input concurrency is a ThreadPoolExecutor around window
extraction (app/abstract_inference_app.py:62-64). The TPU-native equivalents
(SURVEY.md §2.6 item 3):

  * :class:`PrefetchIterator` — a background thread assembles the next
    batches (index gather + any host-side work) while the device executes the
    current step, hiding host latency behind device time;
  * :func:`shard_for_host` — deterministic per-process partition of a file
    list / sample set for multi-host training, aligned with
    ``jax.process_index()`` so every host feeds its local shard of the
    globally-sharded batch.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence, TypeVar

T = TypeVar("T")


class PrefetchIterator:
    """Wraps a batch iterator with a bounded background prefetch queue."""

    _SENTINEL = object()

    def __init__(self, batch_iterable: Iterator, depth: int = 2):
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(batch_iterable,), daemon=True
        )
        self._thread.start()

    def _worker(self, batch_iterable) -> None:
        try:
            for batch in batch_iterable:
                self._queue.put(batch)
        except BaseException as exc:  # propagate into the consumer
            self._error = exc
        finally:
            self._queue.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def shard_for_host(
    items: Sequence[T],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[T]:
    """Deterministic per-host partition (strided). Shuffle the corpus before
    sharding — a strided split can alias periodic label patterns."""
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    return list(items[process_index::process_count])

"""Async device prefetch: overlap host-side batch prep + H2D transfer with
device compute.

The reference gets input overlap from torch DataLoader worker processes
(train.py:315-324 via HF Trainer).  The TPU-idiomatic equivalent is a small
host thread that runs the batch iterator and `device_put`s the next `depth`
batches while the current step executes — JAX dispatch is async, so the
train loop only ever blocks on data that is already on device.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

from ..parallel import mesh as mesh_lib

_END = object()


def prefetch_to_device(batches: Iterable, mesh, depth: int = 2) -> Iterator:
    """Yield mesh-sharded batches, staged `depth` ahead by a worker thread.

    Exceptions raised by the source iterator are re-raised in the consumer.
    Dropping the generator early stops the worker promptly (no leaked
    blocked threads across epochs)."""
    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if not _put(mesh_lib.shard_batch(mesh, b)):
                    return
        except BaseException as e:  # surface iterator errors to the consumer
            _put((_END, e))
            return
        _put((_END, None))

    t = threading.Thread(target=worker, daemon=True,
                         name="smx-device-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if isinstance(item, tuple) and len(item) == 2 \
                    and item[0] is _END:
                if item[1] is not None:
                    raise item[1]
                return
            yield item
    finally:
        stop.set()

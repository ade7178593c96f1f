"""Host→device batch prefetching.

The reference's Keras fit_generator kept a host-side queue
(max_queue_size=3, /root/reference/myolo/model.py:1055) but transfers still
serialized with compute. Here a background thread runs batch assembly
(target encoding) AND `jax.device_put` ahead of the training loop, so the
host→device copy of batch N+1 overlaps the device compute of batch N — on
transfer-bound setups this hides most of the upload time.
"""

from __future__ import annotations

import queue
import threading

import jax


class DevicePrefetcher:
    """Iterate a BatchGenerator-like source with device-side prefetch.

    source: indexable with __len__/__getitem__ returning dict batches.
    sharding: optional NamedSharding (batch axis) for device_put.
    size: number of batches to stage ahead (2 is enough to overlap).
    """

    def __init__(self, source, sharding=None, size: int = 2):
        self.source = source
        self.sharding = sharding
        self.size = size

    def __len__(self):
        return len(self.source)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.size)
        err = []
        stop = threading.Event()

        def put(item) -> bool:
            """q.put that gives up when the consumer abandoned iteration —
            otherwise the worker would block forever on a full queue, pinning
            up to `size` staged device batches for the session's lifetime."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for i in range(len(self.source)):
                    if stop.is_set():
                        return
                    batch = self.source[i]
                    if self.sharding is not None:
                        from ..parallel.mesh import place_batch_array
                        batch = {k: place_batch_array(v, self.sharding)
                                 for k, v in batch.items()}
                    else:
                        batch = {k: jax.device_put(v)
                                 for k, v in batch.items()}
                    if not put(batch):
                        return
            except Exception as e:  # surface in the consumer thread
                err.append(e)
            finally:
                put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
            t.join()
        finally:
            # reached on break above, on generator .close() (consumer loop
            # raised / returned early), and on GC of a half-consumed iterator
            stop.set()
        if err:
            raise err[0]

"""Host-side input pipeline: threaded prefetch + eager device transfer.

The reference ships no training pipeline (SURVEY §3.5); its inference loop
reads frames synchronously.  On TPU the equivalent naive loop serializes
[cv2 decode -> host staging -> device_put -> step] and starves the chip:
decode of a (B, T, H, W) clip batch costs tens of ms of pure host time per
step.  The fix is the standard TPU input pipeline shape:

  * a daemon thread runs the (arbitrary, Python/cv2) iterator and eagerly
    calls ``jax.device_put`` with the target sharding, so host decode and
    the H2D DMA of batch N+1 overlap the device compute of batch N;
  * a bounded queue (default depth 2) provides back-pressure so the host
    never races more than ``buffer_size`` batches ahead (bounds host+HBM
    staging memory);
  * exceptions in the producer are captured and re-raised at the consumer's
    next() call, so data bugs surface at the training loop, not as a silent
    hang.

jax.device_put is thread-safe (it only builds transfer futures); the arrays
arriving at the train step are already committed to the right devices, so
the loop's own device_put becomes a no-op.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax

_DONE = object()


class _Failure:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch_to_device(data_iter: Iterable, sharding=None,
                       buffer_size: int = 2) -> Iterator:
    """Wrap ``data_iter`` so items are produced (and, when ``sharding`` is
    given, transferred with ``jax.device_put``) in a background thread.

    Yields the same items in order.  The producer stays at most
    ``buffer_size`` items ahead.  Stopping iteration (``close()`` on the
    returned generator, or just dropping it) unblocks and ends the thread.
    """
    if buffer_size < 1:
        raise ValueError("buffer_size must be >= 1")
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    stop = threading.Event()

    def produce():
        try:
            for item in data_iter:
                if sharding is not None:
                    item = jax.device_put(item, sharding)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            _put_final(_DONE)
        except BaseException as e:  # noqa: BLE001 — must surface at consumer
            _put_final(_Failure(e))

    def _put_final(token):
        while not stop.is_set():
            try:
                q.put(token, timeout=0.1)
                return
            except queue.Full:
                continue

    thread = threading.Thread(target=produce, daemon=True,
                              name="vda-prefetch")
    thread.start()

    try:
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, _Failure):
                raise item.exc
            yield item
    finally:
        stop.set()


def sized_prefetch(data_iter: Iterable, sharding=None, buffer_size: int = 2,
                   limit: Optional[int] = None) -> Iterator:
    """prefetch_to_device with an optional item cap (training's num_steps is
    known up front; capping in the producer lets infinite samplers terminate
    cleanly instead of leaving a blocked thread behind)."""
    if limit is not None:
        def capped(src):
            if limit <= 0:
                return
            for i, item in enumerate(src):
                yield item
                if i + 1 >= limit:
                    return
        data_iter = capped(data_iter)
    return prefetch_to_device(data_iter, sharding, buffer_size)

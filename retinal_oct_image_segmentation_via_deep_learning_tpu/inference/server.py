"""Persistent serving loop with request micro-batching.

The production-serving analog of the reference's offline
``model.predict(batch_size=4)`` (``FourierNet/trainTestModels.py:132``):
a background thread owns ONE jitted forward at a FIXED batch size (so XLA
compiles exactly once), clients submit single B-scans from any thread, and
the loop coalesces whatever arrived within ``max_wait_ms`` into a padded
batch, runs the device once, and resolves per-request futures.

Design points (TPU-first):
* fixed batch shape — dynamic shapes would recompile; partial batches are
  padded and the padding rows discarded;
* one dispatch per batch — over the tunneled backend, per-request dispatch
  RTT (~30 ms) would dominate; batching amortizes it;
* the forward is any ``fn(images) -> labels/logits`` (e.g. the bf16 model,
  ``unet_int8_forward`` or ``unet_packed_forward`` partials), so the same
  loop serves every quantization tier.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


class ServingLoop:
    def __init__(self, forward: Callable, image_shape, batch_size: int = 8,
                 max_wait_ms: float = 2.0):
        self.batch_size = batch_size
        self.image_shape = tuple(image_shape)  # (H, W, C)
        self.max_wait = max_wait_ms / 1e3
        self._forward = jax.jit(forward)
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._started = False
        self.batches_run = 0
        self.requests_served = 0

    # -- client API ---------------------------------------------------------

    def start(self):
        if not self._started:
            self._started = True
            self._thread.start()
        return self

    def submit(self, image: np.ndarray) -> Future:
        """Queue one (H, W, C) image; resolves to its (H, W) label map."""
        if self._stop.is_set():
            raise RuntimeError("ServingLoop is closed")
        if tuple(image.shape) != self.image_shape:
            raise ValueError(
                f"expected image shape {self.image_shape}, got {image.shape}"
            )
        fut: Future = Future()
        self._q.put((np.asarray(image), fut))
        return fut

    def predict(self, image: np.ndarray):
        return self.submit(image).result()

    def warmup(self):
        """Compile + execute one dummy batch before taking traffic, so the
        first real request doesn't pay XLA compilation (~20-40 s for the
        Pallas serving graphs over a remote backend)."""
        batch = jnp.zeros((self.batch_size,) + self.image_shape, jnp.float32)
        jax.block_until_ready(self._forward(batch))
        return self

    def close(self):
        """Reject new submits, drain-serve already-queued requests, stop."""
        self._stop.set()
        self._q.put(None)  # wake the loop
        if self._started:
            self._thread.join()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()

    # -- loop ---------------------------------------------------------------

    def _collect(self):
        """Block for the first request, then drain up to batch_size within
        max_wait."""
        first = self._q.get()
        if first is None:
            return []
        items = [first]
        import time

        deadline = time.monotonic() + self.max_wait
        while len(items) < self.batch_size:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _serve(self, items):
        pad = np.zeros(self.image_shape, np.float32)
        images = [img for img, _ in items]
        while len(images) < self.batch_size:
            images.append(pad)
        batch = jnp.asarray(np.stack(images))
        try:
            out = np.asarray(self._forward(batch))
        except Exception as e:  # resolve futures with the error
            for _, fut in items:
                fut.set_exception(e)
            return
        self.batches_run += 1
        for i, (_, fut) in enumerate(items):
            fut.set_result(out[i])
            self.requests_served += 1

    def _loop(self):
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            self._serve(items)
        # drain-serve requests that were queued before close()
        pending = []
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                pending.append(item)
        for i in range(0, len(pending), self.batch_size):
            self._serve(pending[i : i + self.batch_size])

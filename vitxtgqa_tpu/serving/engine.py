"""Dynamic-batching serving engine for inference_only models.

The reference has no serving stack (eval runs through the trainer's
DataLoader, pythia/trainers/base_trainer.py:300-345); production serving
needs request-level admission instead.  TPU constraints shape the design:

  * jit compiles one executable per input shape, so requests are grouped
    and padded to a fixed ladder of batch *buckets* — each bucket
    compiles once (warm them up front with ``warmup()``) and small tails
    ride in the next bucket up, sliced back after the step;
  * grouping happens on a dispatch thread with a bounded batching window
    (``max_wait_ms``): the first request of a group starts the clock,
    the group closes at the largest bucket or the deadline, whichever
    first — the standard throughput/latency trade;
  * JAX dispatch is asynchronous, so the dispatch thread immediately
    continues grouping while the device computes; results materialise in
    the caller's future on device_get.

Eval-time grounding is stochastic in the reference (fresh gumbel noise
per forward, t2s.py:461-466); the engine folds a monotone group counter
into its base key, so runs are reproducible given the same request
grouping, and co-batched requests share a draw exactly like rows of one
eval batch do.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import numpy as np


class ServingEngine:
    """Batch, pad, and dispatch single-sample requests to a jitted step.

    model: an inference_only flax module (its apply(train=False) returns
      a dict of per-row outputs, e.g. pos_scores / ground_frame /
      ground_box).
    params: the model params pytree (already on device).
    buckets: ascending batch sizes; the largest is the admission cap per
      group.  Every bucket is one compiled executable.
    max_wait_ms: batching window measured from the first queued request
      of a group.
    """

    def __init__(
        self,
        model,
        params,
        buckets: Sequence[int] = (8, 48, 192, 576),
        max_wait_ms: float = 5.0,
        rng_seed: int = 0,
        postprocess: Optional[Callable[[Dict[str, np.ndarray], int], Any]] = None,
    ):
        if list(buckets) != sorted(set(int(b) for b in buckets)):
            raise ValueError(f"buckets must be ascending and unique: {buckets}")
        self.model = model
        self.params = params
        self.buckets = [int(b) for b in buckets]
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self.postprocess = postprocess
        self._base_key = jax.random.key(rng_seed)
        self._group_counter = 0
        self._queue: "queue.Queue" = queue.Queue()
        self._stopped = threading.Event()

        def step(params, batch, group_id):
            return self.model.apply(
                {"params": params}, batch, train=False,
                rngs={"gumbel": jax.random.fold_in(self._base_key, group_id)},
            )

        self._step = jax.jit(step)
        # two-stage pipeline: the dispatch thread groups + pads + submits
        # (JAX dispatch is async, so the device starts while we keep
        # grouping) and a completion thread blocks on device_get — H2D +
        # grouping of group n+1 overlap the device compute of group n
        # bounded: at most 4 groups in flight on the device — the
        # dispatcher blocks (backpressure) instead of piling up device
        # buffers under overload
        self._completion: "queue.Queue" = queue.Queue(maxsize=4)
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._completer = threading.Thread(target=self._complete_loop,
                                           daemon=True)
        self._thread.start()
        self._completer.start()

    # -- client API ---------------------------------------------------------
    def submit(self, sample: Dict[str, np.ndarray]) -> Future:
        """Enqueue one sample (the batch dict WITHOUT the batch dim);
        returns a Future resolving to the per-row output dict."""
        if self._stopped.is_set():
            raise RuntimeError("engine stopped")
        fut: Future = Future()
        self._queue.put((sample, fut))
        return fut

    def warmup(self, example: Dict[str, np.ndarray],
               buckets: Optional[Sequence[int]] = None) -> None:
        """Compile the bucket executables up front (first-request latency
        otherwise pays the full jit compile)."""
        for b in buckets or self.buckets:
            batch = {k: np.broadcast_to(v, (b,) + np.shape(v)).copy()
                     for k, v in example.items()}
            jax.block_until_ready(
                self._step(self.params, batch, np.int32(-1))
            )

    def stop(self) -> None:
        self._stopped.set()
        self._queue.put(None)  # unblock the dispatcher
        self._thread.join(timeout=10)
        self._completion.put(None)
        self._completer.join(timeout=30)
        # fail any request that raced the shutdown instead of hanging its
        # caller forever
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item[1].done():
                item[1].set_exception(RuntimeError("engine stopped"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()

    # -- dispatch -----------------------------------------------------------
    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _collect_group(self):
        """Block for the first request, then drain until the largest
        bucket fills or the batching window closes."""
        first = self._queue.get()
        if first is None:
            return None
        group = [first]
        cap = self.buckets[-1]
        deadline = self.max_wait_s
        t0 = time.monotonic()
        while len(group) < cap:
            remaining = deadline - (time.monotonic() - t0)
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                break
            group.append(item)
        return group

    def _dispatch_loop(self):
        while not self._stopped.is_set():
            group = self._collect_group()
            if not group:
                if self._stopped.is_set():
                    break
                continue
            samples = [s for s, _ in group]
            futures = [f for _, f in group]
            n = len(samples)
            b = self._bucket_for(n)
            try:
                batch = {
                    key: np.stack(
                        [s[key] for s in samples]
                        + [samples[0][key]] * (b - n)
                    )
                    for key in samples[0]
                }
                gid = self._group_counter
                self._group_counter += 1
                out_dev = self._step(self.params, batch, np.int32(gid))
                # hand the in-flight device result to the completer and
                # immediately group the next batch
                self._completion.put((out_dev, futures, b))
            except Exception as e:  # surface errors in the callers
                for fut in futures:
                    if not fut.done():
                        fut.set_exception(e)

    def _complete_loop(self):
        while True:
            item = self._completion.get()
            if item is None:
                break
            out_dev, futures, b = item
            try:
                out = jax.device_get(out_dev)
                for i, fut in enumerate(futures):
                    # batch-dim outputs slice per row; scalar diagnostics
                    # (e.g. T2S's frame_topk/ocr_topk) pass through
                    row = {
                        k: v[i]
                        if getattr(v, "ndim", 0) and v.shape[0] == b
                        else v
                        for k, v in out.items()
                    }
                    fut.set_result(
                        self.postprocess(row, i) if self.postprocess else row
                    )
            except Exception as e:
                for fut in futures:
                    if not fut.done():
                        fut.set_exception(e)

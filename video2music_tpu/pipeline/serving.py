"""Dynamic request batching for production serving.

No reference counterpart: the reference's serving story is a gradio Space
calling ``Video2music.generate()`` one request at a time (reference:
``video2music.py:1``, ``README.md:14-27``). On TPU the decode step is
kernel-latency bound at B=1 while extra batch rows are nearly free
(measured: B=64 sustains ~37k tok/s aggregate vs ~11k at B=1 — see
``pipeline/api.generate_batch``), so a serving frontend should coalesce
concurrent requests into one compiled batched program. This module is that
coalescing layer:

  * requests enter a queue and a worker thread gathers them for up to
    ``max_wait_ms`` (or until ``max_batch``);
  * a gathered group runs as ONE program regardless of per-request
    temperatures (the sampler temperature is a per-element traced input,
    not a compile-time constant), padded up to a power-of-two bucket so
    the number of distinct compiled programs stays bounded (pad clones
    decode on-device but skip the host-side render via ``n_real``);
  * each caller gets a Future resolving to its ``GenerateResult``.

Use via :class:`DynamicBatcher` directly, or the HTTP frontend in
``cli/serve.py``.
"""

from __future__ import annotations

import itertools
import os
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


@dataclass
class _Pending:
    request: Dict[str, Any]
    temperature: float
    future: Future = field(default_factory=Future)


class DynamicBatcher:
    """Coalesce concurrent generate requests into batched decode programs.

    Args:
      v2m: a ``pipeline.api.Video2music`` instance.
      max_batch: hard cap on requests per program.
      max_wait_ms: how long the worker waits for co-travellers after the
        first request of a group arrives. Latency cost of batching is at
        most this; throughput gain is up to the bucket width.
      output_dir: base dir; each request renders into a unique subdir
        unless it carries its own ``output_dir``.
      buckets: allowed batch widths (compiled programs are per-width, so
        keep this short and sorted ascending).
    """

    def __init__(self, v2m, *, max_batch: int = 16, max_wait_ms: int = 30,
                 output_dir: str = "./serve_output",
                 buckets=DEFAULT_BUCKETS, **generate_kwargs):
        self.v2m = v2m
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.output_dir = output_dir
        self.buckets = tuple(sorted(b for b in buckets if b <= max_batch))
        if not self.buckets or self.buckets[0] != 1:
            raise ValueError("buckets must include 1 and respect max_batch")
        if self.buckets[-1] < max_batch:
            # a gathered group can reach max_batch — the bucket list must
            # cover it or _run_batch would have no width to pad to
            self.buckets = self.buckets + (max_batch,)
        self.generate_kwargs = generate_kwargs
        self.stats = {"requests": 0, "batches": 0, "batched_requests": 0,
                      "max_batch_size": 0}
        self._stats_lock = threading.Lock()
        self._seq = itertools.count()
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="v2m-batcher")
        self._worker.start()

    # ------------------------------------------------------------------
    def submit(self, request: Dict[str, Any],
               temperature: float = 1.0) -> Future:
        """Queue one request dict (``generate_batch`` schema: ``features``
        required). Returns a Future of (GenerateResult, batch_width)."""
        if self._stop.is_set():
            raise RuntimeError("batcher stopped")
        if "output_dir" not in request:
            request = dict(request, output_dir=os.path.join(
                self.output_dir, f"req_{next(self._seq):06d}"))
        item = _Pending(request=request, temperature=float(temperature))
        with self._stats_lock:
            self.stats["requests"] += 1
        self._q.put(item)
        return item.future

    def generate(self, request: Dict[str, Any], temperature: float = 1.0,
                 timeout: Optional[float] = None):
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(request, temperature).result(timeout=timeout)

    def stop(self) -> None:
        self._stop.set()
        self._q.put(None)
        self._worker.join(timeout=5)

    # ------------------------------------------------------------------
    def _gather(self) -> List[_Pending]:
        first = self._q.get()
        if first is None:
            return []
        group = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(group) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post the stop sentinel
                break
            group.append(nxt)
        return group

    def _run(self) -> None:
        while not self._stop.is_set():
            group: List[_Pending] = []
            try:
                group = self._gather()
                if not group:
                    continue
                self._run_batch(group)
            except Exception as exc:  # noqa: BLE001 — the worker thread
                # must survive ANY bug in gathering/batching: a dead
                # daemon thread would leave every future unresolved and
                # every submit() blocking forever. Fail the group loudly
                # and keep serving.
                for it in group:
                    if not it.future.done():
                        it.future.set_exception(exc)

    def _run_batch(self, items: List[_Pending]) -> None:
        n = len(items)
        bucket = next(b for b in self.buckets if b >= n)
        requests = [it.request for it in items]
        temps = [it.temperature for it in items]
        # pad clones keep program shapes bucketed; n_real tells
        # generate_batch to decode them on-device but skip their host-side
        # MIDI/audio render entirely
        pad = dict(items[-1].request,
                   output_dir=os.path.join(self.output_dir, "_pad"))
        requests = requests + [pad] * (bucket - n)
        temps = temps + [temps[-1]] * (bucket - n)
        try:
            results = self.v2m.generate_batch(
                requests, temperature=temps, n_real=n,
                output_dir=self.output_dir, **self.generate_kwargs)
        except Exception as exc:  # surface to every caller in the batch
            for it in items:
                it.future.set_exception(exc)
            return
        with self._stats_lock:
            self.stats["batches"] += 1
            self.stats["batched_requests"] += n
            self.stats["max_batch_size"] = max(self.stats["max_batch_size"],
                                               n)
        for it, res in zip(items, results):
            it.future.set_result((res, bucket))

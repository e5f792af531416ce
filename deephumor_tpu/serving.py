"""Dynamic request batching for meme-caption serving.

The TPU decode engine compiles one executable per batch shape and hits
peak throughput at large batches (bench.py: throughput plateaus around
~900 items/call, while a single request costs the same dispatch). A
production endpoint receives requests one at a time, so the classic
serving pattern applies: coalesce concurrent requests into one padded
device batch, bounded by a maximum wait.

:class:`DynamicBatcher` implements that pattern over
:class:`~deephumor_tpu.pipeline.MemeGenerationPipeline`:

- ``submit(template_id)`` returns a ``concurrent.futures.Future``
  immediately; callers block on ``.result()`` or fan out.
- a collector thread drains the queue into batches of up to
  ``max_batch`` requests, waiting at most ``max_wait_ms`` after the
  first pending request before dispatching a partial batch.
- every device call is padded to a size from a small, fixed ``buckets``
  ladder (the pipeline's ``pad_to``), so the server runs a handful of
  compiled executables — no shape-churn recompiles. By default the
  ladder is just ``[max_batch]`` (one executable, round-2 behavior);
  ``buckets="auto"`` adds smaller sizes so a lightly loaded server pays
  for the batch it actually has instead of a full ``max_batch`` decode.
  The system self-adapts: under load the queue fills batches to
  ``max_batch`` (same peak throughput), at low load batches land in the
  small buckets (see benchmarks/serving_load.py for the measured
  p50-vs-load sweep).
- with ``render=True`` the batch renders through the pipeline's host
  pool (threads or spawn processes) and futures resolve to
  ``(caption_text, PIL image)``; otherwise to the caption text.

Reference counterpart: none — the reference serves from a notebook one
meme at a time (deephumor_demo.ipynb cell 35). This is new TPU-serving
surface over the same models.

Example::

    pipe = MemeGenerationPipeline(model, params, vocab)
    pipe.add_templates(ids, images, pil_images=pils)
    with DynamicBatcher(pipe, max_batch=256, max_wait_ms=5,
                        max_len=32, beam_size=5, top_k=64) as server:
        futs = [server.submit(tid) for tid in requests]
        texts = [f.result() for f in futs]
"""

import itertools
import queue
import threading
import time
from concurrent.futures import Future

import jax

__all__ = ["DynamicBatcher"]


class DynamicBatcher:
    """Coalesces concurrent caption/meme requests into padded device
    batches (one compiled shape, bounded added latency)."""

    def __init__(self, pipeline, max_batch=256, max_wait_ms=10.0,
                 render=False, key=None, buckets=None, hysteresis=3,
                 **generate_kwargs):
        """Args:
            pipeline: a ready :class:`MemeGenerationPipeline` (templates
                already added).
            max_batch: maximum device batch size per call.
            max_wait_ms: maximum time the collector holds the FIRST
                request of a batch while more arrive (p50 latency under
                low load ≈ this + one decode).
            buckets: padded-call sizes. ``None`` = ``[max_batch]`` (one
                executable; every call padded to max_batch).
                ``"auto"`` = a halving ladder down from ``max_batch``
                with a floor of 16 (e.g. 256 -> [16, 32, 64, 128, 256]):
                each dispatch pads to the smallest bucket that fits, so
                low-load batches run a proportionally cheaper decode.
                The steady state self-selects — with call time
                ``t(b) ~ a + c*b``, the server settles in the smallest
                bucket whose capacity covers the arrivals accumulating
                during one call. A sequence
                of ints gives the ladder explicitly (``max_batch`` is
                appended if missing). Each bucket is a separate compiled
                executable — call :meth:`warmup` at startup to move the
                compiles out of the serving path. Note sampled draws are
                batch-shaped, so a request's caption depends on the
                bucket its batch landed in; determinism stays per
                (key, arrival order), exactly as without buckets.
            hysteresis: bucket-choice damping (multi-bucket ladders
                only). Mid-load the raw pick-smallest-fitting policy
                oscillates: a batch that happens to fit the next bucket
                down dispatches there, the slower per-item small-bucket
                call lets backlog build, the next batch overflows back
                up — measured p99 at 0.6x capacity was WORSE than
                pad-to-max (docs/SERVING.md). With damping on, each
                dispatch pads to the bucket fitting the EWMA of recent
                batch sizes (smoothed over ~``hysteresis`` dispatches)
                instead of this batch's size — mid-load the choice
                converges to the one steady bucket (matching the
                measured pad-to-max win there) while low load still
                settles into small buckets. An individual batch larger
                than the EWMA bucket always dispatches at its true fit
                (no queue-building commitment). ``0`` disables (raw
                round-2 policy). An earlier arrival-rate/call-time
                floor predictor measured strictly worse than both raw
                and pad-to-max on hardware (docs/SERVING.md A/B) and
                was dropped.
            render: resolve futures to ``(text, PIL image)`` via the
                pipeline's render pool instead of just ``text``.
            key: base PRNG key; each batch uses ``fold_in(key, seq)``
                so results are deterministic per (key, arrival order).
            generate_kwargs: forwarded to the pipeline's generate call
                (max_len, beam_size, top_k, temperature, sampler, ...).
        """
        self.pipeline = pipeline
        self.max_batch = int(max_batch)
        # a mesh-backed pipeline splits every device call over the data
        # axis, so padded sizes must be multiples of the axis size
        ds = getattr(pipeline, "_data_size", 1)
        if self.max_batch % ds:
            raise ValueError(
                f"max_batch={max_batch} must be a multiple of the "
                f"pipeline mesh's data-axis size {ds}")
        floor = max(16, ds)
        if buckets is None:
            self.buckets = (self.max_batch,)
        elif buckets == "auto":
            ladder, b = {self.max_batch}, self.max_batch
            while b > floor:
                b = max(floor, b // 2)
                b -= b % ds  # keep ladder steps shardable
                ladder.add(b)
            self.buckets = tuple(sorted(ladder))
        else:
            if isinstance(buckets, str):  # "128" would iterate per-char
                raise ValueError(
                    f"buckets={buckets!r}: expected None, 'auto', or a "
                    "sequence of ints")
            ladder = {int(b) for b in buckets}
            if not ladder or min(ladder) < 1:
                raise ValueError(f"invalid buckets: {buckets!r}")
            if max(ladder) > self.max_batch:
                raise ValueError(
                    f"bucket {max(ladder)} exceeds max_batch {max_batch}")
            bad = sorted(b for b in ladder if b % ds)
            if bad:
                raise ValueError(
                    f"buckets {bad} not multiples of the pipeline mesh's "
                    f"data-axis size {ds}")
            ladder.add(self.max_batch)  # a full batch must fit
            self.buckets = tuple(sorted(ladder))
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.render = render
        self.generate_kwargs = generate_kwargs
        # -- bucket damping state (collector thread only) --
        self.hysteresis = int(hysteresis) if len(self.buckets) > 1 else 0
        self._n_ewma = None  # EWMA of dispatch batch sizes
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._queue = queue.SimpleQueue()
        self._spill = []  # submit_many overflow (collector thread only)
        self._seq = itertools.count()
        self._closed = threading.Event()
        self.batches_dispatched = 0
        self.requests_served = 0
        #: per-dispatch batch sizes (telemetry for load tests/monitoring;
        #: appended by the collector thread only)
        self.batch_sizes = []
        #: per-dispatch padded bucket sizes (same indexing as
        #: ``batch_sizes``)
        self.pad_sizes = []
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="dh-batcher")
        self._worker.start()

    # -- client API ----------------------------------------------------------
    def submit(self, template_id):
        """Enqueue one request; returns a Future resolving to the
        caption text (or ``(text, image)`` when rendering).

        Unknown template ids fail their OWN future here instead of
        poisoning the whole coalesced batch they would land in."""
        if self._closed.is_set():
            raise RuntimeError("DynamicBatcher is closed")
        fut = Future()
        if template_id not in self.pipeline._row or (
                self.render and template_id not in self.pipeline._images):
            fut.set_exception(KeyError(
                f"unknown template {template_id!r}"))
            return fut
        self._queue.put((template_id, fut))
        return fut

    def submit_many(self, template_ids):
        """Enqueue a client batch in ONE queue operation; returns one
        Future per id (same order, same semantics as :meth:`submit`).

        The measured mesh-serving host ceiling is dominated by
        per-request queue hops (~0.22 ms/request, docs/SERVING.md) —
        clients that already hold a batch should hand it over whole.
        Dispatch batching is unchanged: the collector still splits or
        coalesces against ``max_batch``/``max_wait_ms``, so a client
        batch larger than ``max_batch`` spills into follow-on device
        calls in order."""
        if self._closed.is_set():
            raise RuntimeError("DynamicBatcher is closed")
        futs, good = [], []
        for tid in template_ids:
            fut = Future()
            futs.append(fut)
            if tid not in self.pipeline._row or (
                    self.render and tid not in self.pipeline._images):
                fut.set_exception(KeyError(f"unknown template {tid!r}"))
            else:
                good.append((tid, fut))
        if good:
            self._queue.put(good)
        return futs

    def _bucket_for(self, n):
        """Smallest configured bucket that fits ``n`` requests."""
        for b in self.buckets:
            if b >= n:
                return b
        return self.max_batch  # unreachable: collector caps at max_batch

    def _choose_bucket(self, n):
        """Bucket for an ``n``-request dispatch under the damped policy
        (collector thread only; see ``hysteresis`` docstring): pad to
        the bucket fitting the EWMA of recent batch sizes, never below
        this batch's true fit."""
        fit = self._bucket_for(n)
        if not self.hysteresis:
            return fit
        alpha = 1.0 / self.hysteresis
        self._n_ewma = (float(n) if self._n_ewma is None
                        else (1 - alpha) * self._n_ewma + alpha * n)
        return max(fit, self._bucket_for(int(round(self._n_ewma))))

    def warmup(self, template_id=None):
        """Compiles every bucket's decode executable with one dummy call
        each (smallest first), so no live request ever waits on a
        compile. Uses ``template_id`` or any registered template."""
        if template_id is None:
            if not self.pipeline._row:
                raise RuntimeError(
                    "warmup() needs at least one registered template "
                    "(pipeline.add_templates)")
            template_id = next(iter(self.pipeline._row))
        for b in self.buckets:
            self.pipeline.generate_captions(
                [template_id], key=self._key, pad_to=b,
                **self.generate_kwargs)

    def close(self, timeout=30.0):
        """Stops the collector after draining pending requests."""
        if not self._closed.is_set():
            self._closed.set()
            self._queue.put(None)  # wake the collector
            self._worker.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- collector -----------------------------------------------------------
    def _take(self, batch, item):
        """Folds one queue item (a single (tid, fut) or a submit_many
        list) into ``batch``, spilling anything past max_batch for the
        next dispatch (collector thread only)."""
        if isinstance(item, list):
            room = self.max_batch - len(batch)
            batch.extend(item[:room])
            if len(item) > room:
                self._spill.extend(item[room:])
        else:
            batch.append(item)

    def _collect(self):
        """Blocks for the first request, then gathers up to max_batch
        for at most max_wait_s. Returns a (possibly empty) list."""
        batch = []
        if self._spill:  # leftovers from an oversized submit_many
            batch = self._spill[:self.max_batch]
            del self._spill[:self.max_batch]
            if len(batch) >= self.max_batch:
                return batch
        else:
            item = self._queue.get()  # block until work or wake-up
            if item is not None:
                self._take(batch, item)
        t_end = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = t_end - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                break
            self._take(batch, item)
        return batch

    def _run(self):
        while True:
            batch = self._collect()
            if not batch:
                if (self._closed.is_set() and self._queue.empty()
                        and not self._spill):
                    return
                continue
            ids = [tid for tid, _ in batch]
            futs = [f for _, f in batch]
            key = jax.random.fold_in(self._key, next(self._seq))
            pad_to = self._choose_bucket(len(ids))
            try:
                if self.render:
                    out = self.pipeline.generate_memes(
                        ids, key=key, pad_to=pad_to,
                        **self.generate_kwargs)
                    results = [(text, img) for _, text, img in out]
                else:
                    results = self.pipeline.generate_captions(
                        ids, key=key, pad_to=pad_to,
                        **self.generate_kwargs)
            except Exception as e:  # noqa: BLE001 — fail the batch, not the server
                for f in futs:
                    f.set_exception(e)
            else:
                self.batches_dispatched += 1
                self.requests_served += len(futs)
                self.batch_sizes.append(len(futs))
                self.pad_sizes.append(pad_to)
                for f, r in zip(futs, results):
                    f.set_result(r)
            # the close() wake-up None may have been consumed while this
            # batch was collecting — check on every path, or a failed
            # final batch would block _collect forever (spilled
            # submit_many leftovers must still drain first)
            if (self._closed.is_set() and self._queue.empty()
                    and not self._spill):
                return

"""End-to-end meme generation pipeline (the product/serving path).

The reference's equivalent is notebook glue (deephumor_demo.ipynb cell 35
``get_a_meme``): one meme at a time, re-encoding the image every call. This
pipeline is the TPU-native serving design (SURVEY.md §7.7/7.9):

- template images are encoded ONCE into a feature cache (global + spatial
  embeddings) — 300 templates amortize the whole ResNet over thousands of
  captions,
- caption generation runs batched over (templates x samples) through the
  jitted beam-search engine,
- text post-processing (seq_to_text / split_caption) and the PIL renderer
  run host-side on a thread pool while the TPU generates the next batch.

Multi-chip serving (``mesh=``): constructed with a pure-data
``jax.sharding.Mesh``, the SAME pipeline object scales over the chips —
params are replicated across the mesh, the stacked template feature
store is row-sharded over the ``data`` axis (each chip holds 1/N of the
templates), request feature gathers run as one jitted cross-chip gather,
and the decode loop runs N-way data-parallel through
:func:`deephumor_tpu.parallel.dp_generate` (the Pallas kernels see local
shapes; no collectives inside the token loop). Request batches must pad
to a multiple of the data-axis size — :class:`~deephumor_tpu.serving.
DynamicBatcher` constrains its bucket ladder accordingly. Greedy decode
is token-equal to the single-device pipeline (tested on the virtual
8-device mesh); sampled draws decorrelate per shard by key fold-in.
"""

import os
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp

from deephumor_tpu.experiments.inference import seq_to_text, split_caption
from deephumor_tpu.imaging import memeify_image

__all__ = ["MemeGenerationPipeline"]

# -- process-pool render workers ---------------------------------------------
# PIL's FreeType rasterization runs under the GIL, so the THREAD pool
# overlaps rendering with device work but cannot scale rendering across
# host cores; a process pool can. Workers get the template images once
# at pool creation (raw bytes via the spawn initializer — spawn, not
# fork: the parent holds live JAX/XLA threads) and never touch jax.
_WORKER_IMAGES = {}
_WORKER_FONT = None


def _render_proc_init(images_raw, font_path):
    from PIL import Image

    global _WORKER_FONT
    _WORKER_IMAGES.clear()
    for tid, (mode, size, raw) in images_raw.items():
        _WORKER_IMAGES[tid] = Image.frombytes(mode, size, raw)
    _WORKER_FONT = font_path


def _render_proc_warm(delay_s):
    """Warm task: proves this worker's initializer finished. The small
    sleep stops one fast worker from draining the whole warm batch
    before slower workers come up (pool tasks are not distributed
    one-per-worker)."""
    import time as _time

    _time.sleep(delay_s)
    return os.getpid()


def _render_proc_one(tid, text):
    top, bottom = split_caption(text, num_blocks=2)
    img = _WORKER_IMAGES.get(tid)
    if img is None:
        return tid, text, None
    out = memeify_image(img, top=top, bottom=bottom,
                        font_path=_WORKER_FONT)
    return tid, text, (out.mode, out.size, out.tobytes())


class MemeGenerationPipeline:
    """Batched template -> captioned meme pipeline.

    Args:
        model: a caption model dataclass (deephumor_tpu.models).
        params: its parameter pytree.
        vocab: Vocab for decoding token ids.
        delimiter: join delimiter for :func:`seq_to_text` ('' for char
            models, ' ' for word models — notebook cell 35).
        render_workers: host threads for PIL rendering.
        render_processes: when > 0, render in a persistent spawn-based
            process pool of this size instead of threads — FreeType
            rasterization holds the GIL, so threads overlap rendering
            with device work but cannot scale it across host cores;
            processes can. Workers snapshot the template images at pool
            creation (pool rebuilds when templates change); call
            ``close()`` to shut the pool down.
    """

    def __init__(self, model, params, vocab, delimiter=" ",
                 font_path=None, render_workers=8, render_processes=0,
                 mesh=None):
        self.model = model
        self.vocab = vocab
        self.delimiter = delimiter
        self.font_path = font_path
        self.render_workers = render_workers
        # mesh: a pure-data jax.sharding.Mesh scales generation over the
        # chips — params replicated, feature store row-sharded, decode
        # through parallel.dp_generate (see module docstring)
        self.mesh = mesh
        self._data_size = 1
        if mesh is not None:
            if mesh.shape.get("model", 1) != 1:
                raise ValueError(
                    "pipeline mesh must be pure data-parallel (model=1); "
                    "got %r — TP weight sharding composes via jit "
                    "propagation instead (parallel/sharding.py)"
                    % dict(mesh.shape))
            self._data_size = int(mesh.shape["data"])
            from deephumor_tpu.parallel import replicate

            params = replicate(params, mesh)
        self.params = params
        self._gather_fn = None  # jitted sharded feature gather (lazy)
        self._sharded_store = None  # mesh row-sharded store view (lazy)
        # render_processes > 0 renders in a persistent spawn-based
        # process pool instead of threads — FreeType rasterization holds
        # the GIL, so only processes scale rendering across host cores
        self.render_processes = render_processes
        self._proc_pool = None
        self._proc_pool_version = -1
        self._images_version = 0
        self._images = {}  # template id -> PIL image (for rendering)
        # stacked feature store: one device array per feature leaf with a
        # row per template; lookups are a single gather instead of an
        # n-way concat per generate call. New encodings buffer in
        # ``_pending`` and consolidate lazily on first use — one concat
        # per generate call, not one per add_template (O(n^2) copies)
        self._stacked = None
        self._pending = []  # encoded pytrees awaiting consolidation
        self._row = {}  # template id -> row index in the stacked store
        self._n_rows = 0

    # -- template cache ------------------------------------------------------
    def add_template(self, template_id, image, pil_image=None,
                     label_ids=None):
        """Encodes and caches one template.

        Args:
            template_id: hashable id (e.g. label).
            image: preprocessed ``[224, 224, 3]`` float array.
            pil_image: optional original PIL image for rendering.
            label_ids: template-label token ids ``[L]`` — required for the
                labels-conditioned model family (its encoder consumes
                image + label text).
        """
        if label_ids is not None:
            enc = self.model.encode(
                self.params, jnp.asarray(image)[None],
                jnp.asarray(label_ids)[None],
            )
        else:
            enc = self.model.encode(self.params, jnp.asarray(image)[None])
        self._append_stacked([template_id], enc)
        if pil_image is not None:
            # eager-load: a template is rendered by multiple worker threads
            # concurrently, and PIL's lazy file-backed load is not
            # thread-safe (one thread's load closes the fp mid-seek)
            if hasattr(pil_image, "load"):
                pil_image.load()
            self._images[template_id] = pil_image
            self._images_version += 1

    def add_templates(self, ids, images, pil_images=None, batch_size=32,
                      label_ids=None):
        """Encodes templates in batches (one ResNet pass per batch).

        ``label_ids``: optional ``[n, L]`` padded label-token matrix for
        the labels-conditioned model family.
        """
        images = np.asarray(images)
        for start in range(0, len(ids), batch_size):
            chunk = ids[start : start + batch_size]
            # pad the tail chunk to the full batch (repeat the last row):
            # a second batch shape would trigger a fresh ResNet compile
            pad = batch_size - len(chunk)
            sl = slice(start, start + len(chunk))

            def pick(arr):
                x = np.asarray(arr[sl])
                if pad:
                    x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
                return jnp.asarray(x)

            if label_ids is not None:
                enc = self.model.encode(
                    self.params, pick(images), pick(label_ids)
                )
            else:
                enc = self.model.encode(self.params, pick(images))
            if pad:
                enc = jax.tree.map(lambda x: x[: len(chunk)], enc)
            self._append_stacked(chunk, enc)
            if pil_images is not None:
                for j, tid in enumerate(chunk):
                    img = pil_images[start + j]
                    if hasattr(img, "load"):
                        img.load()  # see add_template: render-thread safety
                    self._images[tid] = img
                self._images_version += 1

    def _append_stacked(self, ids, enc):
        for j, tid in enumerate(ids):
            # a re-added id points at its FRESH rows (the stale rows stay
            # allocated but unreferenced — refreshes are rare); row ids
            # count all appended rows, never dict size, so later
            # templates cannot collide with a refreshed one
            self._row[tid] = self._n_rows + j
        self._n_rows += len(ids)
        self._pending.append(enc)

    def _consolidate(self):
        if self._pending:
            trees = self._pending if self._stacked is None else \
                [self._stacked] + self._pending
            self._stacked = trees[0] if len(trees) == 1 else jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *trees)
            self._pending = []
            self._sharded_store = None  # rebuilt lazily below

    def _store_view(self):
        """Device view of the stacked store the gathers read from. With
        a mesh: rows sharded over the ``data`` axis (each chip holds 1/N
        of the template features; rows padded up to a multiple of the
        axis — pad rows are never indexed since ``_row`` indices count
        real rows only). NamedSharding, not shard_map, so the jitted
        request gather is free to move rows between chips."""
        if self.mesh is None:
            return self._stacked
        if getattr(self, "_sharded_store", None) is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n = self._data_size

            def shard_rows(x):
                pad = -x.shape[0] % n
                if pad:
                    x = jnp.concatenate(
                        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
                return jax.device_put(
                    x, NamedSharding(
                        self.mesh, P("data", *([None] * (x.ndim - 1)))))

            self._sharded_store = jax.tree.map(shard_rows, self._stacked)
            self._gather_fn = None  # store structure changed; re-close
        return self._sharded_store

    def _stack_features(self, ids):
        self._consolidate()
        idx = jnp.asarray([self._row[tid] for tid in ids], jnp.int32)
        store = self._store_view()
        if self.mesh is None:
            return jax.tree.map(
                lambda x: jnp.take(x, idx, axis=0), store)
        # cross-chip gather: store rows live on their home chips; the
        # request batch comes out data-sharded, ready for dp_generate.
        # One jitted executable per request-batch shape (= per bucket).
        if self._gather_fn is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            out_sh = jax.tree.map(
                lambda x: NamedSharding(
                    self.mesh, P("data", *([None] * (x.ndim - 1)))),
                store)
            self._gather_fn = jax.jit(
                lambda s, i: jax.tree.map(
                    lambda x: jnp.take(x, i, axis=0), s),
                out_shardings=out_sh)
        return self._gather_fn(store, idx)

    # -- generation ----------------------------------------------------------
    def generate_captions(self, template_ids, key=None, pad_to=None,
                          **generate_kwargs):
        """Generates one caption text per entry of ``template_ids``
        (repeat ids to get multiple captions per template).

        ``pad_to``: pad the request up to this batch size by repeating
        the last row (results are sliced back). Callers chunking a large
        sweep should pass their chunk size so the TAIL chunk reuses the
        compiled executable instead of triggering a fresh compile.
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        n = len(template_ids)
        ids = list(template_ids)
        if pad_to is not None:
            if pad_to % self._data_size:
                raise ValueError(
                    f"pad_to={pad_to} must be a multiple of the mesh "
                    f"data-axis size {self._data_size}")
            if n < pad_to:
                ids = ids + [ids[-1]] * (pad_to - n)
        elif len(ids) % self._data_size:
            # dp_generate splits the batch evenly over the data axis —
            # round a ragged request up to the next shardable size
            ids = ids + [ids[-1]] * (-len(ids) % self._data_size)
        enc = self._stack_features(ids)
        if self.mesh is not None:
            from deephumor_tpu.parallel import dp_generate

            result = dp_generate(
                self.model, self.params, enc, self.mesh, key=key,
                **generate_kwargs)
        else:
            result = self.model.generate_from_emb(
                self.params, enc, key=key, **generate_kwargs
            )
        seqs = np.asarray(result["chosen"])[:n]
        return [
            seq_to_text(seq, self.vocab, delimiter=self.delimiter)
            for seq in seqs
        ]

    def _render_pool(self):
        """Persistent process pool, rebuilt when the template images
        change (workers snapshot the images at creation)."""
        if self._proc_pool_version != self._images_version:
            if self._proc_pool is not None:
                self._proc_pool.shutdown(wait=False)
            import multiprocessing

            snapshot = {
                tid: (img.mode, img.size, img.tobytes())
                for tid, img in self._images.items()
            }
            # spawn children re-import this module, and the package
            # import's compile-cache gate probes jax.default_backend()
            # when no platform is pinned — on a PJRT-plugin TPU host
            # that would initialize (and contend) the device backend in
            # every render worker. Children inherit the env at spawn;
            # the parent's gate already ran at its own import, so this
            # only affects subprocesses.
            os.environ["DEEPHUMOR_SKIP_JAX_CACHE"] = "1"
            self._proc_pool = ProcessPoolExecutor(
                self.render_processes,
                mp_context=multiprocessing.get_context("spawn"),
                initializer=_render_proc_init,
                initargs=(snapshot, self.font_path),
            )
            self._proc_pool_version = self._images_version
        return self._proc_pool

    def warm_render_pool(self):
        """Pre-spawns the render process pool (no-op for threads).

        Pool creation is otherwise lazy: the first ``generate_memes*``
        call pays worker spawn plus the template-image snapshot transfer
        (~100 MB for 300 templates). Serving setups (and benchmarks)
        call this once after ``add_templates`` to move that cost out of
        the request path. Returns only once every worker has finished
        its initializer (spawn import + snapshot decode): warm tasks
        report worker pids, and batches are resubmitted until all
        ``render_processes`` distinct workers have answered (executor
        tasks are not distributed one-per-worker, so a single submit
        round proves nothing about the slower workers).
        """
        if not self.render_processes or not self._images:
            return
        pool = self._render_pool()
        seen = set()
        for _ in range(64):  # bounded; normally 1-3 rounds
            futs = [pool.submit(_render_proc_warm, 0.01)
                    for _ in range(self.render_processes - len(seen))]
            seen.update(f.result() for f in futs)
            if len(seen) >= self.render_processes:
                return

    def close(self):
        """Shuts the process render pool down (no-op for threads)."""
        if self._proc_pool is not None:
            self._proc_pool.shutdown(wait=True)
            self._proc_pool = None
            self._proc_pool_version = -1

    @staticmethod
    def _from_raw(rendered):
        tid, text, raw = rendered
        if raw is None:
            return tid, text, None
        from PIL import Image

        mode, size, data = raw
        return tid, text, Image.frombytes(mode, size, data)

    def _render_one(self, tid, text):
        top, bottom = split_caption(text, num_blocks=2)
        img = self._images.get(tid)
        if img is None:
            return tid, text, None
        return tid, text, memeify_image(
            img, top=top, bottom=bottom, font_path=self.font_path
        )

    def generate_memes(self, template_ids, key=None, **generate_kwargs):
        """Full path: captions + parallel host-side rendering.

        Returns list of (template_id, caption_text, PIL image | None).
        """
        texts = self.generate_captions(template_ids, key, **generate_kwargs)
        if self.render_processes:
            pool = self._render_pool()
            futs = [pool.submit(_render_proc_one, tid, text)
                    for tid, text in zip(template_ids, texts)]
            return [self._from_raw(f.result()) for f in futs]
        with ThreadPoolExecutor(self.render_workers) as pool:
            return list(
                pool.map(lambda a: self._render_one(*a),
                         zip(template_ids, texts))
            )

    def generate_memes_batched(self, template_ids, batch_size=256,
                               key=None, **generate_kwargs):
        """Large sweeps: device generation of batch N+1 OVERLAPS host-side
        rendering of batch N (renders run on the thread pool while the
        next `generate_captions` call keeps the TPU busy; every batch is
        padded to one compiled shape).

        Returns list of (template_id, caption_text, PIL image | None) in
        input order.
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        ids = list(template_ids)
        futures = []
        if self.render_processes:
            pool = self._render_pool()
            for start in range(0, len(ids), batch_size):
                chunk = ids[start:start + batch_size]
                texts = self.generate_captions(
                    chunk, key=jax.random.fold_in(key, start),
                    pad_to=batch_size, **generate_kwargs,
                )
                futures.extend(
                    pool.submit(_render_proc_one, tid, text)
                    for tid, text in zip(chunk, texts)
                )
            return [self._from_raw(f.result()) for f in futures]
        with ThreadPoolExecutor(self.render_workers) as pool:
            for start in range(0, len(ids), batch_size):
                chunk = ids[start:start + batch_size]
                texts = self.generate_captions(
                    chunk, key=jax.random.fold_in(key, start),
                    pad_to=batch_size, **generate_kwargs,
                )
                futures.extend(
                    pool.submit(self._render_one, tid, text)
                    for tid, text in zip(chunk, texts)
                )
            return [f.result() for f in futures]

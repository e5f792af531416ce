"""Dynamic-batching serving layer tests (CPU, tiny model)."""

import threading

import numpy as np
import pytest
from PIL import Image

import jax

from deephumor_tpu.data import Vocab
from deephumor_tpu.models import CaptioningTransformerBase
from deephumor_tpu.pipeline import MemeGenerationPipeline
from deephumor_tpu.serving import DynamicBatcher

GEN = dict(max_len=6, beam_size=2, top_k=5)


@pytest.fixture(scope="module")
def pipe():
    vocab = Vocab(["when", "you", "ship", "it", "works", "and", "bug"])
    model = CaptioningTransformerBase(
        num_tokens=len(vocab), hid_dim=16, n_layers=1, n_heads=4,
        pf_dim=24, max_len=16, enc_dropout=0.0, dec_dropout=0.0,
    )
    params = model.init(jax.random.PRNGKey(0))
    p = MemeGenerationPipeline(model, params, vocab)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    pils = [Image.new("RGB", (80, 60), (40, 80, 120)) for _ in range(3)]
    p.add_templates(["a", "b", "c"], images, pil_images=pils)
    return p


def test_concurrent_submits_coalesce(pipe):
    """17 requests from 8 threads: all resolve, and the collector forms
    multi-request batches instead of one dispatch per request."""
    with DynamicBatcher(pipe, max_batch=6, max_wait_ms=60, **GEN) as srv:
        ids = [("a", "b", "c")[i % 3] for i in range(17)]
        futs = [None] * len(ids)

        def submit(lo, hi):
            for i in range(lo, hi):
                futs[i] = srv.submit(ids[i])

        threads = [threading.Thread(target=submit,
                                    args=(i * 3, min(len(ids), i * 3 + 3)))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        texts = [f.result(timeout=120) for f in futs]
        assert all(isinstance(t, str) for t in texts)
        assert srv.requests_served == 17
        # ceil(17/6)=3 minimum; coalescing must beat one-per-request
        assert 3 <= srv.batches_dispatched < 17


def test_sequential_determinism(pipe):
    """Same key + same arrival order => identical results (each batch
    key is fold_in(base, batch_seq))."""
    runs = []
    for _ in range(2):
        with DynamicBatcher(pipe, max_batch=8, max_wait_ms=200,
                            key=jax.random.PRNGKey(7), **GEN) as srv:
            futs = [srv.submit(t) for t in ("a", "b", "c", "a", "b")]
            runs.append([f.result(timeout=120) for f in futs])
    assert runs[0] == runs[1]


def test_render_mode(pipe):
    with DynamicBatcher(pipe, max_batch=4, max_wait_ms=50, render=True,
                        **GEN) as srv:
        text, img = srv.submit("b").result(timeout=120)
    assert isinstance(text, str)
    assert img is not None and img.size == (80, 60)


def test_failed_batch_does_not_kill_server(pipe):
    """An unknown template fails its OWN future at submit() (it never
    joins a batch); the collector keeps serving."""
    with DynamicBatcher(pipe, max_batch=4, max_wait_ms=30, **GEN) as srv:
        bad = srv.submit("nope")
        good = srv.submit("a")
        with pytest.raises(KeyError):
            bad.result(timeout=120)
        # the good request concurrent with the bad one is unaffected
        assert isinstance(good.result(timeout=120), str)
        assert srv.requests_served == 1  # bad never dispatched


def test_close_rejects_and_drains(pipe):
    srv = DynamicBatcher(pipe, max_batch=4, max_wait_ms=30, **GEN)
    fut = srv.submit("c")
    srv.close()
    assert isinstance(fut.result(timeout=120), str)
    with pytest.raises(RuntimeError):
        srv.submit("a")


def test_http_server_end_to_end():
    """examples/serve.py --synthetic: /caption, /meme and /healthz
    answer over real HTTP through the dynamic batcher."""
    import io
    import json
    import sys
    import urllib.request

    sys.path.insert(0, "examples")
    try:
        import serve as serve_mod
    finally:
        sys.path.pop(0)

    ev = threading.Event()
    t = threading.Thread(
        target=serve_mod.main,
        kwargs=dict(argv=["--synthetic", "--port", "0",
                          "--max-batch", "4", "--max-wait-ms", "20"],
                    ready_event=ev),
        daemon=True)
    t.start()
    assert ev.wait(timeout=600), "server failed to come up"
    port = ev.httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"

    txt = urllib.request.urlopen(f"{base}/caption?template=one",
                                 timeout=120).read().decode()
    assert txt  # some caption text
    png = urllib.request.urlopen(f"{base}/meme?template=two",
                                 timeout=120).read()
    img = Image.open(io.BytesIO(png))
    assert img.size == (400, 300)
    health = json.loads(urllib.request.urlopen(
        f"{base}/healthz", timeout=30).read())
    assert health["ok"] and health["requests"] >= 2
    # batch route (submit_many): repeated params, per-id failure in JSON
    rows = json.loads(urllib.request.urlopen(
        f"{base}/captions?template=one&template=zzz&template=two",
        timeout=120).read())
    assert [r["template"] for r in rows] == ["one", "zzz", "two"]
    assert "caption" in rows[0] and "caption" in rows[2]
    assert rows[1].get("error") == "unknown template"
    import urllib.error
    try:
        urllib.request.urlopen(f"{base}/caption?template=zzz", timeout=120)
        assert False, "unknown template must 404/500"
    except urllib.error.HTTPError as e:
        assert e.code in (404, 500)
    ev.httpd.shutdown()


def test_open_loop_load_harness(pipe):
    """benchmarks/serving_load.run_load: open-loop Poisson arrivals
    through the batcher — every request resolves, latency is measured
    from the SCHEDULED arrival (queueing counts), and the batch-size
    telemetry covers exactly the requests of the window."""
    from benchmarks.serving_load import run_load

    with DynamicBatcher(pipe, max_batch=4, max_wait_ms=10, **GEN) as srv:
        # warm the padded executable so the load window measures steady
        # state, mirroring measure_serving_load
        for f in [srv.submit("a") for _ in range(4)]:
            f.result(timeout=300)
        srv.batch_sizes.clear()
        r = run_load(srv, ["a", "b", "c"], rate_rps=30.0, duration_s=1.0,
                     seed=3)
    assert r["n_requests"] >= 1
    assert r["latency_ms"]["p50"] > 0
    assert r["latency_ms"]["p99"] >= r["latency_ms"]["p50"]
    bh = r["batch_sizes"]
    assert bh["n_batches"] >= 1 and 1 <= bh["min"] <= bh["max"] <= 4


class TestBuckets:
    """Bucketed padding: pad each dispatch to the smallest compiled
    bucket that fits instead of always max_batch."""

    def test_auto_ladder(self, pipe):
        srv = DynamicBatcher(pipe, max_batch=256, **GEN)
        assert srv.buckets == (256,)
        srv.close()
        srv = DynamicBatcher(pipe, max_batch=256, buckets="auto", **GEN)
        assert srv.buckets == (16, 32, 64, 128, 256)
        srv.close()
        srv = DynamicBatcher(pipe, max_batch=6, buckets="auto", **GEN)
        assert srv.buckets == (6,)
        srv.close()

    def test_explicit_ladder_appends_max_batch(self, pipe):
        srv = DynamicBatcher(pipe, max_batch=8, buckets=[2, 4], **GEN)
        assert srv.buckets == (2, 4, 8)
        srv.close()

    def test_invalid_buckets_raise(self, pipe):
        with pytest.raises(ValueError):
            DynamicBatcher(pipe, max_batch=4, buckets=[8], **GEN)
        with pytest.raises(ValueError):
            DynamicBatcher(pipe, max_batch=4, buckets=[], **GEN)
        with pytest.raises(ValueError):
            DynamicBatcher(pipe, max_batch=4, buckets=[0, 2], **GEN)
        with pytest.raises(ValueError, match="sequence of ints"):
            # a numeric string would otherwise iterate per-character
            DynamicBatcher(pipe, max_batch=256, buckets="128", **GEN)

    def test_warmup_without_templates_raises(self):
        from deephumor_tpu.data import Vocab
        from deephumor_tpu.models import CaptioningTransformerBase

        vocab = Vocab(["x"])
        model = CaptioningTransformerBase(
            num_tokens=len(vocab), hid_dim=16, n_layers=1, n_heads=4,
            pf_dim=24, max_len=16)
        empty = MemeGenerationPipeline(
            model, model.init(jax.random.PRNGKey(0)), vocab)
        srv = DynamicBatcher(empty, max_batch=4, **GEN)
        try:
            with pytest.raises(RuntimeError, match="registered template"):
                srv.warmup()
        finally:
            srv.close()

    def test_dispatch_pads_to_smallest_fitting_bucket(self, pipe):
        with DynamicBatcher(pipe, max_batch=8, buckets=[2, 8],
                            max_wait_ms=200, **GEN) as srv:
            srv.warmup()  # compiles both buckets
            fut = srv.submit("a")  # lone request -> bucket 2
            assert isinstance(fut.result(timeout=300), str)
            # burst of 5 -> bucket 8 (single collector wait window)
            futs = [srv.submit(t) for t in ("a", "b", "c", "a", "b")]
            for f in futs:
                f.result(timeout=300)
            assert srv.pad_sizes[0] == 2
            assert all(p in (2, 8) for p in srv.pad_sizes)
            assert all(p >= n for p, n in
                       zip(srv.pad_sizes, srv.batch_sizes))
            assert any(p == 8 for p in srv.pad_sizes[1:])

    def test_bucketed_determinism(self, pipe):
        """Same key + same arrival order => identical results with
        buckets on (pad size is a deterministic function of batch)."""
        runs = []
        for _ in range(2):
            with DynamicBatcher(pipe, max_batch=8, buckets=[2, 8],
                                max_wait_ms=200,
                                key=jax.random.PRNGKey(7), **GEN) as srv:
                futs = [srv.submit(t) for t in ("a", "b", "c", "a")]
                runs.append([f.result(timeout=300) for f in futs])
        assert runs[0] == runs[1]


# ---------------------------------------------------------------------------
# Bucket hysteresis (VERDICT r3 #6)
# ---------------------------------------------------------------------------

class TestBucketHysteresis:
    def _srv(self, pipe, **kw):
        return DynamicBatcher(pipe, max_batch=8, buckets=[2, 8],
                              hysteresis=3, **GEN, **kw)

    def test_pads_to_recent_average_not_this_batch(self, pipe):
        srv = self._srv(pipe)
        try:
            choose = srv._choose_bucket
            # steady small batches: settles in the small bucket
            assert choose(1) == 2
            assert choose(2) == 2
            # sustained large batches pull the EWMA up; a later batch
            # that happens to fit the small bucket still pads to the
            # EWMA bucket (this is the anti-oscillation behavior)
            for _ in range(4):
                assert choose(7) == 8
            assert srv._n_ewma > 2
            assert choose(1) == 8
            # sustained small batches decay the EWMA back down
            for _ in range(12):
                choose(1)
            assert choose(1) == 2
        finally:
            srv.close()

    def test_overflow_always_dispatches_at_true_fit(self, pipe):
        srv = self._srv(pipe)
        try:
            for _ in range(8):
                srv._choose_bucket(1)  # EWMA pinned low
            # a burst bigger than the EWMA bucket must dispatch at its
            # real fit immediately (no queue-building commitment)
            assert srv._choose_bucket(6) == 8
        finally:
            srv.close()

    def test_hysteresis_zero_restores_raw_policy(self, pipe):
        with DynamicBatcher(pipe, max_batch=8, buckets=[2, 8],
                            hysteresis=0, max_wait_ms=200, **GEN) as srv:
            futs = [srv.submit(t) for t in ("a", "b", "c", "a", "b")]
            for f in futs:
                f.result(timeout=300)
            assert srv.pad_sizes[0] == 8
            fut = srv.submit("a")
            fut.result(timeout=300)
            assert srv.pad_sizes[-1] == 2  # no damping: drops immediately


# ---------------------------------------------------------------------------
# Mesh-composed serving (VERDICT r3 #1): pipeline + batcher over 8 devices
# ---------------------------------------------------------------------------

class TestMeshServing:
    @pytest.fixture(scope="class")
    def model_params_vocab(self):
        vocab = Vocab(["when", "you", "ship", "it", "works", "and", "bug"])
        model = CaptioningTransformerBase(
            num_tokens=len(vocab), hid_dim=16, n_layers=1, n_heads=4,
            pf_dim=24, max_len=16, enc_dropout=0.0, dec_dropout=0.0,
        )
        params = model.init(jax.random.PRNGKey(0))
        return model, params, vocab

    def _mk_pipe(self, model_params_vocab, mesh=None, n_templates=5):
        model, params, vocab = model_params_vocab
        p = MemeGenerationPipeline(model, params, vocab, mesh=mesh)
        rng = np.random.default_rng(0)
        images = rng.normal(
            size=(n_templates, 32, 32, 3)).astype(np.float32)
        pils = [Image.new("RGB", (80, 60), (40, 80, 120))
                for _ in range(n_templates)]
        ids = [f"t{i}" for i in range(n_templates)]
        p.add_templates(ids, images, pil_images=pils)
        return p, ids

    def test_greedy_token_equality_vs_single_device(
            self, model_params_vocab):
        """The mesh-composed pipeline (row-sharded feature store +
        dp_generate decode) must produce the SAME captions as the
        single-device pipeline in greedy mode."""
        from deephumor_tpu.parallel import make_mesh

        mesh = make_mesh(model=1)
        assert mesh.shape["data"] == 8
        gen = dict(max_len=6, beam_size=2, top_k=5, greedy=True)
        plain, ids = self._mk_pipe(model_params_vocab)
        sharded, _ = self._mk_pipe(model_params_vocab, mesh=mesh)
        req = [ids[i % len(ids)] for i in range(16)]
        key = jax.random.PRNGKey(3)
        want = plain.generate_captions(req, key=key, **gen)
        got = sharded.generate_captions(req, key=key, **gen)
        assert want == got
        # ragged request: auto-pads to a shardable size, slices back
        got7 = sharded.generate_captions(req[:7], key=key, **gen)
        assert got7 == want[:7]

    def test_mesh_pipeline_rejects_model_axis(self, model_params_vocab):
        from deephumor_tpu.parallel import make_mesh

        model, params, vocab = model_params_vocab
        mesh = make_mesh(model=2)
        with pytest.raises(ValueError, match="pure data-parallel"):
            MemeGenerationPipeline(model, params, vocab, mesh=mesh)

    def test_feature_store_is_row_sharded(self, model_params_vocab):
        from deephumor_tpu.parallel import make_mesh

        mesh = make_mesh(model=1)
        pipe, ids = self._mk_pipe(model_params_vocab, mesh=mesh)
        pipe.generate_captions(ids[:8], max_len=4, beam_size=2, top_k=5)
        store = pipe._store_view()
        leaves = jax.tree.leaves(store)
        assert leaves, "empty store"
        for x in leaves:
            assert x.shape[0] % 8 == 0  # padded to the data axis
            names = {n for s in x.sharding.spec if s
                     for n in ((s,) if isinstance(s, str) else s)}
            assert "data" in names, f"store leaf not sharded: {x.sharding}"

    def test_batcher_over_mesh_pipeline(self, model_params_vocab):
        """The full serving stack — DynamicBatcher buckets + sharded
        feature store + dp_generate — over the 8-virtual-device mesh."""
        from deephumor_tpu.parallel import make_mesh

        mesh = make_mesh(model=1)
        pipe, ids = self._mk_pipe(model_params_vocab, mesh=mesh)
        with DynamicBatcher(pipe, max_batch=16, buckets="auto",
                            max_wait_ms=60, **GEN) as srv:
            assert all(b % 8 == 0 for b in srv.buckets)
            srv.warmup()
            futs = [srv.submit(ids[i % len(ids)]) for i in range(21)]
            texts = [f.result(timeout=600) for f in futs]
        assert len(texts) == 21
        assert all(isinstance(t, str) for t in texts)
        assert all(p % 8 == 0 for p in srv.pad_sizes)

    def test_batcher_rejects_unshardable_buckets(self, model_params_vocab):
        from deephumor_tpu.parallel import make_mesh

        mesh = make_mesh(model=1)
        pipe, _ = self._mk_pipe(model_params_vocab, mesh=mesh)
        with pytest.raises(ValueError, match="data-axis"):
            DynamicBatcher(pipe, max_batch=16, buckets=[4], **GEN)
        with pytest.raises(ValueError, match="data-axis"):
            DynamicBatcher(pipe, max_batch=12, **GEN)

    def test_mesh_render_path(self, model_params_vocab):
        """generate_memes composes the mesh decode with host rendering."""
        from deephumor_tpu.parallel import make_mesh

        mesh = make_mesh(model=1)
        pipe, ids = self._mk_pipe(model_params_vocab, mesh=mesh)
        out = pipe.generate_memes(ids[:3], max_len=6, beam_size=2, top_k=5)
        assert len(out) == 3
        for tid, text, img in out:
            assert isinstance(text, str)
            assert img is not None and img.size == (80, 60)


class TestSubmitMany:
    """Batch submission API (round 5): one queue hop per client batch,
    same dispatch semantics as per-request submit."""

    def test_results_match_submit(self, pipe):
        ids = [("a", "b", "c")[i % 3] for i in range(9)]
        with DynamicBatcher(pipe, max_batch=16, max_wait_ms=40,
                            key=jax.random.PRNGKey(3), **GEN) as srv:
            texts_many = [f.result(timeout=120)
                          for f in srv.submit_many(ids)]
        with DynamicBatcher(pipe, max_batch=16, max_wait_ms=40,
                            key=jax.random.PRNGKey(3), **GEN) as srv:
            futs = [srv.submit(t) for t in ids]
            texts_one = [f.result(timeout=120) for f in futs]
        assert texts_many == texts_one

    def test_oversized_batch_spills_in_order(self, pipe):
        # 11 requests through max_batch=4: 3 dispatches, all resolve,
        # order preserved
        ids = [("a", "b", "c")[i % 3] for i in range(11)]
        with DynamicBatcher(pipe, max_batch=4, max_wait_ms=5,
                            **GEN) as srv:
            texts = [f.result(timeout=120) for f in srv.submit_many(ids)]
            assert len(texts) == 11
            assert srv.requests_served == 11
            assert srv.batches_dispatched >= 3
            assert all(n <= 4 for n in srv.batch_sizes)

    def test_unknown_ids_fail_their_own_future(self, pipe):
        with DynamicBatcher(pipe, max_batch=8, max_wait_ms=5,
                            **GEN) as srv:
            futs = srv.submit_many(["a", "nope", "b"])
            assert isinstance(futs[0].result(timeout=120), str)
            with pytest.raises(KeyError):
                futs[1].result(timeout=120)
            assert isinstance(futs[2].result(timeout=120), str)

    def test_spill_drains_on_close(self, pipe):
        srv = DynamicBatcher(pipe, max_batch=2, max_wait_ms=5, **GEN)
        futs = srv.submit_many([("a", "b", "c")[i % 3]
                                for i in range(7)])
        srv.close(timeout=120)
        texts = [f.result(timeout=5) for f in futs]
        assert len(texts) == 7

"""Serving pipeline + profiling + orbax utility tests."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from deephumor_tpu.data import Vocab
from deephumor_tpu.models import CaptioningTransformerBase
from deephumor_tpu.pipeline import MemeGenerationPipeline

VOCAB_WORDS = ["when", "you", "ship", "it", "works", "and", "bug"]


@pytest.fixture(scope="module")
def setup():
    vocab = Vocab(VOCAB_WORDS)
    model = CaptioningTransformerBase(
        num_tokens=len(vocab), hid_dim=16, n_layers=1, n_heads=4, pf_dim=24,
        max_len=16, enc_dropout=0.0, dec_dropout=0.0,
    )
    params = model.init(jax.random.PRNGKey(0))
    return model, params, vocab


def test_pipeline_end_to_end(setup):
    model, params, vocab = setup
    pipe = MemeGenerationPipeline(model, params, vocab)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    pils = [Image.new("RGB", (200, 150), (90, 110, 130)) for _ in range(3)]
    pipe.add_templates(["a", "b", "c"], images, pil_images=pils)
    assert set(pipe._row) == {"a", "b", "c"}

    # 2 captions per template via repeated ids
    ids = ["a", "a", "b", "b", "c", "c"]
    results = pipe.generate_memes(
        ids, key=jax.random.PRNGKey(1), max_len=8, beam_size=2, top_k=5,
    )
    assert len(results) == 6
    for tid, text, img in results:
        assert isinstance(text, str)
        assert img is not None and img.size == (200, 150)


def test_pipeline_caption_only(setup):
    model, params, vocab = setup
    pipe = MemeGenerationPipeline(model, params, vocab)
    pipe.add_template("x", np.zeros((32, 32, 3), np.float32))
    texts = pipe.generate_captions(
        ["x"], key=jax.random.PRNGKey(0), max_len=8, beam_size=2, top_k=5
    )
    assert len(texts) == 1


def test_profiling_benchmark():
    from deephumor_tpu.utils.profiling import Timer, benchmark

    f = jax.jit(lambda x: x * 2 + 1)
    stats = benchmark(f, jnp.ones((128, 128)), iters=3)
    assert stats["mean_s"] > 0 and stats["iters"] == 3

    timer = Timer()
    with timer.section("work") as sec:
        sec.result = f(jnp.ones((8, 8)))
    s = timer.summary()
    assert "work" in s and s["work"]["count"] == 1


def test_orbax_roundtrip(tmp_path):
    from deephumor_tpu.utils.checkpoint import (
        latest_step,
        restore_orbax,
        save_orbax,
    )

    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.int32(7),
    }
    save_orbax(str(tmp_path / "ckpt"), state, step=7)
    save_orbax(str(tmp_path / "ckpt"), state, step=9)
    assert latest_step(str(tmp_path / "ckpt")) == 9
    restored, step = restore_orbax(str(tmp_path / "ckpt"))
    assert step == 9
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3)
    )


def test_pipeline_labels_model():
    """The labels-conditioned family serves through the pipeline with
    per-template label tokens baked into the cached features."""
    from deephumor_tpu.models import CaptioningLSTMWithLabels

    vocab = Vocab(VOCAB_WORDS)
    model = CaptioningLSTMWithLabels(
        num_tokens=len(vocab), emb_dim=16, hidden_size=16, num_layers=1
    )
    params = model.init(jax.random.PRNGKey(0))
    pipe = MemeGenerationPipeline(model, params, vocab)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    label_ids = rng.integers(6, len(vocab), (2, 4)).astype(np.int32)
    pipe.add_templates(["a", "b"], images, label_ids=label_ids)

    texts = pipe.generate_captions(
        ["a", "b", "a"], key=jax.random.PRNGKey(1), max_len=8, beam_size=2,
        top_k=5,
    )
    assert len(texts) == 3


@pytest.mark.parametrize("procs", [0, 2])
def test_generate_memes_batched_overlap(setup, procs):
    # batched driver: results in input order, one per request, rendering
    # overlapped with next-batch generation; identical through the
    # thread pool (procs=0) and the spawn process pool (the bench's
    # multi-core e2e path)
    model, params, vocab = setup
    pipe = MemeGenerationPipeline(model, params, vocab,
                                  render_processes=procs)
    rng = np.random.default_rng(2)
    images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    pils = [Image.new("RGB", (120, 90), (30, 60, 90)) for _ in range(2)]
    pipe.add_templates(["a", "b"], images, pil_images=pils)
    pipe.warm_render_pool()
    ids = ["a", "b"]
    work = [ids[i % len(ids)] for i in range(7)]
    out = pipe.generate_memes_batched(
        work, batch_size=3, key=jax.random.PRNGKey(5), max_len=6,
        beam_size=2, top_k=4,
    )
    pipe.close()
    assert len(out) == 7
    assert [tid for tid, _, _ in out] == work
    for tid, text, img in out:
        assert isinstance(text, str)
        assert img is not None and img.size == (120, 90)


def test_template_refresh_keeps_rows_consistent(setup):
    # re-adding an existing template must not corrupt later row indices
    # (regression: row ids derived from dict size collided after refresh)
    model, params, vocab = setup
    pipe = MemeGenerationPipeline(model, params, vocab)
    rng = np.random.default_rng(5)

    def mk_img(i):
        return rng.normal(size=(32, 32, 3)).astype(np.float32)

    pipe.add_template("a", mk_img(0))
    pipe.add_template("b", mk_img(1))
    refreshed = mk_img(2)
    pipe.add_template("a", refreshed)  # refresh
    pipe.add_template("c", mk_img(3))
    feats = pipe._stack_features(["a", "b", "c"])
    leaf = jax.tree.leaves(feats)[0]
    assert leaf.shape[0] == 3
    rows = {tid: pipe._row[tid] for tid in "abc"}
    assert len(set(rows.values())) == 3, rows
    # the refreshed template serves its NEW features
    want = jax.tree.leaves(
        pipe.model.encode(pipe.params, jnp.asarray(refreshed)[None]))[0]
    got = jax.tree.leaves(pipe._stack_features(["a"]))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6)


def test_save_params_npz_suffix_roundtrip(tmp_path):
    # save_params('x.npz') must write the hp sidecar where load_params
    # looks for it (regression: sidecar landed at x.npz.json, hp lost)
    from deephumor_tpu.utils.pytree import load_params, save_params

    params = {"a": {"w": np.ones((2, 2), np.float32)}}
    for name in ("m.npz", "m2"):
        path = str(tmp_path / name)
        save_params(path, params, hp={"hid": 4})
        loaded, hp = load_params(path)
        assert hp == {"hid": 4}, (name, hp)
        np.testing.assert_array_equal(loaded["a"]["w"], params["a"]["w"])


def test_process_pool_render_matches_threads(setup):
    """render_processes=2: spawn-pool rendering must produce images
    pixel-identical to the in-process thread path."""
    model, params, vocab = setup
    rng = np.random.default_rng(7)
    images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    pils = [Image.new("RGB", (200, 150), (90, 110, 130)) for _ in range(2)]

    results = {}
    for procs in (0, 2):
        pipe = MemeGenerationPipeline(model, params, vocab,
                                      render_processes=procs)
        pipe.add_templates(["a", "b"], images, pil_images=pils)
        # warm is a no-op for threads, pre-spawns workers for procs;
        # either way the rendered output must be unaffected
        pipe.warm_render_pool()
        out = pipe.generate_memes(
            ["a", "b"], key=jax.random.PRNGKey(3), max_len=8,
            beam_size=2, top_k=5)
        results[procs] = out
        pipe.close()
    for (t0, x0, i0), (t1, x1, i1) in zip(results[0], results[2]):
        assert t0 == t1 and x0 == x1
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

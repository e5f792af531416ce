"""Trainer, metrics, and data-layer tests."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deephumor_tpu.data import Vocab, WordPunctTokenizer
from deephumor_tpu.data.dataloaders import BatchIterator, pad_collate
from deephumor_tpu.data.datasets import MemeDataset
from deephumor_tpu.experiments.metrics import masked_cross_entropy, perplexity
from deephumor_tpu.experiments.trainer import Trainer, frozen_mask
from deephumor_tpu.models import CaptioningLSTM

VOCAB = 24


class TestMetricsParity:
    def test_perplexity_vs_torch_formula(self):
        # oracle = the reference formula (metrics.py:4-9) in torch
        g = torch.Generator().manual_seed(0)
        logits_t = torch.randn(3, 5, VOCAB, generator=g)
        targets_t = torch.randint(1, VOCAB, (3, 5), generator=g)
        targets_t[0, 3:] = 0  # pads
        lengths_t = (targets_t != 0).sum(dim=1)

        log_values = (
            logits_t.log_softmax(-1)
            .gather(-1, targets_t.unsqueeze(-1))
            .squeeze(-1)
        )
        log_values = log_values / lengths_t.unsqueeze(1)
        log_values[targets_t == 0] = 0.0
        ref = (-log_values.sum(dim=-1)).exp().mean()

        out = perplexity(
            jnp.asarray(logits_t.numpy()),
            jnp.asarray(targets_t.numpy()),
            jnp.asarray(lengths_t.numpy()),
        )
        np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)

    def test_masked_ce_vs_torch(self):
        g = torch.Generator().manual_seed(1)
        logits_t = torch.randn(2, 4, VOCAB, generator=g)
        targets_t = torch.randint(1, VOCAB, (2, 4), generator=g)
        targets_t[1, 2:] = 0
        mask = targets_t != 0
        ref = torch.nn.functional.cross_entropy(
            logits_t[mask], targets_t[mask]
        )
        out = masked_cross_entropy(
            jnp.asarray(logits_t.numpy()), jnp.asarray(targets_t.numpy())
        )
        np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_model():
    return CaptioningLSTM(
        num_tokens=VOCAB, emb_dim=16, hidden_size=16, num_layers=1,
        enc_dropout=0.1, dec_dropout=0.0,
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    captions = rng.integers(6, VOCAB, (4, 7)).astype(np.int32)
    captions[:, -1] = 3  # EOS
    captions[2, 4:] = 0  # pads
    return {
        "captions": captions,
        "images": rng.normal(size=(4, 32, 32, 3)).astype(np.float32),
        "labels": rng.integers(6, VOCAB, (4, 3)).astype(np.int32),
    }


class TestTrainer:
    def test_loss_decreases(self, tiny_model, batch, tmp_path):
        trainer = Trainer(
            tiny_model, "t", log_dir=str(tmp_path), learning_rate=1e-2,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        trainer._build_steps()
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(8):
            rng, sub = jax.random.split(rng)
            state, metrics = trainer._train_step(state, batch, sub)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        assert int(state["step"]) == 8
        trainer.close()

    def test_frozen_resnet_not_updated(self, tiny_model, batch, tmp_path):
        trainer = Trainer(tiny_model, "t", log_dir=str(tmp_path))
        state = trainer.init_state(jax.random.PRNGKey(0))
        trainer._build_steps()
        before = np.asarray(
            state["params"]["encoder"]["resnet"]["conv1"]["kernel"]
        ).copy()
        head_before = np.asarray(
            state["params"]["encoder"]["linear"]["kernel"]
        ).copy()
        state, _ = trainer._train_step(state, batch, jax.random.PRNGKey(2))
        after = np.asarray(
            state["params"]["encoder"]["resnet"]["conv1"]["kernel"]
        )
        head_after = np.asarray(state["params"]["encoder"]["linear"]["kernel"])
        np.testing.assert_array_equal(before, after)
        assert (head_before != head_after).any()
        trainer.close()

    def test_bn_stats_advance_in_train(self, tiny_model, batch, tmp_path):
        trainer = Trainer(tiny_model, "t", log_dir=str(tmp_path))
        state = trainer.init_state(jax.random.PRNGKey(0))
        trainer._build_steps()
        mean_before = np.asarray(state["params"]["encoder"]["bn"]["mean"]).copy()
        state, _ = trainer._train_step(state, batch, jax.random.PRNGKey(2))
        mean_after = np.asarray(state["params"]["encoder"]["bn"]["mean"])
        assert (mean_before != mean_after).any()
        trainer.close()

    def test_checkpoint_resume_roundtrip(self, tiny_model, batch, tmp_path):
        trainer = Trainer(tiny_model, "t", log_dir=str(tmp_path))
        state = trainer.init_state(jax.random.PRNGKey(0))
        trainer._build_steps()
        state, _ = trainer._train_step(state, batch, jax.random.PRNGKey(3))
        trainer.save_checkpoint(state, str(tmp_path / "ck"))
        restored = trainer.restore_checkpoint(str(tmp_path / "ck"))
        assert int(restored["step"]) == int(state["step"])

        # continuing from restored state must match continuing original
        s1, m1 = trainer._train_step(state, batch, jax.random.PRNGKey(4))
        s2, m2 = trainer._train_step(restored, batch, jax.random.PRNGKey(4))
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-6
        )
        trainer.close()

    def test_run_epoch_and_writers(self, tiny_model, batch, tmp_path):
        trainer = Trainer(
            tiny_model, "exp", log_dir=str(tmp_path), log_grad_norm=True
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        loader = [batch, batch]
        state, loss, pp = trainer.run_epoch(
            state, loader, jax.random.PRNGKey(1), "train", epoch=1
        )
        assert np.isfinite(loss) and np.isfinite(pp)
        state, vloss, vpp = trainer.run_epoch(
            state, loader, jax.random.PRNGKey(2), "val", epoch=1
        )
        assert np.isfinite(vloss)
        metrics_file = os.path.join(
            trainer.experiment_dir, "train", "metrics.jsonl"
        )
        assert os.path.exists(metrics_file)
        content = open(metrics_file).read()
        assert "train/batch_loss" in content
        assert "train/grad_norm" in content
        trainer.close()

    def test_frozen_mask_structure(self, tiny_model):
        params = tiny_model.init(jax.random.PRNGKey(0))
        mask = frozen_mask(params)
        assert mask["encoder"]["resnet"]["conv1"]["kernel"] is False
        assert mask["encoder"]["linear"]["kernel"] is True
        assert mask["encoder"]["bn"]["mean"] is False
        assert mask["encoder"]["bn"]["scale"] is True
        assert mask["decoder"]["classifier"]["bias"] is True


class TestDataLayer:
    @pytest.fixture
    def data_root(self, tmp_path):
        from PIL import Image

        root = tmp_path / "memes"
        (root / "images").mkdir(parents=True)
        templates = [
            ("one-does-not-simply", "http://x/one.jpg"),
            ("grumpy-cat", "http://x/cat.jpg"),
        ]
        with open(root / "templates.txt", "w") as f:
            for label, url in templates:
                f.write(f"{label}\tlink\t{url}\n")
                Image.new("RGB", (80, 60), (100, 50, 20)).save(
                    root / "images" / url.split("/")[-1]
                )
        for split, k in (("train", 4), ("val", 2)):
            with open(root / f"captions_{split}.txt", "w") as f:
                for i in range(k):
                    f.write(
                        f"{templates[i % 2][0]}\t{i}\thello world {i} <sep> bye\n"
                    )
        return str(root)

    @pytest.fixture
    def vocab(self):
        return Vocab(["hello", "world", "bye", "one", "does", "not",
                      "simply", "grumpy", "cat", "0", "1", "2", "3"])

    def test_dataset_loads(self, data_root, vocab):
        ds = MemeDataset(data_root, vocab, split="train")
        assert len(ds) == 4
        labels, caption, image = ds[0]
        assert image.shape == (224, 224, 3)
        assert caption[-1] == 3  # EOS appended
        assert 4 in caption.tolist()  # <sep> kept
        # label text is tokenized too, with EOS
        assert labels[-1] == 3

    def test_dataset_num_classes_filters_captions(self, data_root, vocab):
        ds = MemeDataset(data_root, vocab, split="train", num_classes=1)
        assert len(ds.templates) == 1
        assert all(l == "one-does-not-simply" for l, _ in ds.captions)

    def test_dataset_unknown_split(self, data_root, vocab):
        with pytest.raises(ValueError):
            MemeDataset(data_root, vocab, split="bogus")

    def test_batch_iterator_static_shapes(self, data_root, vocab):
        ds = MemeDataset(data_root, vocab, split="train")
        it = BatchIterator(ds, batch_size=2, max_caption_len=10,
                           max_label_len=6)
        batches = list(it)
        assert len(batches) == 2
        for b in batches:
            assert b["captions"].shape == (2, 10)
            assert b["labels"].shape == (2, 6)
            assert b["images"].shape == (2, 224, 224, 3)

    def test_batch_iterator_reshuffles_deterministically(self, data_root,
                                                         vocab):
        ds = MemeDataset(data_root, vocab, split="train")
        a = list(BatchIterator(ds, 2, shuffle=True, seed=5))
        b = list(BatchIterator(ds, 2, shuffle=True, seed=5))
        np.testing.assert_array_equal(a[0]["captions"], b[0]["captions"])

    def test_pad_collate_truncates(self):
        batch = [
            (np.arange(3, dtype=np.int32), np.arange(12, dtype=np.int32),
             np.zeros((4, 4, 3), np.float32)),
        ]
        out = pad_collate(batch, max_caption_len=8, max_label_len=2)
        assert out["captions"].shape == (1, 8)
        assert out["labels"].shape == (1, 2)


def test_donated_train_step_runs(tiny_model, batch, tmp_path):
    """donate=True: the standard state = step(state) loop works."""
    trainer = Trainer(tiny_model, "d", log_dir=str(tmp_path), donate=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    trainer._build_steps()
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = trainer._train_step(state, batch, sub)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state["step"]) == 3
    trainer.close()


class TestTrunkCache:
    """Trunk-feature cached training must be numerically identical to the
    full forward (the frozen ResNet runs in eval mode, so its features per
    image are deterministic; rng streams for the head/decoder are
    unchanged)."""

    def test_cached_step_identical(self, tiny_model, batch, tmp_path):
        trainer = Trainer(tiny_model, "t", log_dir=str(tmp_path))
        state = trainer.init_state(jax.random.PRNGKey(0))
        trainer._build_steps()
        rng = jax.random.PRNGKey(3)
        _, m_full = trainer._train_step(state, batch, rng)

        # fake "dataset": two unique templates, rows point at them
        class DS:
            images = {"a": batch["images"][0], "b": batch["images"][1]}

        rows_map = trainer.build_trunk_cache(state["params"], DS())
        assert rows_map == {"a": 0, "b": 1}
        trainer._build_steps()
        cached_batch = dict(batch)
        del cached_batch["images"]
        cached_batch["image_rows"] = np.array([0, 1, 0, 1], np.int32)
        # reference: full forward on the matching images
        ref_batch = dict(batch)
        ref_batch["images"] = batch["images"][[0, 1, 0, 1]]
        s1, m_ref = trainer._train_step(state, ref_batch, rng)
        s2, m_cached = trainer._train_step(state, cached_batch, rng)
        np.testing.assert_allclose(
            float(m_cached["loss"]), float(m_ref["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            float(m_cached["grad_norm"]), float(m_ref["grad_norm"]),
            rtol=1e-4)
        del s1, s2  # post-Adam params amplify float fusion noise; the
        # loss/grad_norm equalities above already pin the gradient tree
        e_ref = trainer._eval_step(state["params"], ref_batch)
        e_cached = trainer._eval_step(state["params"], cached_batch)
        np.testing.assert_allclose(
            float(e_cached["loss"]), float(e_ref["loss"]), rtol=1e-6)
        trainer.close()

    def test_batch_iterator_image_rows(self, tmp_path):
        from PIL import Image

        root = tmp_path / "memes"
        (root / "images").mkdir(parents=True)
        with open(root / "templates.txt", "w") as f:
            for label, url in (("one", "http://x/one.jpg"),
                               ("two", "http://x/two.jpg")):
                f.write(f"{label}\tlink\t{url}\n")
                Image.new("RGB", (80, 60), (100, 50, 20)).save(
                    root / "images" / url.split("/")[-1])
        with open(root / "captions_train.txt", "w") as f:
            for i in range(4):
                f.write(f"{('one', 'two')[i % 2]}\t{i}\thello bye\n")
        vocab = Vocab(["hello", "bye", "one", "two"])
        ds = MemeDataset(str(root), vocab, split="train",
                         preload_images=True)
        rows_map = {k: i for i, k in enumerate(ds.images.keys())}
        it = BatchIterator(ds, batch_size=2, max_caption_len=8,
                           max_label_len=4, image_rows=rows_map)
        b = next(iter(it))
        assert "images" not in b
        assert b["image_rows"].dtype == np.int32
        assert set(b["image_rows"].tolist()) <= set(rows_map.values())

    def test_pos_table_too_small_raises(self):
        # the pad-to-common-length quirk needs positions up to
        # max(T+1, T_enc); jax would silently gather NaNs — must raise
        from deephumor_tpu.models import CaptioningTransformer

        model = CaptioningTransformer(
            num_tokens=32, hid_dim=16, n_layers=1, n_heads=2, pf_dim=32,
            max_len=10)
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        images = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
        captions = rng.integers(6, 32, (2, 8)).astype(np.int32)
        with pytest.raises(ValueError, match="positional table"):
            model.forward(params, images, captions)


def test_frozen_partition_updates_are_structurally_zero():
    # optax.masked alone passes raw gradients through for mask=False
    # leaves; the optimizer must zero them structurally so frozen params
    # stay fixed even when their gradients are nonzero (regression)
    import optax

    from deephumor_tpu.experiments.trainer import make_optimizer

    params = {
        "resnet": {"conv": jnp.ones((3, 3))},
        "bn": {"mean": jnp.zeros((4,)), "var": jnp.ones((4,))},
        "decoder": {"kernel": jnp.ones((2, 2))},
    }
    tx = make_optimizer(learning_rate=0.1, params=params)
    opt_state = tx.init(params)
    grads = jax.tree.map(lambda x: jnp.ones_like(x) * 7.0, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert np.all(np.asarray(updates["resnet"]["conv"]) == 0.0)
    assert np.all(np.asarray(updates["bn"]["mean"]) == 0.0)
    assert np.all(np.asarray(updates["bn"]["var"]) == 0.0)
    assert np.any(np.asarray(updates["decoder"]["kernel"]) != 0.0)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new["resnet"]["conv"]),
                                  np.asarray(params["resnet"]["conv"]))


def test_tail_batch_metrics_exact():
    # drop_last=False pads the tail by duplicating the last example; the
    # duplicates must not bias epoch loss/perplexity (regression) — the
    # same 4 examples as one exact bs=4 batch and as one bs=8 batch
    # (4 real rows + 4 duplicates) must produce identical metrics
    from deephumor_tpu.data.dataloaders import BatchIterator
    from deephumor_tpu.experiments.trainer import Trainer
    from deephumor_tpu.models import CaptioningTransformerBase

    class TinySet:
        def __init__(self):
            r = np.random.default_rng(0)
            self.items = [
                (np.array([2], np.int64),
                 r.integers(6, 30, size=(r.integers(3, 7),)),
                 r.normal(size=(16, 16, 3)).astype(np.float32))
                for _ in range(4)
            ]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    model = CaptioningTransformerBase(
        num_tokens=30, hid_dim=16, n_layers=1, n_heads=2, pf_dim=24,
        max_len=12)
    trainer = Trainer(model, experiment_title="tail",
                      log_dir="/tmp/dh_tail_logs")
    state = trainer.init_state(jax.random.PRNGKey(0))

    losses = {}
    for bs in (4, 8):
        loader = BatchIterator(TinySet(), batch_size=bs, shuffle=False,
                               drop_last=False, max_caption_len=10,
                               fast=False)
        _, loss, pp = trainer.run_epoch(
            state, loader, phase="valx", epoch=1,
            rng=jax.random.PRNGKey(1))
        losses[bs] = (loss, pp)
    np.testing.assert_allclose(losses[8][0], losses[4][0], rtol=1e-5)
    np.testing.assert_allclose(losses[8][1], losses[4][1], rtol=1e-5)


def test_bf16_train_step_tracks_f32_losses():
    """Mixed precision (VERDICT r2 #3): compute_dtype='bfloat16' must
    (1) actually run the decoder in bf16 — casting params alone lets XLA
    promote every dot back to f32 (models/_decoder_compute_cast docstring)
    — and (2) track the f32 loss curve closely (master params, encoder,
    loss all stay f32)."""
    import dataclasses

    from deephumor_tpu.models import CaptioningTransformer

    rng = np.random.default_rng(0)
    batch2 = {
        "captions": jnp.asarray(rng.integers(6, 64, size=(8, 12)), jnp.int32),
        "image_rows": jnp.asarray(rng.integers(0, 4, size=(8,)), jnp.int32),
    }
    trunk = jnp.asarray(rng.normal(size=(4, 7, 7, 2048)).astype(np.float32))

    losses = {}
    model = CaptioningTransformer(num_tokens=64, hid_dim=32, n_layers=2,
                                  n_heads=4, pf_dim=48, max_len=50)
    state = None
    for cdt in (None, "bfloat16"):
        tr = Trainer(model, "bf16probe", log_dir="/tmp/dh_bf16_test",
                     compute_dtype=cdt, learning_rate=1e-2)
        state = tr.init_state(jax.random.PRNGKey(0))
        tr._trunk_cache = trunk
        tr._build_steps()
        ls, key = [], jax.random.PRNGKey(1)
        for i in range(8):
            state, m = tr._train_step(state, batch2,
                                      jax.random.fold_in(key, i))
            ls.append(float(m["loss"]))
        losses[cdt] = ls
        tr.close()

    # the bf16 model's forward emits actual bf16 logits
    m_bf16 = dataclasses.replace(model, compute_dtype="bfloat16")
    logits = m_bf16.forward(
        state["params"], jnp.take(trunk, batch2["image_rows"], axis=0),
        batch2["captions"][:, :-1], from_trunk=True)
    assert logits.dtype == jnp.bfloat16

    f32, bf16 = losses[None], losses["bfloat16"]
    assert bf16[-1] < bf16[0], bf16  # still optimizes
    rel = max(abs(a - b) / abs(a) for a, b in zip(f32, bf16))
    assert rel < 0.02, (rel, f32, bf16)

    # master params stay f32 through bf16 steps
    assert all(
        leaf.dtype != jnp.bfloat16
        for leaf in jax.tree_util.tree_leaves(state["params"])
    )


class TestTrainerTunedLevers:
    """The round-3 train-throughput levers (benchmarks/train_ab.py):
    rectangular decoder shapes and hardware-RNG dropout keys."""

    def _mk(self, tmp_path, **kw):
        from deephumor_tpu.models import CaptioningTransformer

        model = CaptioningTransformer(num_tokens=64, hid_dim=32, n_layers=2,
                                      n_heads=4, pf_dim=48, max_len=50)
        tr = Trainer(model, "tuned", log_dir=str(tmp_path),
                     learning_rate=1e-2, **kw)
        state = tr.init_state(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        tr._trunk_cache = jnp.asarray(
            rng.normal(size=(4, 7, 7, 2048)).astype(np.float32))
        tr._build_steps()
        batch2 = {
            "captions": jnp.asarray(
                rng.integers(6, 64, size=(8, 12)), jnp.int32),
            "image_rows": jnp.asarray(
                rng.integers(0, 4, size=(8,)), jnp.int32),
        }
        return tr, state, batch2

    def test_rectangular_eval_loss_exact(self, tmp_path):
        # dropout is off in eval, so the padded-quirk and rectangular
        # paths must agree to float tolerance (divergence #13)
        tr_pad, state, batch2 = self._mk(tmp_path / "pad")
        tr_rect, _, _ = self._mk(tmp_path / "rect", rectangular=True)
        ref = tr_pad._eval_step(state["params"], batch2)
        got = tr_rect._eval_step(state["params"], batch2)
        np.testing.assert_allclose(
            float(got["loss"]), float(ref["loss"]), rtol=1e-5)
        tr_pad.close()
        tr_rect.close()

    def test_rectangular_train_optimizes(self, tmp_path):
        tr, state, batch2 = self._mk(tmp_path, rectangular=True)
        key, losses = jax.random.PRNGKey(1), []
        for i in range(8):
            state, m = tr._train_step(state, batch2,
                                      jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses
        tr.close()

    def test_rbg_rng_train_optimizes(self, tmp_path):
        tr, state, batch2 = self._mk(tmp_path, rng_impl="rbg")
        key, losses = jax.random.PRNGKey(1), []
        for i in range(8):
            state, m = tr._train_step(state, batch2,
                                      jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        tr.close()

    def test_rbg_accepts_rbg_key(self, tmp_path):
        # wrap_rng must pass through keys that are already 4-word rbg keys
        tr, state, batch2 = self._mk(tmp_path, rng_impl="rbg")
        state, m = tr._train_step(state, batch2, jax.random.key(1, impl="rbg"))
        assert np.isfinite(float(m["loss"]))
        tr.close()

    def test_invalid_rng_impl_raises(self, tmp_path):
        from deephumor_tpu.models import CaptioningTransformer

        model = CaptioningTransformer(num_tokens=64, hid_dim=32, n_layers=2,
                                      n_heads=4, pf_dim=48, max_len=50)
        with pytest.raises(ValueError, match="rng_impl"):
            Trainer(model, "bad", log_dir=str(tmp_path), rng_impl="philox")

    def test_rectangular_ignored_without_model_support(self, tiny_model,
                                                       batch, tmp_path):
        tr = Trainer(tiny_model, "warn", log_dir=str(tmp_path),
                     rectangular=True)
        state = tr.init_state(jax.random.PRNGKey(0))
        with pytest.warns(UserWarning, match="no rectangular"):
            tr._build_steps()
        state, m = tr._train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
        tr.close()


class TestFusedCEPerplexity:
    """masked_ce_and_perplexity must equal the two-pass formulation."""

    def _case(self, dtype, seed=0):
        from deephumor_tpu.experiments.metrics import (
            masked_ce_and_perplexity)

        rng = np.random.default_rng(seed)
        logits = jnp.asarray(
            rng.normal(size=(6, 11, 97)).astype(np.float32) * 3.0)
        targets = jnp.asarray(rng.integers(1, 97, size=(6, 11)), jnp.int32)
        targets = targets.at[2, 7:].set(0).at[4, 3:].set(0)
        lengths = jnp.sum(targets != 0, axis=1)
        rw = jnp.asarray([1, 1, 1, 1, 0, 1], jnp.float32)

        lo = logits.astype(dtype)
        ref_in = lo.astype(jnp.float32)
        ref_loss = masked_cross_entropy(ref_in, targets, 0)
        ref_pp = perplexity(ref_in, targets, lengths, 0, row_weights=rw)
        loss, pp = masked_ce_and_perplexity(lo, targets, lengths, 0,
                                            row_weights=rw)
        return (float(ref_loss), float(ref_pp)), (float(loss), float(pp))

    def test_f32_matches(self):
        (rl, rp), (l, p) = self._case(jnp.float32)
        np.testing.assert_allclose(l, rl, rtol=1e-6)
        np.testing.assert_allclose(p, rp, rtol=1e-6)

    def test_bf16_matches_f32_upcast_reference(self):
        # gather-then-upcast == upcast-then-gather for bf16 inputs; only
        # reduction ordering differs
        (rl, rp), (l, p) = self._case(jnp.bfloat16)
        np.testing.assert_allclose(l, rl, rtol=1e-5)
        np.testing.assert_allclose(p, rp, rtol=1e-4)

    def test_no_row_weights_path(self):
        from deephumor_tpu.experiments.metrics import (
            masked_ce_and_perplexity)

        rng = np.random.default_rng(3)
        logits = jnp.asarray(rng.normal(size=(4, 5, 33)).astype(np.float32))
        targets = jnp.asarray(rng.integers(1, 33, size=(4, 5)), jnp.int32)
        lengths = jnp.sum(targets != 0, axis=1)
        ref_loss = masked_cross_entropy(logits, targets, 0)
        ref_pp = perplexity(logits, targets, lengths, 0)
        loss, pp = masked_ce_and_perplexity(logits, targets, lengths, 0)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
        np.testing.assert_allclose(float(pp), float(ref_pp), rtol=1e-6)


class TestPrefetch:
    """run_epoch's producer-thread pipeline (VERDICT r4 #3) must be
    bit-identical to the synchronous path — the producer owns the same
    RNG chain, split in the same order."""

    def _loader(self):
        rng = np.random.default_rng(5)
        batches = []
        for _ in range(4):
            caps = rng.integers(6, VOCAB, (4, 7)).astype(np.int32)
            caps[:, -1] = 3
            batches.append({
                "captions": caps,
                "images": rng.normal(size=(4, 32, 32, 3)).astype(
                    np.float32),
                "labels": rng.integers(6, VOCAB, (4, 3)).astype(np.int32),
            })
        return batches

    def test_prefetch_matches_sync(self, tiny_model, tmp_path):
        loader = self._loader()
        results = {}
        for depth in (0, 3):
            trainer = Trainer(tiny_model, f"pf{depth}",
                              log_dir=str(tmp_path), prefetch=depth)
            state = trainer.init_state(jax.random.PRNGKey(0))
            state, loss, pp = trainer.run_epoch(
                state, loader, jax.random.PRNGKey(9), phase="train")
            results[depth] = (
                loss, pp,
                np.asarray(state["params"]["decoder"]["embedding"]
                           ["table"]).copy())
            trainer.close()
        assert results[0][0] == results[3][0]
        assert results[0][1] == results[3][1]
        np.testing.assert_array_equal(results[0][2], results[3][2])

    def test_producer_exception_propagates(self, tiny_model, tmp_path):
        def bad_loader():
            yield self._loader()[0]
            raise RuntimeError("loader blew up")

        trainer = Trainer(tiny_model, "pfx", log_dir=str(tmp_path),
                          prefetch=2)
        state = trainer.init_state(jax.random.PRNGKey(0))
        with pytest.raises(RuntimeError, match="loader blew up"):
            trainer.run_epoch(state, bad_loader(), jax.random.PRNGKey(1),
                              phase="train")
        trainer.close()


def test_cast_cache_resume_roundtrip(tmp_path):
    """The derived bf16 decoder copy is NOT persisted; restore must
    rebuild it (run_epoch ensure) and the resumed trajectory must match
    continuing without the save/restore."""
    from deephumor_tpu.models import CaptioningTransformer

    rng = np.random.default_rng(0)
    trunk = jnp.asarray(rng.normal(size=(4, 7, 7, 2048)).astype(np.float32))

    def loader():
        r = np.random.default_rng(3)
        return [{
            "captions": r.integers(6, 64, size=(8, 12)).astype(np.int32),
            "image_rows": r.integers(0, 4, size=(8,)).astype(np.int32),
        } for _ in range(3)]

    model = CaptioningTransformer(num_tokens=64, hid_dim=32, n_layers=2,
                                  n_heads=4, pf_dim=48, max_len=50)

    tr = Trainer(model, "castresume", log_dir=str(tmp_path),
                 compute_dtype="bfloat16", cast_cache=True)
    state = tr.init_state(jax.random.PRNGKey(0))
    assert "cast" in state
    tr._trunk_cache = trunk
    state, _, _ = tr.run_epoch(state, loader(), jax.random.PRNGKey(1),
                               phase="train")
    tr.save_checkpoint(state, str(tmp_path / "ck"))
    state_cont, loss_cont, _ = tr.run_epoch(
        state, loader(), jax.random.PRNGKey(2), phase="train")
    tr.close()

    tr2 = Trainer(model, "castresume2", log_dir=str(tmp_path),
                  compute_dtype="bfloat16", cast_cache=True)
    restored = tr2.restore_checkpoint(str(tmp_path / "ck"))
    assert "cast" not in restored
    tr2._trunk_cache = trunk
    restored, loss_res, _ = tr2.run_epoch(
        restored, loader(), jax.random.PRNGKey(2), phase="train")
    tr2.close()

    assert loss_res == loss_cont
    np.testing.assert_array_equal(
        np.asarray(state_cont["params"]["decoder"]["tok_embedding"]
                   ["table"]),
        np.asarray(restored["params"]["decoder"]["tok_embedding"]
                   ["table"]))


def test_prefetch_producer_released_on_step_failure(tiny_model, tmp_path):
    """A step exception mid-epoch must not leave the producer thread
    blocked on the full queue (it would pin device batches for the
    process lifetime — review r5)."""
    import threading
    import time as _time

    rng = np.random.default_rng(4)
    batches = []
    for _ in range(8):
        caps = rng.integers(6, VOCAB, (4, 7)).astype(np.int32)
        caps[:, -1] = 3
        batches.append({
            "captions": caps,
            "images": rng.normal(size=(4, 32, 32, 3)).astype(np.float32),
            "labels": rng.integers(6, VOCAB, (4, 3)).astype(np.int32),
        })

    trainer = Trainer(tiny_model, "pfleak", log_dir=str(tmp_path),
                      prefetch=2)
    state = trainer.init_state(jax.random.PRNGKey(0))
    trainer._build_steps()
    real_step = trainer._train_step
    calls = [0]

    def failing_step(st, b, k):
        calls[0] += 1
        if calls[0] >= 2:
            raise RuntimeError("boom")
        return real_step(st, b, k)

    trainer._train_step = failing_step
    with pytest.raises(RuntimeError, match="boom"):
        trainer.run_epoch(state, batches, jax.random.PRNGKey(1),
                          phase="train")
    deadline = _time.time() + 10
    while _time.time() < deadline and any(
            t.name == "dh-epoch-prefetch" and t.is_alive()
            for t in threading.enumerate()):
        _time.sleep(0.2)
    assert not any(t.name == "dh-epoch-prefetch" and t.is_alive()
                   for t in threading.enumerate())
    trainer.close()

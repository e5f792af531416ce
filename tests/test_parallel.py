"""Sharding tests on the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8 — SURVEY.md §4's fake backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deephumor_tpu.experiments.trainer import Trainer
from deephumor_tpu.models import CaptioningLSTM, CaptioningTransformerBase
from deephumor_tpu.parallel import (
    make_mesh,
    make_param_shardings,
    replicate,
    shard_batch,
)

VOCAB = 24


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    captions = rng.integers(6, VOCAB, (8, 7)).astype(np.int32)
    captions[:, -1] = 3
    return {
        "captions": captions,
        "images": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
    }


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_dp_train_step_matches_single_device(batch, tmp_path):
    """The sharded train step must compute the same numbers as unsharded."""
    model = CaptioningLSTM(num_tokens=VOCAB, emb_dim=16, hidden_size=16,
                           num_layers=1, enc_dropout=0.0, dec_dropout=0.0)
    trainer = Trainer(model, "t", log_dir=str(tmp_path))
    state = trainer.init_state(jax.random.PRNGKey(0))
    trainer._build_steps()
    rng = jax.random.PRNGKey(1)

    s_plain, m_plain = trainer._train_step(state, batch, rng)

    mesh = make_mesh(model=1)
    state_sh = {
        "params": replicate(state["params"], mesh),
        "opt_state": replicate(state["opt_state"], mesh),
        "step": state["step"],
    }
    batch_sh = shard_batch(batch, mesh)
    s_shard, m_shard = trainer._train_step(state_sh, batch_sh, rng)

    np.testing.assert_allclose(
        float(m_plain["loss"]), float(m_shard["loss"]), rtol=1e-5
    )
    # cross-device grad psum reassociates the reduction, and Adam divides
    # by sqrt(v) of tiny second moments — small absolute wiggle is expected
    a = jax.tree_util.tree_leaves(s_plain["params"])
    b = jax.tree_util.tree_leaves(s_shard["params"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=5e-4
        )
    trainer.close()


def test_dp_generation_sharded(batch):
    """Batched generation runs with the batch split across the mesh and
    matches the unsharded result."""
    from deephumor_tpu.models import lstm as lstm_mod

    model = CaptioningLSTM(num_tokens=VOCAB, emb_dim=8, hidden_size=12,
                           num_layers=1)
    dec = lstm_mod.lstm_decoder_init(jax.random.PRNGKey(1), VOCAB, 8, 12, 1)
    params = {"decoder": dec}
    emb = jax.random.normal(jax.random.PRNGKey(2), (8, 8))

    plain = model.generate_from_emb(
        params, emb, max_len=8, beam_size=2, top_k=8, greedy=True
    )["chosen"]

    mesh = make_mesh()
    emb_sh = shard_batch(emb, mesh)
    params_sh = replicate(params, mesh)
    sharded = model.generate_from_emb(
        params_sh, emb_sh, max_len=8, beam_size=2, top_k=8, greedy=True
    )["chosen"]
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(sharded))


def test_dp_generate_transformer_shard_map(batch):
    """The flagship transformer serving path under shard_map DP: batch
    split over the mesh, full beam-search loop per shard, greedy tokens
    equal to the unsharded run (VERDICT r1 #4)."""
    from deephumor_tpu.models import CaptioningTransformer
    from deephumor_tpu.parallel import dp_generate, make_mesh, replicate

    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=16, n_layers=2, n_heads=4, pf_dim=32,
        max_len=16,
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    spa = jnp.asarray(rng.normal(size=(8, 49, 16)).astype(np.float32))

    plain = model.generate_from_emb(
        params, (emb, spa), max_len=8, beam_size=3, top_k=8, greedy=True,
        attn="xla",
    )["chosen"]

    mesh = make_mesh()
    sharded = dp_generate(
        model, replicate(params, mesh),
        (shard_batch(emb, mesh), shard_batch(spa, mesh)), mesh,
        max_len=8, beam_size=3, top_k=8, greedy=True, attn="xla",
    )["chosen"]
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(sharded))


def test_tp_param_shardings_place_and_run(batch):
    """Transformer decoder trains on a data x model mesh with TP'd weights;
    loss matches the replicated run."""
    model = CaptioningTransformerBase(
        num_tokens=VOCAB, hid_dim=16, n_layers=2, n_heads=4, pf_dim=32,
        max_len=16, enc_dropout=0.0, dec_dropout=0.0,
    )
    params = model.init(jax.random.PRNGKey(0))

    def loss_fn(params, batch):
        captions = batch["captions"]
        logits = model.forward(params, batch["images"], captions[:, :-1])
        logits = logits[:, : captions.shape[1]]
        from deephumor_tpu.experiments.metrics import masked_cross_entropy

        return masked_cross_entropy(logits, captions)

    plain = float(jax.jit(loss_fn)(params, batch))

    mesh = make_mesh(model=2)
    shardings = make_param_shardings(params, mesh)
    params_tp = jax.tree.map(jax.device_put, params, shardings)
    # check a TP'd kernel is actually split over the model axis
    k = params_tp["decoder"]["layers"][0]["self_attn"]["fc_q"]["kernel"]
    assert k.sharding.spec == jax.sharding.PartitionSpec(None, "model")

    batch_sh = shard_batch(batch, mesh)
    tp = float(jax.jit(loss_fn)(params_tp, batch_sh))
    np.testing.assert_allclose(plain, tp, rtol=1e-5)

    # gradient step also runs under TP
    g = jax.jit(jax.grad(loss_fn))(params_tp, batch_sh)
    gnorm = float(
        jnp.sqrt(
            sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(g))
        )
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_trainer_run_epoch_with_mesh(batch, tmp_path):
    """Trainer.run_epoch(mesh=...) shards batches and matches unsharded."""
    from deephumor_tpu.models import CaptioningLSTM

    model = CaptioningLSTM(num_tokens=VOCAB, emb_dim=16, hidden_size=16,
                           num_layers=1, enc_dropout=0.0, dec_dropout=0.0)
    trainer = Trainer(model, "m", log_dir=str(tmp_path))
    state = trainer.init_state(jax.random.PRNGKey(0))

    mesh = make_mesh(model=1)
    state_sh = {
        "params": replicate(state["params"], mesh),
        "opt_state": replicate(state["opt_state"], mesh),
        "step": state["step"],
    }
    loader = [batch, batch]
    s1, loss1, _ = trainer.run_epoch(
        state, loader, jax.random.PRNGKey(1), "train", 1
    )
    trainer2 = Trainer(model, "m2", log_dir=str(tmp_path))
    trainer2.init_state(jax.random.PRNGKey(0))
    s2, loss2, _ = trainer2.run_epoch(
        state_sh, loader, jax.random.PRNGKey(1), "train", 1, mesh=mesh
    )
    np.testing.assert_allclose(loss1, loss2, rtol=1e-4)
    trainer.close(); trainer2.close()


def test_dp_generate_shards_caption_prefix(batch):
    """Batch-shaped generate kwargs (caption prefixes) must shard with
    the encoder rows instead of entering every shard full-size via the
    closure (regression: shape-mismatch inside shard_map)."""
    from deephumor_tpu.models import CaptioningTransformer
    from deephumor_tpu.parallel import dp_generate, make_mesh, replicate

    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=16, n_layers=2, n_heads=4, pf_dim=32,
        max_len=16,
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    emb = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    spa = jnp.asarray(rng.normal(size=(8, 49, 16)).astype(np.float32))
    prefix = jnp.asarray(rng.integers(6, VOCAB, size=(8, 3)), jnp.int32)

    plain = model.generate_from_emb(
        params, (emb, spa), caption=prefix, max_len=8, beam_size=3,
        top_k=8, greedy=True, attn="xla",
    )["chosen"]

    mesh = make_mesh()
    sharded = dp_generate(
        model, replicate(params, mesh),
        (shard_batch(emb, mesh), shard_batch(spa, mesh)), mesh,
        caption=shard_batch(prefix, mesh), max_len=8, beam_size=3,
        top_k=8, greedy=True, attn="xla",
    )["chosen"]
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(sharded))


def test_tp_sharded_generation_equality(batch):
    """Serving under TENSOR parallelism: Megatron-sharded decoder weights
    on a data x model mesh, generation driven by jit's sharding
    propagation (no shard_map) — tokens equal to the unsharded run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deephumor_tpu.models import CaptioningTransformer
    from deephumor_tpu.parallel import make_mesh
    from deephumor_tpu.parallel.sharding import make_param_shardings

    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=32, n_layers=2, n_heads=4, pf_dim=64,
        max_len=16,
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    spa = jnp.asarray(rng.normal(size=(8, 49, 32)).astype(np.float32))

    plain = model.generate_from_emb(
        params, (emb, spa), max_len=8, beam_size=3, top_k=8, greedy=True,
        attn="xla")["chosen"]

    mesh = make_mesh(model=2)  # data 4 x model 2
    sp = jax.device_put(params, make_param_shardings(params, mesh))
    data_sh = NamedSharding(mesh, P("data"))
    out = model.generate_from_emb(
        sp, (jax.device_put(emb, data_sh), jax.device_put(spa, data_sh)),
        max_len=8, beam_size=3, top_k=8, greedy=True, attn="xla")["chosen"]
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(out))


def test_sharded_checkpoint_resume(batch, tmp_path):
    """VERDICT r3 #7: save a DPxTP-sharded train state mid-run, restore
    it onto (a) the same mesh, (b) a different mesh layout (2x2 over 4
    devices), and (c) no mesh at all — continued loss trajectories must
    match the unsharded resume (checkpoints are layout-independent: save
    gathers to host npz, restore re-places under the caller's mesh)."""
    model = CaptioningTransformerBase(
        num_tokens=VOCAB, hid_dim=16, n_layers=1, n_heads=4, pf_dim=24,
        max_len=16, enc_dropout=0.0, dec_dropout=0.0)
    trainer = Trainer(model, "t", log_dir=str(tmp_path))
    state = trainer.init_state(jax.random.PRNGKey(0))
    trainer._build_steps()

    def place(state, mesh):
        if mesh is None:
            return state
        return {
            "params": jax.tree.map(
                jax.device_put, state["params"],
                make_param_shardings(state["params"], mesh)),
            "opt_state": replicate(state["opt_state"], mesh),
            "step": state["step"],
        }

    # run 2 sharded steps on a 4x2 DPxTP mesh, checkpoint mid-run
    mesh_a = make_mesh(model=2)
    st = place(state, mesh_a)
    for i in (1, 2):
        st, _ = trainer._train_step(
            st, shard_batch(batch, mesh_a), jax.random.PRNGKey(i))
    trainer.save_checkpoint(st, str(tmp_path / "ck"))
    restored = trainer.restore_checkpoint(str(tmp_path / "ck"))
    assert int(restored["step"]) == 2

    # continue 2 more steps under each layout; trajectories must agree
    losses = {}
    for name, mesh in (("same_4x2", mesh_a),
                       ("diff_2x2", make_mesh(
                           devices=jax.devices()[:4], model=2)),
                       ("unsharded", None)):
        s = place(jax.tree.map(jnp.asarray, restored), mesh)
        traj = []
        for i in (3, 4):
            b = batch if mesh is None else shard_batch(batch, mesh)
            s, m = trainer._train_step(s, b, jax.random.PRNGKey(i))
            traj.append(float(m["loss"]))
        losses[name] = traj

    for name in ("same_4x2", "diff_2x2"):
        np.testing.assert_allclose(
            losses[name], losses["unsharded"], rtol=2e-5,
            err_msg=f"resume trajectory diverged under {name}")
    trainer.close()

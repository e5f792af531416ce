"""Generation engine tests.

The load-bearing property: greedy decode through the incremental KV-cache /
carried-state path must token-for-token equal repeated argmax over the full
teacher-forced forward (which is itself parity-tested against torch). Plus
sampler-semantics unit tests against numpy oracles (SURVEY.md §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deephumor_tpu.data.vocab import EOS_ID, PAD_ID, UNK_ID
from deephumor_tpu.models import lstm as lstm_mod
from deephumor_tpu.models import transformer as tfm
from deephumor_tpu.models.caption_models import (
    CaptioningLSTM,
    CaptioningTransformer,
    CaptioningTransformerBase,
)
from deephumor_tpu.models.sampling import beam_search, filter_top_k, gumbel_top_k

VOCAB = 30
MAX_LEN = 12


def _truncate_at_eos(seq):
    seq = list(np.asarray(seq))
    if EOS_ID in seq:
        return seq[: seq.index(EOS_ID) + 1]
    return seq


def _greedy_oracle_lstm(params, emb, max_len):
    """Argmax loop over the full forward (UNK masked), per item."""
    tokens = np.zeros((emb.shape[0], 0), np.int32)
    out = []
    for t in range(max_len):
        logits = lstm_mod.lstm_decoder_forward(
            params, emb, jnp.asarray(tokens)
        )[:, -1]
        logits = logits.at[:, UNK_ID].set(-np.inf)
        nxt = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
        out.append(nxt)
        tokens = np.concatenate([tokens, nxt[:, None]], axis=1)
    return np.stack(out, axis=1)


class TestGreedyKVCacheEquivalence:
    def test_lstm(self):
        model = CaptioningLSTM(
            num_tokens=VOCAB, emb_dim=8, hidden_size=12, num_layers=2
        )
        key = jax.random.PRNGKey(0)
        dec = lstm_mod.lstm_decoder_init(
            jax.random.PRNGKey(1), VOCAB, 8, 12, 2
        )
        params = {"decoder": dec}
        emb = jax.random.normal(jax.random.PRNGKey(2), (3, 8))

        res = model.generate_from_emb(
            params, emb, key=key, max_len=MAX_LEN, beam_size=1,
            top_k=VOCAB, greedy=True,
        )
        oracle = _greedy_oracle_lstm(dec, emb, MAX_LEN)
        for b in range(3):
            assert _truncate_at_eos(res["chosen"][b]) == _truncate_at_eos(
                oracle[b]
            )

    @pytest.mark.parametrize("cross", [False, True])
    def test_transformer(self, cross):
        cls = CaptioningTransformer if cross else CaptioningTransformerBase
        model = cls(
            num_tokens=VOCAB, hid_dim=16, n_layers=2, n_heads=4, pf_dim=24,
            max_len=MAX_LEN + 4,
        )
        init = (
            tfm.transformer_decoder_init
            if cross
            else tfm.self_attn_decoder_init
        )
        dec = init(jax.random.PRNGKey(3), VOCAB, 16, 2, 24, MAX_LEN + 4)
        params = {"decoder": dec}
        start_emb = jax.random.normal(jax.random.PRNGKey(4), (2, 16))
        spatial = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 16))
        enc = (start_emb, spatial) if cross else start_emb

        res = model.generate_from_emb(
            params, enc, key=jax.random.PRNGKey(0), max_len=MAX_LEN,
            beam_size=1, top_k=VOCAB, greedy=True,
        )

        # oracle: argmax over the full (quirk-reproducing) forward
        tokens = np.zeros((2, 0), np.int32)
        oracle = []
        for t in range(MAX_LEN):
            if cross:
                logits = tfm.transformer_decoder_forward(
                    dec, jnp.asarray(tokens), spatial, start_emb, n_heads=4
                )[:, t]
            else:
                logits = tfm.self_attn_decoder_forward(
                    dec, jnp.asarray(tokens), start_emb, n_heads=4
                )[:, t]
            logits = logits.at[:, UNK_ID].set(-np.inf)
            nxt = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
            oracle.append(nxt)
            tokens = np.concatenate([tokens, nxt[:, None]], axis=1)
        oracle = np.stack(oracle, axis=1)

        for b in range(2):
            assert _truncate_at_eos(res["chosen"][b]) == _truncate_at_eos(
                oracle[b]
            ), f"item {b}: {res['chosen'][b]} vs {oracle[b]}"

    def test_greedy_with_prefix(self):
        model = CaptioningTransformerBase(
            num_tokens=VOCAB, hid_dim=16, n_layers=2, n_heads=4, pf_dim=24,
            max_len=MAX_LEN + 4,
        )
        dec = tfm.self_attn_decoder_init(
            jax.random.PRNGKey(6), VOCAB, 16, 2, 24, MAX_LEN + 4
        )
        params = {"decoder": dec}
        start_emb = jax.random.normal(jax.random.PRNGKey(7), (1, 16))
        prefix = jnp.asarray([[7, 9]], jnp.int32)

        res = model.generate_from_emb(
            params, start_emb, key=jax.random.PRNGKey(0), caption=prefix,
            max_len=MAX_LEN, beam_size=1, top_k=VOCAB, greedy=True,
        )
        chosen = np.asarray(res["chosen"][0])
        assert chosen[:2].tolist() == [7, 9]

        # continuation must equal the no-cache oracle seeded with the prefix
        tokens = np.asarray(prefix)
        for t in range(2, MAX_LEN):
            logits = tfm.self_attn_decoder_forward(
                dec, jnp.asarray(tokens), start_emb, n_heads=4
            )[:, t]
            logits = logits.at[:, UNK_ID].set(-np.inf)
            nxt = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
            tokens = np.concatenate([tokens, nxt[:, None]], axis=1)
        assert _truncate_at_eos(chosen) == _truncate_at_eos(tokens[0])

    def test_batch_independence(self):
        # generating a batch must equal generating items one by one
        model = CaptioningLSTM(
            num_tokens=VOCAB, emb_dim=8, hidden_size=12, num_layers=2
        )
        dec = lstm_mod.lstm_decoder_init(jax.random.PRNGKey(8), VOCAB, 8, 12, 2)
        params = {"decoder": dec}
        emb = jax.random.normal(jax.random.PRNGKey(9), (4, 8))

        batch = model.generate_from_emb(
            params, emb, max_len=MAX_LEN, beam_size=1, top_k=VOCAB,
            greedy=True,
        )["chosen"]
        for b in range(4):
            single = model.generate_from_emb(
                params, emb[b : b + 1], max_len=MAX_LEN, beam_size=1,
                top_k=VOCAB, greedy=True,
            )["chosen"][0]
            np.testing.assert_array_equal(np.asarray(batch[b]), np.asarray(single))


class TestSamplerSemantics:
    def test_filter_top_k_numpy_oracle(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(4, 20)).astype(np.float32))
        out = np.asarray(filter_top_k(logits, top_k=5))
        ref = np.asarray(logits).copy()
        kth = np.sort(ref, axis=-1)[:, -5][:, None]
        ref[ref < kth] = -np.inf
        ref[:, UNK_ID] = -np.inf
        np.testing.assert_array_equal(out, ref)

    def test_filter_top_k_keeps_ties(self):
        logits = jnp.asarray([[1.0, 3.0, 3.0, 2.0, 0.0]])
        out = np.asarray(filter_top_k(logits, top_k=2, unk_index=4))
        # both 3.0s survive (ties at the kth value are kept)
        assert np.isfinite(out[0, 1]) and np.isfinite(out[0, 2])
        assert not np.isfinite(out[0, 0]) and not np.isfinite(out[0, 3])

    def test_gumbel_top_k_distribution(self):
        # marginal frequency of the single draw ~ softmax weights
        logw = jnp.log(jnp.asarray([0.5, 0.3, 0.2]))
        keys = jax.random.split(jax.random.PRNGKey(0), 3000)
        draws = jax.vmap(lambda k: gumbel_top_k(k, logw, 1)[0])(keys)
        freqs = np.bincount(np.asarray(draws), minlength=3) / 3000
        np.testing.assert_allclose(freqs, [0.5, 0.3, 0.2], atol=0.04)

    def test_gumbel_top_k_never_selects_masked(self):
        logw = jnp.asarray([0.0, -jnp.inf, 1.0, -jnp.inf])
        keys = jax.random.split(jax.random.PRNGKey(0), 50)
        idx = np.asarray(jax.vmap(lambda k: gumbel_top_k(k, logw, 2))(keys))
        assert set(idx.reshape(-1).tolist()) == {0, 2}

    def test_ended_branches_frozen(self):
        # once a branch emits EOS its sequence gets pads and its score stops
        # changing (reference beam.py:84-95 bookkeeping)
        vocab = 8

        def step_fn(state, tokens):
            # rigged logits: EOS wins immediately for item 0, never for item 1
            bias = jnp.where(
                state["want_eos"][:, None],
                jax.nn.one_hot(EOS_ID, vocab) * 100.0,
                jax.nn.one_hot(6, vocab) * 100.0,
            )
            return bias, state

        n_items, beam = 2, 2
        want = jnp.asarray([True, False])
        state = {"want_eos": jnp.repeat(want, beam, axis=0)}
        init_logits = jnp.where(
            want[:, None],
            jax.nn.one_hot(EOS_ID, vocab) * 100.0,
            jax.nn.one_hot(6, vocab) * 100.0,
        )
        res = beam_search(
            jax.random.PRNGKey(0), step_fn, state, init_logits,
            beam_size=beam, top_k=4, temperature=1.0, max_len=6,
            greedy=True,
        )
        seq0 = np.asarray(res["chosen"][0])
        assert seq0[0] == EOS_ID and (seq0[1:] == PAD_ID).all()
        seq1 = np.asarray(res["chosen"][1])
        assert (seq1 == 6).all()
        assert res["ended"][0].all() and not res["ended"][1].any()


class TestReproducibility:
    def test_same_key_same_output_stochastic(self):
        model = CaptioningLSTM(
            num_tokens=VOCAB, emb_dim=8, hidden_size=12, num_layers=1
        )
        dec = lstm_mod.lstm_decoder_init(jax.random.PRNGKey(0), VOCAB, 8, 12, 1)
        params = {"decoder": dec}
        emb = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
        kw = dict(max_len=10, beam_size=3, top_k=10, temperature=1.2)
        a = model.generate_from_emb(params, emb, key=jax.random.PRNGKey(5), **kw)
        b = model.generate_from_emb(params, emb, key=jax.random.PRNGKey(5), **kw)
        np.testing.assert_array_equal(
            np.asarray(a["chosen"]), np.asarray(b["chosen"])
        )
        c = model.generate_from_emb(params, emb, key=jax.random.PRNGKey(6), **kw)
        assert (np.asarray(c["chosen"]) != np.asarray(a["chosen"])).any()

    def test_scores_are_reference_normalized(self):
        # scores must be sums of per-step log_softmax-over-k values -> <= 0
        model = CaptioningLSTM(
            num_tokens=VOCAB, emb_dim=8, hidden_size=12, num_layers=1
        )
        dec = lstm_mod.lstm_decoder_init(jax.random.PRNGKey(2), VOCAB, 8, 12, 1)
        params = {"decoder": dec}
        emb = jax.random.normal(jax.random.PRNGKey(3), (2, 8))
        out = model.generate_from_emb(
            params, emb, key=jax.random.PRNGKey(0), max_len=8, beam_size=3,
            top_k=10,
        )
        scores = np.asarray(out["scores"])
        assert (scores <= 1e-5).all() and np.isfinite(scores).all()


def test_pallas_phases_with_prefix():
    # the phased p_eff while_loops must line up with a caption prefix:
    # same tokens as the XLA path under greedy decoding
    import numpy as np
    from deephumor_tpu.models import CaptioningTransformer

    model = CaptioningTransformer(
        num_tokens=64, hid_dim=32, n_layers=2, n_heads=2, pf_dim=64,
        max_len=40,
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    prefix = jnp.asarray(rng.integers(6, 64, size=(2, 4)), jnp.int32)
    outs = {}
    for attn in ("xla", "pallas_interpret"):
        out = model.generate(
            params, imgs, key=jax.random.PRNGKey(3), caption=prefix,
            max_len=24, beam_size=3, top_k=8, greedy=True, attn=attn)
        outs[attn] = np.asarray(out["chosen"])
    np.testing.assert_array_equal(outs["xla"], outs["pallas_interpret"])
    # prefix preserved in the output
    assert (outs["xla"][:, :4] == np.asarray(prefix)).all()


class TestEngineEdgeCases:
    def _const_step(self, vocab):
        def step_fn(state, tokens):
            logits = jnp.tile(
                jnp.linspace(0.0, 1.0, vocab)[None], (tokens.shape[0], 1)
            )
            return logits, state
        return step_fn

    def test_beam_size_one_stochastic(self):
        # degenerate beam: the [1, 1] candidate matrix and survivor draw
        vocab, n = 16, 3
        init = jnp.tile(jnp.linspace(0.0, 1.0, vocab)[None], (n, 1))
        res = beam_search(
            jax.random.PRNGKey(3), self._const_step(vocab), {}, init,
            beam_size=1, top_k=5, temperature=1.0, max_len=4,
        )
        assert res["chosen"].shape == (n, 4)
        assert res["sequences"].shape == (n, 1, 4)

    def test_top_k_equals_vocab(self):
        # keep-all filter: everything except UNK is eligible
        vocab, n = 8, 2
        init = jnp.tile(jnp.arange(vocab, dtype=jnp.float32)[None], (n, 1))
        res = beam_search(
            jax.random.PRNGKey(1), self._const_step(vocab), {}, init,
            beam_size=2, top_k=vocab, temperature=1.0, max_len=3,
        )
        assert int(res["chosen"].min()) >= 0
        assert (np.asarray(res["chosen"]) != UNK_ID).all()

    def test_eos_wins_first_draw(self):
        # EOS is the argmax of the prefill logits: branch 0 ends at step
        # 0 (the other beam slots hold the next-best DISTINCT tokens and
        # keep decoding) and the final pick is the ended EOS branch
        vocab, n, beam = 8, 2, 3
        init = jax.nn.one_hot(
            jnp.full((n,), EOS_ID), vocab, dtype=jnp.float32) * 100.0
        res = beam_search(
            jax.random.PRNGKey(0), self._const_step(vocab), {}, init,
            beam_size=beam, top_k=4, temperature=1.0, max_len=5,
            greedy=True,
        )
        seq = np.asarray(res["chosen"])
        assert (seq[:, 0] == EOS_ID).all()
        assert (seq[:, 1:] == PAD_ID).all()
        ended = np.asarray(res["ended"])
        assert ended[:, 0].all() and not ended[:, 1:].any()

    def test_phases_equal_single_loop(self):
        # engine-level: a phased run must produce exactly the single-loop
        # result when every phase uses the same step_fn
        vocab, n, beam = 12, 2, 2
        init = jnp.tile(jnp.linspace(0.0, 2.0, vocab)[None], (n, 1))
        step = self._const_step(vocab)
        a = beam_search(
            jax.random.PRNGKey(9), step, {}, init, beam_size=beam,
            top_k=6, temperature=1.0, max_len=8,
        )
        b = beam_search(
            jax.random.PRNGKey(9), step, {}, init, beam_size=beam,
            top_k=6, temperature=1.0, max_len=8,
            phases=[(2, step), (5, step), (99, step)],
        )
        for k in ("chosen", "sequences", "scores", "ended"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_xla_exhausted_support_no_unk_no_nan():
    # beam_size == top_k with UNK inside the top-K set: the kept support
    # has fewer candidates than draws. The XLA exact path must not emit
    # UNK or NaN scores (the pallas kernel's bug class, fixed there
    # first); draws falling on filtered slots take the best unfiltered
    # candidate instead.
    from deephumor_tpu.models.sampling import _topk_space_draw

    V = 32
    row = np.full((4, V), -10.0, np.float32)
    row[:, :3] = [3.0, 2.0, 1.0]
    row[:, 1] = 4.0  # UNK (index 1) on top, inside the top_k=3 set
    for greedy in (False, True):
        tokens, scores = _topk_space_draw(
            jax.random.PRNGKey(0), jnp.asarray(row), top_k=3, k=3,
            inv_t=jnp.float32(1.0), greedy=greedy, unk_index=1)
        tokens = np.asarray(tokens); scores = np.asarray(scores)
        assert (tokens != 1).all(), tokens
        assert (tokens >= 0).all() and (tokens < V).all()
        assert np.isfinite(scores).all(), scores
    # ultra-degenerate: top_k == 1 and UNK is the argmax — token 0 at
    # finite score (reference raises here; kernel falls back to column 0)
    tokens, scores = _topk_space_draw(
        jax.random.PRNGKey(0), jnp.asarray(row), top_k=1, k=1,
        inv_t=jnp.float32(1.0), greedy=False, unk_index=1)
    assert (np.asarray(tokens) == 0).all()
    assert np.isfinite(np.asarray(scores)).all()


def test_compact_requires_pallas_attn():
    from deephumor_tpu.models import CaptioningTransformer

    model = CaptioningTransformer(
        num_tokens=64, hid_dim=32, n_layers=2, n_heads=2, pf_dim=64,
        max_len=20,
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    spa = jnp.asarray(rng.normal(size=(4, 49, 32)).astype(np.float32))
    with pytest.raises(ValueError, match="pallas"):
        model.generate_from_emb(
            params, (emb, spa), key=jax.random.PRNGKey(1), max_len=8,
            beam_size=2, top_k=4, attn="xla", compact=True)


def test_canon_no_ids_guarded_behind_bench_unsafe():
    # DH_CANON_NO_IDS disables the straggler-recompute kernel and makes
    # canon attention INCORRECT for straggler rows — a timing-only probe.
    # Setting it without DH_BENCH_UNSAFE=1 must refuse at import so a
    # stray env var can't silently corrupt a serving process
    # (models/transformer.py module-level guard).
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("DH_CANON_NO_IDS", "DH_BENCH_UNSAFE")}
    env["JAX_PLATFORMS"] = "cpu"
    code = "import deephumor_tpu.models.transformer"

    proc = subprocess.run(
        [sys.executable, "-c", code],
        env={**env, "DH_CANON_NO_IDS": "1"},
        capture_output=True, text=True, timeout=300)
    assert proc.returncode != 0
    assert "DH_BENCH_UNSAFE" in proc.stderr

    proc = subprocess.run(
        [sys.executable, "-c", code],
        env={**env, "DH_CANON_NO_IDS": "1", "DH_BENCH_UNSAFE": "1"},
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr


def test_fused_survivor_update_wiring_token_equal():
    """DH_FUSED_SURVIVOR=1 (the opt-in fused bookkeeping path) must be
    draw-for-draw identical to the default engine. Subprocess: the knob
    is import-time and the generation executable cache does not key on
    it. On CPU the fused path routes through pallas_engine's XLA
    reference; the real kernel body is covered by
    test_pallas_attention.py + hw_window step 6."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "DH_FUSED_SURVIVOR"}
    env["JAX_PLATFORMS"] = "cpu"
    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from deephumor_tpu.models import CaptioningTransformer
from deephumor_tpu.models import caption_models as cm
assert cm._FUSED_SURVIVOR
model = CaptioningTransformer(num_tokens=64, hid_dim=32, n_layers=2,
                              n_heads=2, pf_dim=64, max_len=40)
params = model.init(jax.random.PRNGKey(0))
rng = np.random.default_rng(1)
emb = jnp.asarray(rng.normal(size=(6, 32)).astype(np.float32))
spa = jnp.asarray(rng.normal(size=(6, 49, 32)).astype(np.float32))
out = model.generate_from_emb(params, (emb, spa), key=jax.random.PRNGKey(7),
                              max_len=32, beam_size=4, top_k=8,
                              temperature=1.1, attn="pallas_interpret")
print("TOKENS", np.asarray(out["chosen"]).tolist())
"""
    outs = {}
    for fused in ("0", "1"):
        e = dict(env)
        if fused == "1":
            e["DH_FUSED_SURVIVOR"] = "1"
        else:
            code_run = code.replace("assert cm._FUSED_SURVIVOR",
                                    "assert not cm._FUSED_SURVIVOR")
        proc = subprocess.run(
            [sys.executable, "-c",
             code if fused == "1" else code_run],
            env=e, capture_output=True, text=True, timeout=1200)
        assert proc.returncode == 0, proc.stderr[-3000:]
        outs[fused] = proc.stdout
    tok = [ln for ln in outs["0"].splitlines() if ln.startswith("TOKENS")]
    tok1 = [ln for ln in outs["1"].splitlines() if ln.startswith("TOKENS")]
    assert tok and tok == tok1

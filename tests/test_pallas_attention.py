"""Fused Pallas ancestry-beam attention — interpret-mode tests (CPU).

Reference semantics: the XLA einsum formulation in
deephumor_tpu/models/transformer.py::_ancestry_attention (itself parity-
tested against shuffled-cache beam attention in test_generation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deephumor_tpu.ops.pallas_attention import (
    ancestry_attention, ancestry_bias)

B, BEAM, P, H, D = 4, 5, 16, 4, 64
ROWS = B * BEAM


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(ROWS, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(ROWS, P, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(ROWS, P, D)).astype(np.float32))
    anc = jnp.asarray(
        rng.integers(0, BEAM, size=(B, BEAM, P)).astype(np.int32))
    valid = np.zeros((ROWS, P), bool)
    for r, n in enumerate(rng.integers(1, P + 1, size=ROWS)):
        valid[r, :n] = True
    return q, k, v, anc, jnp.asarray(valid)


def _einsum_reference(q, k, v, anc, valid):
    head_dim = D // H
    scale = head_dim ** 0.5
    onehot = jax.nn.one_hot(anc, BEAM)  # [B, j, p, i]
    qq = q.reshape(B, BEAM, H, head_dim)
    kk = k.reshape(B, BEAM, P, H, head_dim)
    vv = v.reshape(B, BEAM, P, H, head_dim)
    energy = jnp.einsum(
        "bjhip,bjpi->bjhp",
        jnp.einsum("bjhd,biphd->bjhip", qq, kk) / scale, onehot)
    energy = jnp.where(~valid.reshape(B, BEAM, 1, P), -1e8, energy)
    attn = jax.nn.softmax(energy, axis=-1)
    w = jnp.einsum("bjhp,bjpi->bjhpi", attn, onehot)
    return jnp.einsum("bjhpi,biphd->bjhd", w, vv).reshape(ROWS, D)


@pytest.mark.parametrize("impl", ["native4d", "grouped", "blockdiag"])
def test_matches_einsum_reference(data, impl):
    q, k, v, anc, valid = data
    want = np.asarray(_einsum_reference(q, k, v, anc, valid))
    got = np.asarray(ancestry_attention(
        q, k, v, ancestry_bias(anc, valid, P), beam=BEAM, n_heads=H,
        interpret=True, impl=impl))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_single_item_block_fallback(data):
    # num_items=1 (the single-meme latency path): the block must cover the
    # whole row axis even though beam=5 rows are not sublane-aligned
    q, k, v, anc, valid = data
    q1, k1, v1 = q[:BEAM], k[:BEAM], v[:BEAM]
    anc1, valid1 = anc[:1], valid[:BEAM]
    want = np.asarray(_einsum_reference(q, k, v, anc, valid))[:BEAM]
    got = np.asarray(ancestry_attention(
        q1, k1, v1, ancestry_bias(anc1, valid1, P), beam=BEAM, n_heads=H,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bias_selects_ancestor_and_validity():
    anc = jnp.asarray([[[1, 0], [0, 1]]], jnp.int32)  # [1, beam=2, P=2]
    valid = jnp.asarray([[True, False], [True, True]])
    bias = np.asarray(ancestry_bias(anc, valid, 2, flat=False))
    assert bias.shape == (1, 2, 2, 2)
    # branch 0: ancestor slot 1 at pos 0 (valid), pos 1 invalid everywhere
    assert bias[0, 0, 1, 0] == 0 and bias[0, 0, 0, 0] < -1e7
    assert (bias[0, 0, :, 1] < -1e7).all()
    # branch 1: slot 0 at pos 0, slot 1 at pos 1
    assert bias[0, 1, 0, 0] == 0 and bias[0, 1, 1, 1] == 0


def test_generation_parity_xla_vs_pallas():
    # end-to-end: the attn="pallas_interpret" path must pick the same
    # greedy tokens as the XLA einsum path
    from deephumor_tpu.models import CaptioningTransformer

    model = CaptioningTransformer(
        num_tokens=64, hid_dim=32, n_layers=2, n_heads=2, pf_dim=64,
        max_len=12,
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
    outs = {}
    for attn in ("xla", "pallas_interpret"):
        out = model.generate(
            params, imgs, key=jax.random.PRNGKey(7), max_len=8,
            beam_size=4, top_k=8, greedy=True, attn=attn)
        outs[attn] = np.asarray(out["chosen"])
    np.testing.assert_array_equal(outs["xla"], outs["pallas_interpret"])


def test_fused_update_matches_write_then_attend(data):
    # ancestry_attention_update == cache[:, pos] = new; ancestry_attention
    from deephumor_tpu.ops.pallas_attention import ancestry_attention_update

    q, k, v, anc, valid = data
    rng = np.random.default_rng(7)
    k_new = jnp.asarray(rng.normal(size=(ROWS, D)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(ROWS, D)).astype(np.float32))
    pos = 5
    bias = ancestry_bias(anc, valid, P)

    ck = np.asarray(k).copy()
    cv = np.asarray(v).copy()
    ck[:, pos] = np.asarray(k_new)
    cv[:, pos] = np.asarray(v_new)
    want_anc = np.asarray(anc).copy()
    want = np.asarray(_einsum_reference(
        q, jnp.asarray(ck), jnp.asarray(cv), jnp.asarray(want_anc), valid))

    out, k2, v2 = ancestry_attention_update(
        q, k, v, k_new, v_new, bias, pos, beam=BEAM, n_heads=H,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(k2), ck, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), cv, atol=1e-6)


def test_flash_variant_matches_fused_update(data):
    # position-staged kernel (kept as a documented negative result for the
    # serving path) must still be numerically exact at every tile boundary
    from deephumor_tpu.ops.pallas_attention import (
        ancestry_attention_update, ancestry_attention_update_flash)

    q, k, v, anc, _ = data
    rng = np.random.default_rng(3)
    k_new = jnp.asarray(rng.normal(size=(ROWS, D)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(ROWS, D)).astype(np.float32))
    for pos in (0, 7, 8, 15):
        valid = np.zeros((ROWS, P), bool)
        valid[:, :pos + 1] = True
        bias = ancestry_bias(anc, jnp.asarray(valid), P)
        o1, k1, v1 = ancestry_attention_update(
            q, k, v, k_new, v_new, bias, pos, beam=BEAM, n_heads=H,
            interpret=True)
        o2, k2, v2 = ancestry_attention_update_flash(
            q, k, v, k_new, v_new, bias, pos, beam=BEAM, n_heads=H,
            interpret=True)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   atol=2e-5)
        np.testing.assert_array_equal(np.asarray(k2), np.asarray(k1))
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))

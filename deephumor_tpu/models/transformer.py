"""Transformer decoders (cross-attention and decoder-only variants).

Functional rebuild of the reference transformer stack
(/root/reference/deephumor/models/transformers.py):

- post-LN vanilla blocks, learned positional embeddings,
- token embeddings *divided* by sqrt(hid_dim) (transformers.py:286,462,713 —
  divide, not multiply; a reference quirk the checkpoints bake in),
- boolean masks filled with -1e8 before softmax (transformers.py:113-117),
- ``TransformerDecoder``: prepends the global image embedding as position 0
  and cross-attends over the 49 spatial embeddings; the reference pads
  decoder input and encoder output to a common length to satisfy its
  equal-length MHA (transformers.py:449-452) — the full forward here
  reproduces that exactly for training/logit parity,
- ``SelfAttentionTransformerDecoder``: same minus cross-attention.

The reference's ``generate`` re-runs the full forward over a max_len buffer
every step (transformers.py:547-573, no KV cache). Here the decode path is
an incremental per-position step over K/V caches (see ``decode_step``),
mathematically identical on the greedy path because masked key positions
contribute exactly 0 attention weight (exp(-1e8 - max) underflows to 0 in
f32), and designed to run under a single jitted ``lax.scan``
(deephumor_tpu/models/sampling.py).

The per-head scale sqrt(head_dim) and embedding scale sqrt(hid_dim) are
computed from hyperparameters rather than stored (the reference keeps them
as non-trainable checkpoint params, transformers.py:77-80 — constants with
fixed values; the converter drops them).
"""

import functools
import math
import os

import jax
import jax.numpy as jnp

from deephumor_tpu.models import layers as L
from deephumor_tpu.ops import pallas_attention as pallas_attn

# timing-probe knob, read ONCE at import: it changes the traced program,
# and the engine's compiled-generate lru_cache does not key on it — a
# mid-process toggle would silently reuse the stale executable.
#
# Misuse guard: this knob disables the correctness-restoring straggler
# recompute (ids kernel) and makes straggler rows silently garbage — it is
# ONLY meaningful inside timing benchmarks. Refuse to honor it unless the
# process also opts into DH_BENCH_UNSAFE=1, so a stray env var can never
# corrupt a serving process.
_CANON_NO_IDS = os.environ.get("DH_CANON_NO_IDS", "").lower() in (
    "1", "true", "yes", "on")
if _CANON_NO_IDS and os.environ.get("DH_BENCH_UNSAFE", "") != "1":
    raise RuntimeError(
        "DH_CANON_NO_IDS is a benchmark-only probe that produces INCORRECT "
        "attention for straggler rows. Set DH_BENCH_UNSAFE=1 as well to "
        "confirm this process is a timing benchmark, or unset "
        "DH_CANON_NO_IDS.")

__all__ = [
    "mha_init",
    "mha_apply",
    "pff_init",
    "pff_apply",
    "encoder_layer_init",
    "encoder_layer_apply",
    "transformer_encoder_init",
    "transformer_encoder_forward",
    "transformer_decoder_init",
    "transformer_decoder_forward",
    "self_attn_decoder_init",
    "self_attn_decoder_forward",
    "init_cache",
    "precompute_cross_attention",
    "decode_step",
    "MASK_FILL",
]

MASK_FILL = -1e8

# MHA layout selection, read once at import; both forms are
# parity-tested. The transposed (split/merge) form is the DEFAULT: the
# head-native dot_general form measured neutral in the isolated
# decoder fwd+bwd A/B but 1.5-3.5% SLOWER in the full train step
# (bf16 3523.7 vs 3404.9 ex/s, tuned 6605.8 vs 6502.3 — bench legs,
# 2026-08-21, same session); XLA:TPU schedules the explicit transposes
# better than its internal dot-operand relayouts here. DH_MHA_LEGACY=0
# selects the head-native form for re-measurement.
_MHA_LEGACY = os.environ.get("DH_MHA_LEGACY", "1") != "0"

# DH_CROSS_PACK=<ng> fuses ng items per block-diagonal dot in decode
# cross-attention (WORD_PERF lever #5; needs the tile-padded cross
# store, which caption models build automatically when this is set).
# 0/unset = the per-item grouped kernel.
_CROSS_PACK = int(os.environ.get("DH_CROSS_PACK", "0") or 0)

# decode cross-attention block size (items per grid step). The round-5
# isolated sweep (benchmarks/cross_sweep.py) measured 2.8 ms/layer at
# the old default 16 vs 0.57 at 56 (G=896, r=5) — the kernel is
# grid-issue-bound, bigger blocks amortize it. _pick_block_items falls
# back gracefully for shapes 56 does not divide.
_CROSS_BLOCK = int(os.environ.get("DH_CROSS_BLOCK", "16") or 16)


# ---------------------------------------------------------------------------
# Attention / feed-forward primitives
# ---------------------------------------------------------------------------

def mha_init(key, hid_dim, dtype=jnp.float32):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "fc_q": L.linear_init(kq, hid_dim, hid_dim, dtype),
        "fc_k": L.linear_init(kk, hid_dim, hid_dim, dtype),
        "fc_v": L.linear_init(kv, hid_dim, hid_dim, dtype),
        "fc_o": L.linear_init(ko, hid_dim, hid_dim, dtype),
    }


def _mha_apply_legacy(params, query, key, value, n_heads, mask=None,
                      dropout=0.0, train=False, rng=None):
    """Transposed-layout MHA (the DEFAULT): split to [bs, H, T, hd]
    with physical transposes around the per-head einsums. Measured
    faster in the full train step than the head-native dot_general form
    (see the _MHA_LEGACY note); A/B via DH_MHA_LEGACY=0 /
    benchmarks/attn_train_ab."""
    head_dim = query.shape[-1] // n_heads
    scale = math.sqrt(head_dim)

    def split(x):
        bs, t, d = x.shape
        return x.reshape(bs, t, n_heads, head_dim).transpose(0, 2, 1, 3)

    q = split(L.linear(params["fc_q"], query))
    k = split(L.linear(params["fc_k"], key))
    v = split(L.linear(params["fc_v"], value))

    energy = jnp.einsum("bhqd,bhkd->bhqk", q, k) / scale
    if mask is not None:
        energy = jnp.where(mask[:, None, :, :], MASK_FILL, energy)
    attn = jax.nn.softmax(energy, axis=-1)
    if train and dropout > 0.0:
        attn = L.dropout(rng, attn, dropout, train)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    bs, h, t, hd = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(bs, t, h * hd)
    return L.linear(params["fc_o"], out)


def mha_apply(params, query, key, value, n_heads, mask=None,
              dropout=0.0, train=False, rng=None):
    """Multi-head attention, head-layout-native (TRAIN_PERF lever).

    Activations stay ``[bs, T, H, hd]`` — per-head dots are expressed
    with explicit ``dot_general`` dimension numbers (batch dims
    ``(bs, H)`` in place) instead of transposing to ``[bs, H, T, hd]``
    first, and the head merge folds into the output projection (one
    ``(H, hd)``-contracting dot against the reshaped ``fc_o`` kernel).
    The round-4 trace measured 72 physical-layout copies/step
    (~620 MB of pure relayout) from the old split/merge transposes
    fwd+bwd (docs/TRAIN_PERF.md). Contractions are unchanged
    dim-for-dim, so results match the transposed form to float
    associativity.

    Args:
        query/key/value: ``[bs, Tq|Tk, D]``.
        mask: bool ``[bs, Tq, Tk]``, True = masked out (-1e8 fill).

    Returns: ``[bs, Tq, D]``.
    """
    if _MHA_LEGACY:
        return _mha_apply_legacy(params, query, key, value, n_heads,
                                 mask, dropout, train, rng)
    d_model = query.shape[-1]
    head_dim = d_model // n_heads
    scale = math.sqrt(head_dim)

    bq, tq = query.shape[0], query.shape[1]
    tk = key.shape[1]
    q = L.linear(params["fc_q"], query).reshape(bq, tq, n_heads, head_dim)
    k = L.linear(params["fc_k"], key).reshape(bq, tk, n_heads, head_dim)
    v = L.linear(params["fc_v"], value).reshape(bq, tk, n_heads, head_dim)

    # [bs, H, Tq, Tk] — batch (bs, H), contract hd (minor-most on both)
    energy = jax.lax.dot_general(
        q, k, dimension_numbers=(((3,), (3,)), ((0, 2), (0, 2)))
    ) / scale
    if mask is not None:
        energy = jnp.where(mask[:, None, :, :], MASK_FILL, energy)
    attn = jax.nn.softmax(energy, axis=-1)
    if train and dropout > 0.0:
        attn = L.dropout(rng, attn, dropout, train)
    # [bs, H, Tq, hd] — batch (bs, H), contract Tk
    out = jax.lax.dot_general(
        attn, v, dimension_numbers=(((3,), (1,)), ((0, 1), (0, 2)))
    )
    # head merge + output projection in one dot: contract (H, hd)
    # against the fc_o kernel viewed as [H, hd, D]
    wo = params["fc_o"]["kernel"].reshape(n_heads, head_dim, d_model)
    proj = jax.lax.dot_general(
        out, wo, dimension_numbers=(((1, 3), (0, 1)), ((), ()))
    )
    return proj + params["fc_o"]["bias"]


def pff_init(key, hid_dim, pf_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc_1": L.linear_init(k1, hid_dim, pf_dim, dtype),
        "fc_2": L.linear_init(k2, pf_dim, hid_dim, dtype),
    }


def pff_apply(params, x, dropout=0.0, train=False, rng=None):
    h = jax.nn.relu(L.linear(params["fc_1"], x))
    if train and dropout > 0.0:
        h = L.dropout(rng, h, dropout, train)
    return L.linear(params["fc_2"], h)


# ---------------------------------------------------------------------------
# Mask helpers (parity: transformers.py:12-40)
# ---------------------------------------------------------------------------

def get_pad_mask(query_ids, key_ids, pad_index=0):
    """Bool ``[bs, Tq, Tk]``: True where the key position is padding."""
    mask = key_ids == pad_index
    return jnp.broadcast_to(
        mask[:, None, :], (query_ids.shape[0], query_ids.shape[1], key_ids.shape[1])
    )


def get_autoregressive_mask(bs, seq_len):
    """Bool upper-triangular ``[bs, T, T]``: True above the diagonal."""
    tri = jnp.triu(jnp.ones((seq_len, seq_len), jnp.bool_), k=1)
    return jnp.broadcast_to(tri[None], (bs, seq_len, seq_len))


# ---------------------------------------------------------------------------
# Layer blocks (post-LN)
# ---------------------------------------------------------------------------

def _decoder_layer_init(key, hid_dim, pf_dim, cross_attention, dtype):
    keys = jax.random.split(key, 3)
    params = {
        "self_attn": mha_init(keys[0], hid_dim, dtype),
        "self_attn_ln": L.layer_norm_init(hid_dim, dtype),
        "pf": pff_init(keys[1], hid_dim, pf_dim, dtype),
        "pf_ln": L.layer_norm_init(hid_dim, dtype),
    }
    if cross_attention:
        params["enc_attn"] = mha_init(keys[2], hid_dim, dtype)
        params["enc_attn_ln"] = L.layer_norm_init(hid_dim, dtype)
    return params


def _decoder_layer_apply(params, x, n_heads, enc_out=None, input_mask=None,
                         enc_mask=None, dropout=0.0, train=False, rng=None):
    rngs = jax.random.split(rng, 6) if train and rng is not None else [None] * 6

    attn = mha_apply(params["self_attn"], x, x, x, n_heads, input_mask,
                     dropout, train, rngs[0])
    attn = L.dropout(rngs[1], attn, dropout, train) if train else attn
    x = L.layer_norm(params["self_attn_ln"], x + attn)

    if "enc_attn" in params:
        attn = mha_apply(params["enc_attn"], x, enc_out, enc_out, n_heads,
                         enc_mask, dropout, train, rngs[2])
        attn = L.dropout(rngs[3], attn, dropout, train) if train else attn
        x = L.layer_norm(params["enc_attn_ln"], x + attn)

    ff = pff_apply(params["pf"], x, dropout, train, rngs[4])
    ff = L.dropout(rngs[5], ff, dropout, train) if train else ff
    return L.layer_norm(params["pf_ln"], x + ff)


# ---------------------------------------------------------------------------
# Encoder stack
# ---------------------------------------------------------------------------
#
# The reference exports a TransformerEncoder that no caption model uses and
# whose forward is broken (transformers.py:298 references a nonexistent
# `self.padding_index` -> AttributeError with masking; SURVEY.md §2.1).
# This is the working equivalent: same architecture (post-LN encoder
# blocks, learned positions, tok_emb / sqrt(d)), functional API.

def encoder_layer_init(key, hid_dim=512, pf_dim=2048, dtype=jnp.float32):
    """Post-LN encoder block params (reference EncoderLayer,
    transformers.py:168-218)."""
    return _decoder_layer_init(key, hid_dim, pf_dim, cross_attention=False,
                               dtype=dtype)


def encoder_layer_apply(params, x, n_heads, input_mask=None, dropout=0.0,
                        train=False, rng=None):
    return _decoder_layer_apply(params, x, n_heads, input_mask=input_mask,
                                dropout=dropout, train=train, rng=rng)


def transformer_encoder_init(key, num_tokens, hid_dim=512, n_layers=6,
                             pf_dim=2048, max_len=128, dtype=jnp.float32):
    """Encoder stack params (reference TransformerEncoder,
    transformers.py:221-306, minus the classifier it never had)."""
    keys = jax.random.split(key, n_layers + 2)
    return {
        "tok_embedding": L.embedding_init(keys[0], num_tokens, hid_dim,
                                          dtype),
        "pos_embedding": L.embedding_init(keys[1], max_len, hid_dim, dtype),
        "layers": [
            encoder_layer_init(keys[2 + i], hid_dim, pf_dim, dtype)
            for i in range(n_layers)
        ],
    }


def transformer_encoder_forward(params, tokens, n_heads, pad_index=None,
                                dropout=0.0, train=False, rng=None):
    """Encodes token sequences ``[bs, T] -> [bs, T, hid_dim]``.

    ``pad_index=None`` disables masking (the reference's intent at
    transformers.py:248); note the reference DIVIDES token embeddings by
    sqrt(hid_dim) (transformers.py:286), reproduced here.
    """
    bs, t = tokens.shape
    hid_dim = params["tok_embedding"]["table"].shape[1]
    pos_rows = params["pos_embedding"]["table"].shape[0]
    if t > pos_rows:
        raise ValueError(
            f"positional table has {pos_rows} rows but the sequence "
            f"needs {t}; construct the encoder with max_len >= {t}"
        )
    emb = L.embed(params["tok_embedding"], tokens) / math.sqrt(hid_dim)
    emb = emb + L.embed(params["pos_embedding"], jnp.arange(t)[None, :])

    rngs = jax.random.split(rng, len(params["layers"]) + 1) \
        if train and rng is not None else [None] * (len(params["layers"]) + 1)
    if train:
        emb = L.dropout(rngs[-1], emb, dropout, train)

    mask = None
    if pad_index is not None:
        mask = get_pad_mask(tokens, tokens, pad_index)

    x = emb
    for i, layer in enumerate(params["layers"]):
        x = encoder_layer_apply(layer, x, n_heads, input_mask=mask,
                                dropout=dropout, train=train, rng=rngs[i])
    return x


# ---------------------------------------------------------------------------
# Decoder stacks
# ---------------------------------------------------------------------------

def _stack_init(key, num_tokens, hid_dim, n_layers, pf_dim, max_len,
                cross_attention, dtype):
    keys = jax.random.split(key, n_layers + 3)
    params = {
        "tok_embedding": L.embedding_init(keys[0], num_tokens, hid_dim, dtype),
        "pos_embedding": L.embedding_init(keys[1], max_len, hid_dim, dtype),
        "layers": [
            _decoder_layer_init(keys[2 + i], hid_dim, pf_dim,
                                cross_attention, dtype)
            for i in range(n_layers)
        ],
        "classifier": L.linear_init(keys[2 + n_layers], hid_dim, num_tokens,
                                    dtype),
    }
    return params


def transformer_decoder_init(key, num_tokens, hid_dim=512, n_layers=6,
                             pf_dim=2048, max_len=128, dtype=jnp.float32):
    """Cross-attention decoder params (reference TransformerDecoder)."""
    return _stack_init(key, num_tokens, hid_dim, n_layers, pf_dim, max_len,
                       cross_attention=True, dtype=dtype)


def self_attn_decoder_init(key, num_tokens, hid_dim=512, n_layers=6,
                           pf_dim=2048, max_len=128, dtype=jnp.float32):
    """Decoder-only params (reference SelfAttentionTransformerDecoder)."""
    return _stack_init(key, num_tokens, hid_dim, n_layers, pf_dim, max_len,
                       cross_attention=False, dtype=dtype)


def transformer_decoder_forward(params, tokens, enc_out, start_emb, n_heads,
                                pad_index=0, dropout=0.0, train=False,
                                rng=None, rectangular=False):
    """Full teacher-forced forward with cross-attention.

    Reproduces the reference exactly (transformers.py:432-490), including
    padding decoder tokens and encoder outputs to a common length and
    deriving the encoder key mask from all-zero rows.

    Args:
        tokens: ``[bs, T]`` token ids.
        enc_out: ``[bs, T_enc, D]`` spatial image embeddings.
        start_emb: ``[bs, D]`` global image embedding (position 0).
        rectangular: skip the reference's pad-to-common-length quirk and
            run T+1 decoder positions against T_enc encoder keys
            directly. The pad positions only ever produce masked-out
            garbage the callers slice away, so logits at REAL positions
            are identical (divergence #13, docs/DIVERGENCES.md). NOTE:
            despite ~40% fewer decoder FLOPs this measured ~10% SLOWER
            end-to-end on v5e (the padded square shapes fuse better
            under XLA), so the Trainer keeps the padded default; the
            option remains for other shapes/backends. Dropout masks are
            shape-dependent: train-mode losses match the padded path in
            distribution, not sample-for-sample.

    Returns:
        logits ``[bs, max(T+1, T_enc), num_tokens]``
        (``[bs, T+1, num_tokens]`` when ``rectangular``).
    """
    bs, t = tokens.shape
    enc_len, hid_dim = enc_out.shape[1], enc_out.shape[2]
    dec_seq_len = t + 1  # start_emb occupies position 0
    seq_len = dec_seq_len if rectangular else max(dec_seq_len, enc_len)

    pos_rows = params["pos_embedding"]["table"].shape[0]
    if seq_len > pos_rows:
        # the pad-to-common-length quirk means training needs positions up
        # to max(T+1, T_enc). The reference crashes with an IndexError
        # here; jax would silently gather NaN fills — fail loudly instead.
        raise ValueError(
            f"positional table has {pos_rows} rows but the padded "
            f"sequence needs {seq_len} (decoder {dec_seq_len}, encoder "
            f"{enc_len}); construct the model with max_len >= "
            f"{seq_len}"
        )

    if not rectangular:
        # pad both streams to the common length (transformers.py:449-452)
        tokens = jnp.pad(tokens, ((0, 0), (0, seq_len - dec_seq_len)),
                         constant_values=pad_index)
        enc_out = jnp.pad(enc_out, ((0, 0), (0, seq_len - enc_len), (0, 0)))

    scale = math.sqrt(hid_dim)
    tok_emb = L.embed(params["tok_embedding"], tokens)
    tok_emb = jnp.concatenate([start_emb[:, None, :], tok_emb], axis=1)
    tok_emb = tok_emb / scale

    pos_rows = params["pos_embedding"]["table"].shape[0]
    if seq_len > pos_rows:
        # same loud failure as transformer_decoder_forward: jnp.take
        # would silently clamp and reuse the last position's embedding
        # (the reference IndexErrors here)
        raise ValueError(
            f"positional table has {pos_rows} rows but the sequence "
            f"needs {seq_len}; construct the model with max_len >= "
            f"{seq_len}"
        )
    pos = jnp.arange(seq_len)[None, :]
    emb = tok_emb + L.embed(params["pos_embedding"], pos)

    rngs = jax.random.split(rng, len(params["layers"]) + 1) \
        if train and rng is not None else [None] * (len(params["layers"]) + 1)
    if train:
        emb = L.dropout(rngs[-1], emb, dropout, train)

    # masks: the start position counts as a real token (id 1 placeholder,
    # transformers.py:473-475)
    ids_with_start = jnp.concatenate(
        [jnp.ones((bs, 1), tokens.dtype), tokens], axis=1
    )
    input_mask = get_pad_mask(ids_with_start, ids_with_start, pad_index) | \
        get_autoregressive_mask(bs, seq_len)

    # encoder key mask from all-zero rows (transformers.py:480-481)
    enc_valid = jnp.all(enc_out != 0.0, axis=-1).astype(jnp.int32)
    enc_mask = get_pad_mask(ids_with_start, enc_valid, pad_index)

    x = emb
    for i, layer in enumerate(params["layers"]):
        x = _decoder_layer_apply(layer, x, n_heads, enc_out, input_mask,
                                 enc_mask, dropout, train, rngs[i])
    return L.linear(params["classifier"], x)


def self_attn_decoder_forward(params, tokens, start_emb, n_heads,
                              pad_index=0, dropout=0.0, train=False,
                              rng=None):
    """Full teacher-forced forward, decoder-only variant
    (parity: transformers.py:687-738)."""
    bs, t = tokens.shape
    hid_dim = start_emb.shape[-1]
    seq_len = t + 1

    scale = math.sqrt(hid_dim)
    tok_emb = L.embed(params["tok_embedding"], tokens)
    tok_emb = jnp.concatenate([start_emb[:, None, :], tok_emb], axis=1)
    tok_emb = tok_emb / scale

    pos_rows = params["pos_embedding"]["table"].shape[0]
    if seq_len > pos_rows:
        # same loud failure as transformer_decoder_forward: jnp.take
        # would silently clamp and reuse the last position's embedding
        # (the reference IndexErrors here)
        raise ValueError(
            f"positional table has {pos_rows} rows but the sequence "
            f"needs {seq_len}; construct the model with max_len >= "
            f"{seq_len}"
        )
    pos = jnp.arange(seq_len)[None, :]
    emb = tok_emb + L.embed(params["pos_embedding"], pos)

    rngs = jax.random.split(rng, len(params["layers"]) + 1) \
        if train and rng is not None else [None] * (len(params["layers"]) + 1)
    if train:
        emb = L.dropout(rngs[-1], emb, dropout, train)

    ids_with_start = jnp.concatenate(
        [jnp.ones((bs, 1), tokens.dtype), tokens], axis=1
    )
    input_mask = get_pad_mask(ids_with_start, ids_with_start, pad_index) | \
        get_autoregressive_mask(bs, seq_len)

    x = emb
    for i, layer in enumerate(params["layers"]):
        x = _decoder_layer_apply(layer, x, n_heads, input_mask=input_mask,
                                 dropout=dropout, train=train, rng=rngs[i])
    return L.linear(params["classifier"], x)


# ---------------------------------------------------------------------------
# Incremental decode with KV caches (the TPU-native generation path)
# ---------------------------------------------------------------------------

def init_cache(params, bs, max_positions, dtype=jnp.float32):
    """Per-layer self-attention K/V caches ``[bs, P, D]``.

    ``P`` is ``max_positions`` rounded up to the 8-sublane tile so the
    Pallas cache-write kernel can address whole position tiles; the tail
    positions are never written and masked out by validity everywhere.
    """
    hid_dim = params["tok_embedding"]["table"].shape[1]
    p = -(-max_positions // 8) * 8
    return [
        {
            "k": jnp.zeros((bs, p, hid_dim), dtype),
            "v": jnp.zeros((bs, p, hid_dim), dtype),
        }
        for _ in params["layers"]
    ]


def precompute_cross_attention(params, enc_out, pad_to_tile=False):
    """Per-layer cross-attention keys/values over the (fixed) encoder
    output — computed once per generation instead of per step.

    Args:
        pad_to_tile: zero-pad the T axis up to a multiple of 8 (the TPU
            sublane tile) so the packed cross-attention kernel
            (``grouped_cross_attention(pack_items=...)``) can merge
            (item, T) tile-aligned. Callers must then pass
            ``t_real`` = the unpadded T so pad columns are masked.
    """
    if pad_to_tile:
        t = enc_out.shape[-2]
        t_pad = -(-t // 8) * 8
        if t_pad != t:
            pad = [(0, 0)] * (enc_out.ndim - 2) + [(0, t_pad - t), (0, 0)]
            enc_out = jnp.pad(enc_out, pad)
    cross = []
    for layer in params["layers"]:
        if "enc_attn" not in layer:
            cross.append(None)
        else:
            cross.append(
                {
                    "ek": L.linear(layer["enc_attn"]["fc_k"], enc_out),
                    "ev": L.linear(layer["enc_attn"]["fc_v"], enc_out),
                }
            )
    return cross


def _cached_attention(attn_params, x, cache_k, cache_v, n_heads, key_mask,
                      q=None):
    """Single-query attention against cached keys/values.

    Args:
        x: query input ``[bs, D]``.
        cache_k/cache_v: ``[bs, T, D]`` (already projected).
        key_mask: bool ``[bs, T]``, True = masked.
        q: optional pre-projected query (from a fused QKV matmul).
    """
    bs, t, d = cache_k.shape
    head_dim = d // n_heads
    scale = math.sqrt(head_dim)

    if q is None:
        q = L.linear(attn_params["fc_q"], x)
    q = q.reshape(bs, n_heads, 1, head_dim)
    k = cache_k.reshape(bs, t, n_heads, head_dim).transpose(0, 2, 1, 3)
    v = cache_v.reshape(bs, t, n_heads, head_dim).transpose(0, 2, 1, 3)

    energy = jnp.einsum("bhqd,bhkd->bhqk", q, k) / scale
    energy = jnp.where(key_mask[:, None, None, :], MASK_FILL, energy)
    attn = jax.nn.softmax(energy, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).reshape(bs, d)
    return L.linear(attn_params["fc_o"], out)


def _grouped_attention(attn_params, x, k_all, v_all, n_heads, key_mask):
    """Attention of ``G*r`` query rows against per-group keys/values.

    The cross-attention K/V are constant per generated item, while the
    decode batch carries ``beam`` rows per item — sharing them here (instead
    of tiling to ``G*r`` and shuffling them with the beams every step)
    removes hundreds of MB of per-step HBM traffic.

    Args:
        x: queries ``[G*r, D]``.
        k_all/v_all: ``[G, T, D]`` (already projected).
        key_mask: bool ``[G, T]`` or None, True = masked.
    """
    g, t, d = k_all.shape
    r = x.shape[0] // g
    head_dim = d // n_heads
    scale = math.sqrt(head_dim)

    q = L.linear(attn_params["fc_q"], x).reshape(g, r, n_heads, head_dim)
    k = k_all.reshape(g, t, n_heads, head_dim)
    v = v_all.reshape(g, t, n_heads, head_dim)

    energy = jnp.einsum("grhd,gthd->grht", q, k) / scale
    if key_mask is not None:
        energy = jnp.where(key_mask[:, None, None, :], MASK_FILL, energy)
    attn = jax.nn.softmax(energy, axis=-1)
    out = jnp.einsum("grht,gthd->grhd", attn, v).reshape(g * r, d)
    return L.linear(attn_params["fc_o"], out)


def _ancestry_attention(attn_params, x, cache_k, cache_v, anc_onehot,
                        n_heads, key_valid, q=None):
    """Single-query self-attention over UNSHUFFLED per-slot caches.

    Beam search conventionally reorders the whole KV cache to surviving
    branches every step — at serving batch sizes that shuffle is the single
    most expensive op (hundreds of MB of HBM traffic per token). Here the
    cache rows stay put; each branch carries an ancestry table saying which
    physical slot wrote its key at every past position, and attention
    gathers energies through a tiny one-hot einsum instead. Extra compute:
    O(beam) more QK/AV dot products — a few hundred MFLOPs — in exchange
    for zero cache movement.

    Args:
        x: queries ``[B*beam, D]`` (beam = anc_onehot.shape[-1]).
        cache_k/cache_v: ``[B*beam, P, D]`` per-slot caches.
        anc_onehot: ``[B, beam, P, beam]`` — anc_onehot[b, j, p, i] = 1 iff
            branch j's token at position p lives in slot i.
        key_valid: bool ``[B*beam, P]`` — branch-local validity (travels
            with the branch, already reordered by the engine).
    """
    total, p, d = cache_k.shape
    beam = anc_onehot.shape[-1]
    b = total // beam
    head_dim = d // n_heads
    scale = math.sqrt(head_dim)

    if q is None:
        q = L.linear(attn_params["fc_q"], x)
    q = q.reshape(b, beam, n_heads, head_dim)
    k = cache_k.reshape(b, beam, p, n_heads, head_dim)
    v = cache_v.reshape(b, beam, p, n_heads, head_dim)

    # energies of every branch j against every slot i's keys, then select
    # the ancestor slot per (j, position)
    energy_all = jnp.einsum("bjhd,biphd->bjhip", q, k) / scale
    energy = jnp.einsum(
        "bjhip,bjpi->bjhp", energy_all, anc_onehot.astype(energy_all.dtype)
    )
    energy = energy.astype(jnp.float32)
    energy = jnp.where(
        ~key_valid.reshape(b, beam, 1, p), MASK_FILL, energy
    )
    attn = jax.nn.softmax(energy, axis=-1).astype(x.dtype)

    weights = jnp.einsum("bjhp,bjpi->bjhpi", attn,
                         anc_onehot.astype(attn.dtype))
    out = jnp.einsum("bjhpi,biphd->bjhd", weights, v).reshape(total, d)
    return L.linear(attn_params["fc_o"], out)


def decode_step(params, token_emb_scaled, pos, cache, self_key_valid,
                n_heads, cross=None, enc_key_mask=None, anc=None,
                attn_impl="xla", p_eff=None, return_hidden=False,
                live_items=None, canon=None, cross_t_real=None):
    """One incremental decode position.

    Args:
        params: decoder stack params.
        token_emb_scaled: ``[bs, D]`` — the position's input embedding
            already divided by sqrt(hid_dim) (start_emb/scale for position 0,
            embed(token)/scale otherwise).
        pos: scalar int32 — absolute position (indexes pos_embedding).
        cache: list from :func:`init_cache`; K/V written at ``pos``.
        self_key_valid: bool ``[bs, max_positions]`` — True where the cached
            position holds a real (non-pad) token at index <= pos. Replaces
            the reference's pad+autoregressive masks in incremental form.
        cross: optional list from :func:`precompute_cross_attention`;
            batch dim may be ``bs`` or a divisor of it (``bs / beam``
            groups — see :func:`_grouped_attention`).
        enc_key_mask: optional bool ``[groups, T_enc]``, True = masked
            encoder row (the reference masks all-zero rows).
        anc: optional ``[B, beam, max_positions]`` int32 ancestry table —
            switches self-attention to the unshuffled-cache beam form.
        attn_impl: "xla" (einsum ancestry attention) or "pallas" /
            "pallas_interpret" (ops/pallas_attention.py fused kernel —
            reads the caches once in their stored layout).
        p_eff: optional STATIC cache-read budget for the pallas path —
            the attention kernel streams only the first ``p_eff``
            positions of each cache (a partial BlockSpec read; the tail
            never leaves HBM). Must be a multiple of 8 covering every
            valid position (pos < p_eff). The generation engine runs the
            decode loop in p_eff phases (sampling.beam_search ``phases``)
            — a per-step ``lax.switch`` over variants was measured and
            REVERTED in round 2: XLA cannot donate the aliased cache
            buffers through a conditional, so every branch boundary
            materialized full cache copies. Sequential while_loops keep
            the alias chain intact.
        live_items: optional traced int32 — live-item count for the
            pallas kernels' dead-block skipping (the engine's early-EOS
            compaction keeps live items leading; see
            ops/pallas_attention.ancestry_attention_update).
        canon: optional canonical-prefix bundle (pallas path only) from
            the engine's phase-boundary canonicalization
            (caption_models._canonicalize_state): ``{"c": static int,
            "shared": [{"sk","sv"} per layer], "bias_sh": [B, 1, c],
            "strag_ids": [B] int32, "n_strag": int32,
            "strag_rows": [bs] bool}``. Self-attention then streams ONE
            shared row per coalesced position below ``c`` (1/beam of
            the cache bytes) plus the per-slot window ``[c, p_eff)``;
            straggler items are recomputed full-width via
            ops/pallas_attention.ancestry_attention_ids and merged by
            row mask.

    Returns:
        (logits ``[bs, num_tokens]``, updated cache)
    """
    x = token_emb_scaled + L.embed(params["pos_embedding"], pos)

    # a tile-padded cross store (precompute_cross_attention(pad_to_tile=
    # True), packed-kernel mode) carries zero K rows past cross_t_real —
    # widen the encoder key mask so EVERY cross path masks them
    if cross is not None and enc_key_mask is not None:
        t_cross = next(
            (c["ek"].shape[1] for c in cross if c is not None),
            enc_key_mask.shape[-1])
        if enc_key_mask.shape[-1] < t_cross:
            enc_key_mask = jnp.pad(
                enc_key_mask,
                ((0, 0), (0, t_cross - enc_key_mask.shape[-1])),
                constant_values=True)

    # the cache position axis is padded to the 8-sublane tile
    # (init_cache); widen validity/ancestry so every path masks the tail
    p_cache = cache[0]["k"].shape[1]
    p_valid = self_key_valid.shape[-1]
    if p_cache != p_valid:
        self_key_valid = jnp.pad(
            self_key_valid, ((0, 0), (0, p_cache - p_valid)))
        if anc is not None:
            anc = jnp.pad(anc, ((0, 0), (0, 0), (0, p_cache - p_valid)))
    key_mask = ~self_key_valid

    anc_onehot = anc_bias = bias_win = None
    use_pallas_cache = False
    if anc is not None:
        if attn_impl.startswith("pallas"):
            # selection + validity folded into one additive bias, computed
            # once per step and shared by every layer
            anc_bias = pallas_attn.ancestry_bias(anc, self_key_valid,
                                                 p_cache)
            use_pallas_cache = True
            if canon is not None:
                # window-only bias for the canonical kernel (same fold,
                # restricted to the still-diverging tip [c, p_eff))
                c = canon["c"]
                pe_k = p_cache if p_eff is None else min(p_eff, p_cache)
                bias_win = pallas_attn.ancestry_bias(
                    anc[:, :, c:pe_k], self_key_valid[:, c:pe_k],
                    pe_k - c)
        else:
            anc_onehot = jax.nn.one_hot(anc, anc.shape[1], dtype=x.dtype)

    new_cache = []
    for i, layer in enumerate(params["layers"]):
        sa = layer["self_attn"]
        # fused QKV projection: one [D, 3D] matmul per layer instead of
        # three; the weight concat is loop-invariant and hoists out of the
        # decode scan
        qkv_w = jnp.concatenate(
            [sa["fc_q"]["kernel"], sa["fc_k"]["kernel"], sa["fc_v"]["kernel"]],
            axis=1,
        )
        qkv_b = jnp.concatenate(
            [sa["fc_q"]["bias"], sa["fc_k"]["bias"], sa["fc_v"]["bias"]]
        )
        q_new, k_new, v_new = jnp.split(x @ qkv_w + qkv_b, 3, axis=-1)
        if anc_bias is not None:
            # FUSED cache write + attention: the kernel substitutes this
            # position's K/V into its streamed blocks, DMAs the touched
            # 8-tile back in place (caches aliased/donated — no XLA dus,
            # which costs a full cache copy per layer per step). The
            # static ``p_eff`` (see docstring) restricts the read to the
            # live cache prefix. (ancestry_attention_update_flash —
            # position-staged tile reads — was measured end-to-end and
            # reverted: the per-tile flash bookkeeping quintuples the
            # kernel's issue count, far more than the DMA savings.)
            interp = attn_impl == "pallas_interpret"
            if canon is not None:
                # shared-prefix kernel for coalesced items (1/beam cache
                # bytes below c) + scalar-prefetch full-width recompute
                # of the straggler items, merged by row mask
                attn, cache_k, cache_v = (
                    pallas_attn.ancestry_attention_update_canon(
                        q_new, cache[i]["k"], cache[i]["v"],
                        canon["shared"][i]["sk"], canon["shared"][i]["sv"],
                        k_new, v_new, canon["bias_sh"], bias_win, pos,
                        beam=anc.shape[1], n_heads=n_heads, c=canon["c"],
                        p_eff=(p_cache if p_eff is None else p_eff),
                        interpret=interp, live_items=live_items,
                    ))
                if not _CANON_NO_IDS:
                    # timing-only probe knob: skipping the straggler
                    # recompute isolates the ids kernel's cost (outputs
                    # for straggler rows become garbage)
                    out_s = pallas_attn.ancestry_attention_ids(
                        q_new, cache_k, cache_v, anc_bias,
                        canon["strag_ids"], canon["n_strag"],
                        beam=anc.shape[1], n_heads=n_heads, p_eff=p_eff,
                        interpret=interp,
                    )
                    attn = jnp.where(canon["strag_rows"][:, None], out_s,
                                     attn)
            else:
                attn, cache_k, cache_v = (
                    pallas_attn.ancestry_attention_update(
                        q_new, cache[i]["k"], cache[i]["v"], k_new, v_new,
                        anc_bias, pos, beam=anc.shape[1], n_heads=n_heads,
                        interpret=interp, p_eff=p_eff,
                        live_items=live_items,
                    ))
            new_cache.append({"k": cache_k, "v": cache_v})
            attn = L.linear(layer["self_attn"]["fc_o"], attn)
        else:
            cache_k = jax.lax.dynamic_update_slice_in_dim(
                cache[i]["k"], k_new[:, None, :], pos, axis=1
            )
            cache_v = jax.lax.dynamic_update_slice_in_dim(
                cache[i]["v"], v_new[:, None, :], pos, axis=1
            )
            new_cache.append({"k": cache_k, "v": cache_v})
            if anc_onehot is not None:
                attn = _ancestry_attention(
                    layer["self_attn"], x, cache_k, cache_v, anc_onehot,
                    n_heads, self_key_valid, q=q_new,
                )
            else:
                attn = _cached_attention(
                    layer["self_attn"], x, cache_k, cache_v, n_heads,
                    key_mask, q=q_new,
                )
        x = L.layer_norm(layer["self_attn_ln"], x + attn)

        if "enc_attn" in layer:
            if anc_bias is not None:
                # same batched-tiny-dot fix as self-attention: one rank-3
                # dot per head in a Pallas kernel instead of the einsum's
                # (groups x heads) MXU stubs
                ea = layer["enc_attn"]
                cross_bias = None
                if enc_key_mask is not None:
                    cross_bias = jnp.where(
                        enc_key_mask[:, None, :], MASK_FILL, 0.0
                    ).astype(jnp.float32)
                ek, ev = cross[i]["ek"], cross[i]["ev"]
                g, t_c = ek.shape[0], ek.shape[1]
                r_rows = x.shape[0] // g
                pack = None
                if (_CROSS_PACK > 1 and cross_t_real is not None
                        and g % _CROSS_PACK == 0
                        and t_c % 8 == 0 and (n_heads * r_rows) % 8 == 0):
                    # WORD_PERF lever #5: fuse _CROSS_PACK items into one
                    # block-diagonal dot pair (requires the tile-padded
                    # cross store; pad columns re-masked via t_real)
                    pack = _CROSS_PACK
                attn = L.linear(
                    ea["fc_o"],
                    pallas_attn.grouped_cross_attention(
                        L.linear(ea["fc_q"], x), ek, ev, cross_bias,
                        groups=g, n_heads=n_heads,
                        block_items=_CROSS_BLOCK,
                        interpret=(attn_impl == "pallas_interpret"),
                        live_items=live_items, pack_items=pack,
                        t_real=cross_t_real if pack else None,
                    ),
                )
            else:
                attn = _grouped_attention(
                    layer["enc_attn"], x, cross[i]["ek"], cross[i]["ev"],
                    n_heads, enc_key_mask,
                )
            x = L.layer_norm(layer["enc_attn_ln"], x + attn)

        ff = pff_apply(layer["pf"], x)
        x = L.layer_norm(layer["pf_ln"], x + ff)

    if return_hidden:
        # the caller fuses the classifier into the sampler kernel
        # (ops/pallas_sampler.fused_classifier_topk_gumbel_sample) so the
        # [bs, V] logits never materialize in HBM
        return x, new_cache
    logits = L.linear(params["classifier"], x)
    return logits, new_cache

"""The four caption-generation models.

Functional rebuild of /root/reference/deephumor/models/caption_models.py:

- ``CaptioningLSTM`` (caption_models.py:9-98): ImageEncoder(global) ->
  LSTMDecoder.
- ``CaptioningLSTMWithLabels`` (caption_models.py:101-195):
  ImageLabelEncoder -> LSTMDecoder with the decoder token embedding SHARED
  with the label encoder's table (caption_models.py:125) — the pytree
  stores the table once (under the encoder) and wires it into the decoder
  at apply time, so training keeps them tied by construction.
- ``CaptioningTransformerBase`` (caption_models.py:198-327):
  ImageEncoder(global) -> decoder-only transformer.
- ``CaptioningTransformer`` (caption_models.py:330-461):
  ImageEncoder(spatial) -> cross-attention transformer over the 49 spatial
  embeddings.

Each model is a small dataclass of hyperparameters with pure
``init/forward/generate`` methods; ``generate`` runs the batched
jitted-scan engine (deephumor_tpu/models/sampling.py) over KV caches /
carried LSTM state instead of the reference's per-step Python loops.
``encode`` is exposed separately so serving can cache the per-template
image features once and generate thousands of captions against them
(SURVEY.md §7.7).

Checkpoints: ``save``/``from_pretrained`` use the framework-native npz
format (deephumor_tpu/utils/pytree.py); ``from_torch`` consumes the
reference's ``.pth`` payload via deephumor_tpu/convert/torch_import.py.

Known divergence (documented): the reference LSTM beam search mis-aligns
surviving (h, c) states once any branch has ended — rnn_models.py:135-137
expands the state beam-fold per branch but indexes it with candidate-list
positions, which no longer correspond after ended branches collapse to a
single candidate. This engine gathers survivor states correctly.
"""

import dataclasses
import functools
import math
import os

import jax
import jax.numpy as jnp

from deephumor_tpu.data.vocab import EOS_ID
from deephumor_tpu.models import layers as L
from deephumor_tpu.models import lstm as lstm_mod
from deephumor_tpu.models import transformer as tfm
from deephumor_tpu.models.encoders import (
    image_encoder_apply,
    image_encoder_init,
    image_encoder_trunk,
    image_label_encoder_apply,
    image_label_encoder_init,
)
from deephumor_tpu.models.sampling import beam_search
from deephumor_tpu.ops.pallas_attention import supports_fused_update

_DEBUG_CANON = bool(os.environ.get("DH_DEBUG_CANON"))
# canon window width (import-time, like the other canon knobs: the
# engine's executable cache keys on shapes, not env). Any multiple of 8
# >= 8 is EXACT (see the phase-ladder comment in generate_from_emb).
# Measured at the char config (benchmarks/canon_lag_ab, 2026-08-19):
# lag=16 666.9 capt/s, lag=24 656.5, lag=32 635.1 — the window-byte
# saving narrowly beats the straggler increase at 16.
_CANON_LAG = int(os.environ.get("DH_CANON_LAG", "16"))
# opt-in fused survivor-bookkeeping kernel (measured neutral at both
# serving configs — see _generate_impl; import-time like the other knobs)
_FUSED_SURVIVOR = os.environ.get("DH_FUSED_SURVIVOR") == "1"
if _CANON_LAG < 8 or _CANON_LAG % 8:
    raise ValueError(f"DH_CANON_LAG must be a multiple of 8 >= 8, "
                     f"got {_CANON_LAG}")
from deephumor_tpu.utils.pytree import load_params, save_params

__all__ = [
    "CaptioningLSTM",
    "CaptioningLSTMWithLabels",
    "CaptioningTransformerBase",
    "CaptioningTransformer",
    "MODEL_REGISTRY",
]


def _tile_tree(tree, beam):
    """Repeats every leaf's batch axis 0 ``beam`` times (item-major:
    [b0, b0, ..., b1, b1, ...]), matching flat index ``item * beam + j``."""
    return jax.tree.map(
        lambda x: jnp.repeat(x, beam, axis=0), tree
    )


def _cast_floats(tree, dtype):
    """Casts float leaves of a pytree to ``dtype`` (ids stay integer)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else x,
        tree,
    )


def _decoder_compute_cast(model, dec_params, arrays):
    """Casts decoder params + decoder-input arrays to the model's compute
    dtype at the encoder→decoder seam (mixed-precision training: encoder,
    BN statistics, master params, loss stay f32; the decoder's matmuls run
    in ``compute_dtype``). Casting only the params is NOT enough — XLA
    promotes ``f32 @ bf16`` back to an f32 dot, so the embedding from the
    f32 encoder must be cast too or no matmul actually runs in bf16.
    The casts are differentiable; gradients upcast back to f32."""
    if model.compute_dtype == "float32":
        return dec_params, arrays
    dt = jnp.dtype(model.compute_dtype)
    return _cast_floats(dec_params, dt), tuple(a.astype(dt) for a in arrays)


def _default_attn_impl(num_items=None, d_model=None):
    """Decode self-attention impl: the fused Pallas ancestry kernel on
    accelerator backends, the XLA einsum form on CPU (where Pallas TPU
    kernels can only run interpreted). Tiny batches stay on the einsum —
    the kernel's grid amortization needs several row-blocks to win
    (measured: xla ~30 ms vs pallas ~32 ms single-meme p50, flipping to
    pallas 3.17 ms vs xla 4.19 ms per step at 224 memes)."""
    # the Pallas kernels use TPU-only primitives (pltpu) — any non-TPU
    # accelerator (gpu/rocm) must take the einsum path, not just CPU;
    # unknown platform names (e.g. TPU-tunnel plugins) are treated as TPU
    if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm"):
        return "xla"
    if num_items is not None and num_items < 8:
        return "xla"
    # narrow models cannot use the fused cache-update kernels (their
    # rank-4 HBM DMA slices need d_model on the 128-lane tiling)
    if d_model is not None and not supports_fused_update(d_model):
        return "xla"
    return "pallas"


@functools.lru_cache(maxsize=256)
def _compiled_generate(model, from_images, prefix_len, max_len, beam_size,
                       top_k, greedy, eos_index, sampler="exact",
                       attn="xla", compact=None, canon=None):
    """One compiled end-to-end generation program per (model hyperparams,
    static sampler config). Models are frozen dataclasses, so they hash into
    the cache key; params/inputs/key/temperature stay dynamic — re-calling
    with new weights, images, or temperature hits the same executable."""
    if (compact or canon) and not attn.startswith("pallas"):
        # both features live inside the pallas decode path (dynamic-grid
        # dead-block skipping / shared-prefix kernels); with the einsum
        # impl they would silently no-op while still carrying their state
        raise ValueError(
            f"compact/canon require a pallas attn impl, got attn={attn!r}"
        )

    def fn(params, x, key, caption, temperature):
        if from_images:
            enc = (
                model.encode(params, *x)
                if isinstance(x, tuple)
                else model.encode(params, x)
            )
        else:
            enc = x
        kw = {} if compact is None else {"compact": compact}
        if canon is not None:
            kw["canon"] = canon
        return model._generate_impl(
            params, enc, key, caption, temperature,
            max_len=max_len, beam_size=beam_size, top_k=top_k,
            greedy=greedy, eos_index=eos_index, prefix_len=prefix_len,
            sampler=sampler, attn=attn, **kw,
        )

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# LSTM family
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CaptioningLSTM:
    """LSTM captioner conditioned on the global image embedding."""

    num_tokens: int
    emb_dim: int = 256
    hidden_size: int = 512
    num_layers: int = 2
    enc_dropout: float = 0.3
    dec_dropout: float = 0.1
    # decode-path compute dtype; "bfloat16" is the TPU serving config
    # (sampling math stays f32 in the engine). Parity configs use f32.
    compute_dtype: str = "float32"

    model_type = "captioning_lstm"
    with_labels = False

    def hp(self):
        hp = dataclasses.asdict(self)
        if hp.get("compute_dtype") == "float32":
            hp.pop("compute_dtype")
        return hp

    def init(self, key):
        k_enc, k_dec = jax.random.split(key)
        return {
            "encoder": image_encoder_init(k_enc, self.emb_dim),
            "decoder": lstm_mod.lstm_decoder_init(
                k_dec, self.num_tokens, self.emb_dim, self.hidden_size,
                self.num_layers,
            ),
        }

    # -- training ----------------------------------------------------------
    def trunk(self, params, images):
        """Frozen-ResNet features ``[bs, 7, 7, 2048]`` — deterministic per
        image; cache them and train with ``forward(..., from_trunk=True)``
        (see Trainer.build_trunk_cache)."""
        return image_encoder_trunk(params["encoder"], images)

    def forward(self, params, images, captions, lengths=None, train=False,
                rng=None, from_trunk=False):
        """Teacher-forced logits ``[bs, T+1, num_tokens]``
        (parity: caption_models.py:42-46)."""
        if train:
            r_enc, r_dec = jax.random.split(rng)
            emb, new_enc = image_encoder_apply(
                params["encoder"], images, dropout=self.enc_dropout,
                train=True, rng=r_enc, from_trunk=from_trunk,
            )
            decoder, (emb,) = _decoder_compute_cast(
                self, params["decoder"], (emb,))
            logits = lstm_mod.lstm_decoder_forward(
                decoder, emb, captions,
                dropout=self.dec_dropout, train=True, rng=r_dec,
            )
            return logits, dict(params, encoder=new_enc)
        emb = image_encoder_apply(params["encoder"], images,
                                  from_trunk=from_trunk)
        decoder, (emb,) = _decoder_compute_cast(
            self, params["decoder"], (emb,))
        return lstm_mod.lstm_decoder_forward(decoder, emb, captions)

    # -- inference ---------------------------------------------------------
    def encode(self, params, images):
        """Global image embedding ``[bs, emb_dim]`` (cacheable per
        template)."""
        return image_encoder_apply(params["encoder"], images)

    def _decoder_embedding(self, params):
        return params["decoder"]["embedding"]

    def _prefill(self, params, emb, prefix):
        inputs = emb[:, None, :]
        if prefix is not None:
            tok = L.embed(self._decoder_embedding(params), prefix)
            inputs = jnp.concatenate([inputs, tok], axis=1)
        outs, (h, c) = lstm_mod.lstm_forward(params["decoder"]["lstm"], inputs)
        logits = L.linear(params["decoder"]["classifier"], outs[:, -1])
        # batch-first state for the engine's axis-0 gathers
        state = {"h": jnp.swapaxes(h, 0, 1), "c": jnp.swapaxes(c, 0, 1)}
        return logits, state

    def _make_step(self, params, consts=None, return_hidden=False):
        def step(state, tokens):
            x = L.embed(self._decoder_embedding(params), tokens)
            h = jnp.swapaxes(state["h"], 0, 1)
            c = jnp.swapaxes(state["c"], 0, 1)
            out, (h, c) = lstm_mod.lstm_step(
                params["decoder"]["lstm"], x, h, c
            )
            if not return_hidden:
                # else the classifier fuses into the sampler kernel
                out = L.linear(params["decoder"]["classifier"], out)
            return out, {
                "h": jnp.swapaxes(h, 0, 1),
                "c": jnp.swapaxes(c, 0, 1),
            }

        return step

    def _generate_impl(self, params, emb, key, caption, temperature, *,
                       max_len, beam_size, top_k, greedy, eos_index,
                       prefix_len, sampler="exact", attn="xla",
                       compact=None, canon=None):
        del attn  # recurrent state shuffles directly; no ancestry caches
        del compact, canon  # no phase boundaries (single scan, no caches)
        if self.compute_dtype != "float32":
            dt = jnp.dtype(self.compute_dtype)
            params = _cast_floats(params, dt)
            emb = _cast_floats(emb, dt)
        logits, state = self._prefill(params, emb, caption)
        state = _tile_tree(state, beam_size)
        # classifier->sampler fusion (see the transformer variant): the
        # per-step [rows, V] logits never leave VMEM on the pallas path
        classifier = None
        ret_hidden = False
        if sampler == "pallas" and not greedy:
            cls = params["decoder"]["classifier"]
            classifier = (cls["kernel"], cls["bias"])
            ret_hidden = True
        return beam_search(
            key, self._make_step(params, return_hidden=ret_hidden), state,
            logits,
            beam_size=beam_size, top_k=top_k, temperature=temperature,
            max_len=max_len, prefix=caption, prefix_len=prefix_len,
            greedy=greedy, sampler=sampler, classifier=classifier,
            eos_index=eos_index,
        )

    def generate_from_emb(self, params, emb, key=None, caption=None,
                          max_len=25, temperature=1.0, beam_size=10,
                          top_k=50, eos_index=EOS_ID, greedy=False,
                          approx_top_k=False, sampler=None):
        """Batched generation from (possibly cached) image embeddings."""
        if key is None:
            key = jax.random.PRNGKey(0)
        sampler = sampler or ("approx" if approx_top_k else "exact")
        prefix_len = 0 if caption is None else caption.shape[1]
        fn = _compiled_generate(
            self, False, prefix_len, max_len, beam_size, top_k, greedy,
            eos_index, sampler,
        )
        return fn(params, emb, key, caption, temperature)

    def generate(self, params, images, key=None, caption=None, max_len=25,
                 temperature=1.0, beam_size=10, top_k=50,
                 eos_index=EOS_ID, greedy=False, approx_top_k=False,
                 sampler=None):
        """Generates captions for a batch of images
        (API parity: caption_models.py:48-74, batched)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        sampler = sampler or ("approx" if approx_top_k else "exact")
        prefix_len = 0 if caption is None else caption.shape[1]
        fn = _compiled_generate(
            self, True, prefix_len, max_len, beam_size, top_k, greedy,
            eos_index, sampler,
        )
        return fn(params, images, key, caption, temperature)

    # -- persistence -------------------------------------------------------
    def save(self, params, path):
        save_params(path, params, {"model_type": self.model_type, **self.hp()})

    @classmethod
    def from_pretrained(cls, path):
        params, hp = load_params(path)
        hp = dict(hp)
        hp.pop("model_type", None)
        return cls(**hp), params

    @classmethod
    def from_torch(cls, ckpt_path):
        """Loads a reference ``.pth`` checkpoint
        (caption_models.py:83-98 contract)."""
        from deephumor_tpu.convert.torch_import import load_torch_checkpoint

        params, hp = load_torch_checkpoint(ckpt_path, cls.model_type)
        return cls(**hp), params


@dataclasses.dataclass(frozen=True)
class CaptioningLSTMWithLabels(CaptioningLSTM):
    """LSTM captioner conditioned on image + template label; decoder token
    embedding is the label encoder's table (caption_models.py:125)."""

    model_type = "captioning_lstm_labels"
    with_labels = True

    def init(self, key):
        k_enc, k_dec = jax.random.split(key)
        params = {
            "encoder": image_label_encoder_init(
                k_enc, self.num_tokens, self.emb_dim
            ),
            "decoder": lstm_mod.lstm_decoder_init(
                k_dec, self.num_tokens, self.emb_dim, self.hidden_size,
                self.num_layers,
            ),
        }
        # single source of truth for the shared table
        del params["decoder"]["embedding"]
        return params

    def _decoder_embedding(self, params):
        return params["encoder"]["label_encoder"]["embedding"]

    def trunk(self, params, images):
        return image_encoder_trunk(params["encoder"]["image_encoder"],
                                   images)

    def forward(self, params, images, captions, lengths=None, labels=None,
                train=False, rng=None, from_trunk=False):
        decoder = dict(
            params["decoder"], embedding=self._decoder_embedding(params)
        )
        if train:
            r_enc, r_dec = jax.random.split(rng)
            emb, new_enc = image_label_encoder_apply(
                params["encoder"], images, labels,
                dropout=self.enc_dropout, train=True, rng=r_enc,
                from_trunk=from_trunk,
            )
            decoder, (emb,) = _decoder_compute_cast(self, decoder, (emb,))
            logits = lstm_mod.lstm_decoder_forward(
                decoder, emb, captions,
                dropout=self.dec_dropout, train=True, rng=r_dec,
            )
            return logits, dict(params, encoder=new_enc)
        emb = image_label_encoder_apply(params["encoder"], images, labels,
                                        from_trunk=from_trunk)
        decoder, (emb,) = _decoder_compute_cast(self, decoder, (emb,))
        return lstm_mod.lstm_decoder_forward(decoder, emb, captions)

    def encode(self, params, images, labels=None):
        return image_label_encoder_apply(params["encoder"], images, labels)

    def _prefill(self, params, emb, prefix):
        decoder = dict(
            params["decoder"], embedding=self._decoder_embedding(params)
        )
        inputs = emb[:, None, :]
        if prefix is not None:
            tok = L.embed(decoder["embedding"], prefix)
            inputs = jnp.concatenate([inputs, tok], axis=1)
        outs, (h, c) = lstm_mod.lstm_forward(decoder["lstm"], inputs)
        logits = L.linear(decoder["classifier"], outs[:, -1])
        return logits, {"h": jnp.swapaxes(h, 0, 1), "c": jnp.swapaxes(c, 0, 1)}

    def generate(self, params, images, labels=None, key=None, caption=None,
                 max_len=25, temperature=1.0, beam_size=10, top_k=50,
                 eos_index=EOS_ID, greedy=False, approx_top_k=False,
                 sampler=None):
        """Generates captions for images + label token batches
        (API parity: caption_models.py:144-171, batched)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        sampler = sampler or ("approx" if approx_top_k else "exact")
        prefix_len = 0 if caption is None else caption.shape[1]
        fn = _compiled_generate(
            self, True, prefix_len, max_len, beam_size, top_k, greedy,
            eos_index, sampler,
        )
        return fn(params, (images, labels), key, caption, temperature)


# ---------------------------------------------------------------------------
# Transformer family
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CaptioningTransformerBase:
    """Decoder-only transformer captioner on the global image embedding."""

    num_tokens: int
    hid_dim: int = 512
    n_layers: int = 6
    n_heads: int = 8
    pf_dim: int = 2048
    enc_dropout: float = 0.3
    dec_dropout: float = 0.1
    pad_index: int = 0
    max_len: int = 128
    # decode-path compute dtype; "bfloat16" is the TPU serving config
    compute_dtype: str = "float32"

    model_type = "captioning_transformer_base"
    with_labels = False
    cross_attention = False

    def hp(self):
        hp = dataclasses.asdict(self)
        if hp.get("compute_dtype") == "float32":
            hp.pop("compute_dtype")
        return hp

    def init(self, key):
        k_enc, k_dec = jax.random.split(key)
        init_fn = (
            tfm.transformer_decoder_init
            if self.cross_attention
            else tfm.self_attn_decoder_init
        )
        return {
            "encoder": image_encoder_init(k_enc, self.hid_dim),
            "decoder": init_fn(
                k_dec, self.num_tokens, self.hid_dim, self.n_layers,
                self.pf_dim, self.max_len,
            ),
        }

    # -- training ----------------------------------------------------------
    def trunk(self, params, images):
        """Frozen-ResNet features ``[bs, 7, 7, 2048]`` — deterministic per
        image; cache them and train with ``forward(..., from_trunk=True)``
        (see Trainer.build_trunk_cache)."""
        return image_encoder_trunk(params["encoder"], images)

    def forward(self, params, images, captions, lengths=None, train=False,
                rng=None, from_trunk=False):
        """Teacher-forced logits (parity: caption_models.py:259-278)."""
        if train:
            r_enc, r_dec = jax.random.split(rng)
            emb, new_enc = image_encoder_apply(
                params["encoder"], images, dropout=self.enc_dropout,
                train=True, rng=r_enc, from_trunk=from_trunk,
            )
            decoder, (emb,) = _decoder_compute_cast(
                self, params["decoder"], (emb,))
            logits = tfm.self_attn_decoder_forward(
                decoder, captions, emb, self.n_heads,
                pad_index=self.pad_index, dropout=self.dec_dropout,
                train=True, rng=r_dec,
            )
            return logits, dict(params, encoder=new_enc)
        emb = image_encoder_apply(params["encoder"], images,
                                  from_trunk=from_trunk)
        decoder, (emb,) = _decoder_compute_cast(
            self, params["decoder"], (emb,))
        return tfm.self_attn_decoder_forward(
            decoder, captions, emb, self.n_heads,
            pad_index=self.pad_index,
        )

    # -- inference ---------------------------------------------------------
    def encode(self, params, images):
        return image_encoder_apply(params["encoder"], images)

    def _prefill_and_state(self, params, enc, prefix, max_positions):
        """Feeds start_emb (+ prefix tokens) through decode_step, building
        cache/valid state. ``enc`` is the encode() output."""
        start_emb = enc
        bs = start_emb.shape[0]
        scale = math.sqrt(self.hid_dim)

        cache = tfm.init_cache(
            params["decoder"], bs, max_positions, dtype=start_emb.dtype
        )
        valid = jnp.zeros((bs, max_positions), bool).at[:, 0].set(True)

        logits, cache = tfm.decode_step(
            params["decoder"], start_emb / scale, jnp.int32(0), cache,
            valid, self.n_heads,
        )
        pos = 1
        if prefix is not None:
            for i in range(prefix.shape[1]):
                tok = prefix[:, i]
                valid = valid.at[:, pos].set(tok != self.pad_index)
                emb = L.embed(params["decoder"]["tok_embedding"], tok) / scale
                logits, cache = tfm.decode_step(
                    params["decoder"], emb, jnp.int32(pos), cache, valid,
                    self.n_heads,
                )
                pos += 1

        state = {
            "cache": cache,
            "valid": valid,
            "pos": jnp.full((bs,), pos, jnp.int32),
        }
        return logits, state, None

    def _make_step(self, params, consts=None, attn="xla", p_eff=None,
                   return_hidden=False, canon_c=None):
        scale = math.sqrt(self.hid_dim)

        def step(state, tokens):
            pos = state["pos"][0]
            valid = state["valid"].at[:, pos].set(tokens != self.pad_index)
            beam = state["anc"].shape[1]
            # this step's k/v land in the branch's own physical slot
            anc = state["anc"].at[:, :, pos].set(
                jnp.arange(beam, dtype=jnp.int32)[None, :]
            )
            # cross-attention consts come from the state when the engine
            # compacts items (they must follow the item permutation),
            # from the closure otherwise
            cross = state.get(
                "cross", None if consts is None else consts["cross"])
            enc_key_mask = state.get(
                "enc_key_mask",
                None if consts is None else consts["enc_key_mask"])
            canon = None
            if canon_c is not None:
                # canonical-prefix bundle from the preceding phase
                # boundary (_canonicalize_state); c is STATIC per phase
                canon = {
                    "c": canon_c,
                    "shared": state["shared"],
                    "bias_sh": state["bias_sh"],
                    "strag_ids": state["strag_ids"],
                    "n_strag": state["n_strag"],
                    "strag_rows": state["strag_rows"],
                }
            emb = L.embed(params["decoder"]["tok_embedding"], tokens) / scale
            logits, cache = tfm.decode_step(
                params["decoder"], emb, pos, state["cache"], valid,
                self.n_heads,
                cross=cross, enc_key_mask=enc_key_mask,
                anc=anc, attn_impl=attn, p_eff=p_eff,
                return_hidden=return_hidden,
                live_items=state.get("live"), canon=canon,
                cross_t_real=(None if consts is None
                              else consts.get("cross_t_real")),
            )
            return logits, dict(
                state,
                cache=cache,
                valid=valid,
                pos=state["pos"] + 1,
                anc=anc,
            )

        return step

    @staticmethod
    def _shuffle_state(state, flat_branch, branch):
        """Survivor reorder WITHOUT touching the KV caches: validity/pos
        follow the branch (small), the ancestry table re-roots onto the
        surviving branch's history, cache rows stay in place (see
        transformer._ancestry_attention). Compaction leaves (cross K/V,
        live count, item permutation) are per-item, not per-branch, and
        pass through untouched."""
        return dict(
            state,
            valid=jnp.take(state["valid"], flat_branch, axis=0),
            anc=jnp.take_along_axis(
                state["anc"], branch[:, :, None], axis=1
            ),
        )

    @staticmethod
    def _compact_state(state, seq, val, ended, prefix_positions=None):
        """Early-EOS row compaction (applied at static phase boundaries):
        stable-partitions items so every all-beams-ended item moves to the
        batch tail, then records the shrunken live count. The pallas
        decode kernels size their grids to the live prefix (dynamic
        grid), so dead items stop costing cache DMA and compute. Results
        are identical to the uncompacted run (ended branches only ever
        append pads at score 0; the final outputs are permuted back by
        ``_finalize_compaction``). Reference behavior anchor: the
        all-ended early exit at rnn_models.py:131-132 — this is its
        per-item form.

        ``prefix_positions``: static bound on written cache positions
        (the finished phase's p_eff). Cache positions beyond it are still
        their initial zeros — permutation-invariant — so the gather reads
        only the prefix and pads the tail with fresh zeros.
        """
        num_items, beam = ended.shape
        dead = jnp.all(ended, axis=1)
        order = jnp.argsort(dead, stable=True).astype(jnp.int32)
        live = jnp.sum(~dead).astype(jnp.int32)
        flat = (
            order[:, None] * beam
            + jnp.arange(beam, dtype=jnp.int32)[None, :]
        ).reshape(-1)

        def take_items(x):
            return jnp.take(x, order, axis=0)

        def take_rows(x):
            return jnp.take(x, flat, axis=0)

        def take_cache(x):
            p = x.shape[1]
            if prefix_positions is None or prefix_positions >= p:
                return take_rows(x)
            pref = jnp.take(x[:, :prefix_positions], flat, axis=0)
            return jnp.pad(
                pref, ((0, 0), (0, p - prefix_positions), (0, 0)))

        new_state = dict(
            state,
            cache=[
                {"k": take_cache(l["k"]), "v": take_cache(l["v"])}
                for l in state["cache"]
            ],
            valid=take_rows(state["valid"]),
            anc=take_items(state["anc"]),
            item_perm=take_items(state["item_perm"]),
            live=live,
        )
        if state.get("cross") is not None:
            new_state["cross"] = [
                None if c is None
                else {"ek": take_items(c["ek"]), "ev": take_items(c["ev"])}
                for c in state["cross"]
            ]
        if state.get("enc_key_mask") is not None:
            new_state["enc_key_mask"] = take_items(state["enc_key_mask"])
        return (new_state, take_items(seq), take_items(val),
                take_items(ended))

    @staticmethod
    def _finalize_compaction(state, out):
        """Undoes the compaction permutation so outputs land in caller
        order."""
        inv = jnp.argsort(state["item_perm"])
        return {k: jnp.take(v, inv, axis=0) for k, v in out.items()}

    @staticmethod
    def _canonicalize_state(state, seq, val, ended, *, c):
        """Phase-boundary setup for the canonical-prefix attention path.

        Beam ancestries coalesce genealogically under survivor sampling
        (measured: only ~16-19% of streamed per-slot cache entries are
        reachable by any live branch at the char config). For every item
        whose LIVE branches all agree on their ancestry below ``c``, this
        gathers the unique ancestor path once into a per-layer ``shared``
        cache ([B, c, D]) so the decode kernel streams ONE row per
        coalesced position instead of ``beam`` slots
        (ops/pallas_attention.ancestry_attention_update_canon).
        Disagreeing items (stragglers) are listed in ``strag_ids`` and
        recomputed full-width by ancestry_attention_ids — no permutation
        of the caches, the id list is the indirection. Coalescence below
        ``c`` persists for the rest of the decode (survivors inherit live
        ancestries; ended branches' outputs are discarded), so one gather
        per boundary is exact for the whole phase.
        """
        anc = state["anc"]
        num_items, beam, _ = anc.shape
        live_b = ~ended                                       # [B, beam]
        first_live = jnp.argmax(live_b, axis=1).astype(jnp.int32)
        path = jnp.take_along_axis(
            anc[:, :, :c], first_live[:, None, None], axis=1)[:, 0]
        agree = jnp.all(
            (anc[:, :, :c] == path[:, None, :]) | ~live_b[:, :, None],
            axis=(1, 2))
        is_strag = jnp.any(live_b, axis=1) & ~agree
        # stragglers first; argsort(stable) keeps item order inside the
        # two groups so repeated boundaries produce stable id lists
        strag_ids = jnp.argsort(~is_strag, stable=True).astype(jnp.int32)
        n_strag = jnp.sum(is_strag).astype(jnp.int32)

        if _DEBUG_CANON:  # boundary diagnostics (import-time knob: it
            # changes the traced program and the compile cache does not
            # key on it — see transformer._CANON_NO_IDS)
            jax.debug.print("canon c={c}: stragglers {n}/{b}",
                            c=c, n=n_strag, b=num_items)
        rowsel = (jnp.arange(num_items, dtype=jnp.int32)[:, None] * beam
                  + path)                                     # [B, c]
        possel = jnp.arange(c, dtype=jnp.int32)[None, :]

        def gather(x):
            return x[rowsel, possel]                          # [B, c, D]

        shared = [{"sk": gather(l["k"]), "sv": gather(l["v"])}
                  for l in state["cache"]]
        validr = state["valid"].reshape(num_items, beam, -1)
        sval = jnp.take_along_axis(
            validr[:, :, :c], first_live[:, None, None], axis=1)[:, 0]
        bias_sh = jnp.where(sval, 0.0, -1e8)[:, None, :].astype(
            jnp.float32)
        new_state = dict(
            state, shared=shared, bias_sh=bias_sh, strag_ids=strag_ids,
            n_strag=n_strag, strag_rows=jnp.repeat(is_strag, beam),
        )
        return new_state, seq, val, ended

    @staticmethod
    def _chain_boundaries(fns):
        def run(state, seq, val, ended):
            for fn in fns:
                state, seq, val, ended = fn(state, seq, val, ended)
            return state, seq, val, ended

        return run

    def _generate_impl(self, params, enc, key, caption, temperature, *,
                       max_len, beam_size, top_k, greedy, eos_index,
                       prefix_len, sampler="exact", attn="xla",
                       compact=None, canon=None):
        if self.compute_dtype != "float32":
            dt = jnp.dtype(self.compute_dtype)
            params = _cast_floats(params, dt)
            enc = _cast_floats(enc, dt)
        max_positions = max_len + 1
        logits, state, consts = self._prefill_and_state(
            params, enc, caption, max_positions
        )
        # decoder state is tiled per beam; consts (cross-attention K/V,
        # encoder mask) stay per-item and are shared via grouped attention
        state = _tile_tree(state, beam_size)
        # ancestry init: after tiling, every beam slot holds its own copy
        # of the prefill cache, so every position's ancestor is itself
        num_items = logits.shape[0]
        state["anc"] = jnp.broadcast_to(
            jnp.arange(beam_size, dtype=jnp.int32)[None, :, None],
            (num_items, beam_size, max_positions),
        )
        # early-EOS row compaction: at sparse phase boundaries all-ended
        # items are partitioned to the batch tail and the pallas kernels
        # size their (dynamic) grids to the live prefix. MEASURED (round
        # 2, EOS-shaped logits): at the WORD config (32 steps) items
        # almost never fully die under stochastic survivor sampling
        # (0.9% — ended branches' frozen scores can't hold all beam
        # slots within the short runway), so compaction would only cost
        # its boundary permutation. At the CHAR config (128 steps) the
        # frozen-score gap compounds long enough that most items DO die
        # (85% at mean-len ~8; still high at realistic lengths), and the
        # skip pays. Default: auto-on for long generations.
        use_compact = (
            attn.startswith("pallas") and num_items >= 32
            and (max_len - prefix_len) >= 64
            if compact is None else compact
        )
        live_fn = compactors = finalize_fn = None
        if use_compact:
            state["live"] = jnp.int32(num_items)
            state["item_perm"] = jnp.arange(num_items, dtype=jnp.int32)
            if consts is not None:
                # consts must follow the item permutation -> carry them in
                # the loop state (loop-invariant between compactions)
                state["cross"] = consts["cross"]
                state["enc_key_mask"] = consts["enc_key_mask"]
                consts = None
            live_fn = lambda st: st.get("live")  # noqa: E731
            finalize_fn = self._finalize_compaction
        # staged cache-read budget: the pallas attention kernel reads only
        # the first p_eff cache positions, so the token loop runs as a few
        # static phases whose budget grows with the decode position —
        # early steps never stream the cache tail (exact same results;
        # sampling.beam_search ``phases``). Step s needs
        # p_eff >= prefix_len + s + 1.
        # classifier->sampler fusion: on the stochastic pallas path the
        # steps return pre-classifier hidden states and the classifier
        # matmul runs inside the sampler kernel (logits never touch HBM)
        classifier = None
        ret_hidden = False
        if sampler == "pallas" and not greedy:
            cls = params["decoder"]["classifier"]
            classifier = (cls["kernel"], cls["bias"])
            ret_hidden = True
        phases = None
        # canonical-prefix attention (shared-ancestor cache below c; see
        # _canonicalize_state): kicks in per-phase once the read budget
        # is big enough for a c >= 24 prefix, so short word-config runs
        # never pay for it. Controlled ONLY by the canon kwarg
        # (independent of compact= — the two share boundary machinery
        # but gate separately); attn must be a pallas impl.
        use_canon = (
            attn.startswith("pallas")
            if canon is None else canon and attn.startswith("pallas"))
        if attn.startswith("pallas"):
            p_cache = -(-max_positions // 8) * 8
            steps = max_len - prefix_len
            # phase ladder starts at 16: a pe=8 phase measured sub-noise
            # (covers ~7 early steps) and costs 6 extra kernel compiles
            pes = []
            for pe in range(16, p_cache, 8):
                last_step = pe - prefix_len - 1
                if 1 <= last_step < steps - 1:
                    pes.append(pe)
            pes.append(p_cache)
            # phase k runs canon iff the preceding boundary could set up
            # a canonical prefix of c = pe - lag >= 24. The default
            # lag=24 keeps the coalescence check >= 16 positions behind
            # the write head, where ~77-100% of items fully coalesce
            # (measured); DH_CANON_LAG tunes the tradeoff — a smaller
            # lag shrinks the per-step window reads (w = lag, the
            # dominant position-independent cache traffic) but raises
            # the straggler fraction (full-width recompute per straggler
            # item). EXACT for any multiple of 8 >= 8: stragglers are
            # always recomputed full-width, lag only moves the split.
            lag = _CANON_LAG
            canon_cs = [None]
            for pe in pes[1:]:
                c = pe - lag
                # engagement gate pe >= 48 is INDEPENDENT of the lag:
                # with lag=16 the word config's short final phase
                # (pe=40, c=24, 9 steps at batch 896) slipped in and
                # cost the headline 2854 -> 2125 capt/s — boundary
                # gathers + stragglers dwarf the byte saving on a short
                # runway. At lag=24 the gate is equivalent to c >= 24
                # (the original criterion).
                canon_cs.append(
                    c if (use_canon and c >= 24 and pe >= 48) else None)
            bounds = []
            for k, pe in enumerate(pes[:-1]):
                bounds.append((pe - prefix_len - 1, self._make_step(
                    params, consts, attn, p_eff=pe,
                    return_hidden=ret_hidden, canon_c=canon_cs[k])))
            # the final phase needs to read only through the last write
            # position (prefix_len + steps), not the lane-padded p_cache:
            # at the word config p_cache rounds 34 up to 40 while the
            # deepest read is 32 — an 8-position (20%) cut of the final
            # phase's dominant cache stream, measured at the byte wall
            # (docs/WORD_PERF.md lever 2)
            p_last = min(p_cache, -(-(prefix_len + steps) // 8) * 8)
            bounds.append(
                (steps - 1, self._make_step(
                    params, consts, attn, p_eff=p_last,
                    return_hidden=ret_hidden,
                    canon_c=canon_cs[-1])))
            phases = bounds
            if use_compact or any(c is not None for c in canon_cs):
                # SPARSE compaction points: each boundary permutation
                # costs a prefix-limited cache gather (~10 ms at char
                # scale — measured 37% of the whole run when applied at
                # every boundary), so compact only at pe = 24, 48, 96,
                # ... (first point past the early-death window, then
                # doubling). Dead fractions accumulate early, so the
                # sparse schedule captures nearly all the skip value.
                # Canonicalization runs at EVERY boundary feeding a
                # canon phase (its gather is 1/beam of a compaction
                # pass) and composes after compaction so its straggler
                # id list indexes the permuted order.
                compactors = []
                last_c = 0
                for k, pe in enumerate(pes[:-1]):
                    fns = []
                    if use_compact and pe >= 24 and pe >= 2 * last_c:
                        fns.append(functools.partial(
                            self._compact_state, prefix_positions=pe))
                        last_c = pe
                    if canon_cs[k + 1] is not None:
                        fns.append(functools.partial(
                            self._canonicalize_state, c=canon_cs[k + 1]))
                    compactors.append(
                        self._chain_boundaries(fns) if fns else None)
        survivor_update_fn = None
        if attn.startswith("pallas") and _FUSED_SURVIVOR:
            # fused survivor bookkeeping: one kernel instead of ~10 XLA
            # ops + the shuffle gathers (ops/pallas_engine). MEASURED
            # NEUTRAL on hardware (2026-08-19) and therefore opt-in
            # (DH_FUSED_SURVIVOR=1): char 662.0 vs 661.2 capt/s, word
            # 2854.6 vs 2860.1 — the engine's bookkeeping ops simply
            # are not the bottleneck, and the kernel's own DMA + beam²
            # unrolled selects cost what the XLA ops did. (An earlier
            # -25% word reading was a conflation with the canon
            # engagement-gate regression, since fixed.) Kept: exact,
            # hardware-validated (hw_window step 6), and the one-launch
            # form is the base for any future on-core survivor DRAW
            # fusion.
            from deephumor_tpu.ops.pallas_engine import (
                fused_survivor_update,
            )

            interp_upd = attn == "pallas_interpret"
            pad_idx = self.pad_index

            def survivor_update_fn(dec_state, raw_idx, raw_val, surv,
                                   ended, val, seq, pos):
                n_it, bm = surv.shape
                valid3 = dec_state["valid"].reshape(n_it, bm, -1)
                chosen, val2, ended2, seq2, anc2, valid2 = (
                    fused_survivor_update(
                        raw_idx, raw_val, surv, ended, val, seq,
                        dec_state["anc"], valid3, pos, beam=bm,
                        eos_index=eos_index, pad_index=pad_idx,
                        interpret=interp_upd,
                        live_items=dec_state.get("live")))
                st = dict(dec_state, anc=anc2,
                          valid=valid2.reshape(n_it * bm, -1))
                return st, seq2, val2, ended2, chosen

        return beam_search(
            key,
            self._make_step(params, consts, attn,
                            return_hidden=ret_hidden),
            state, logits,
            beam_size=beam_size, top_k=top_k, temperature=temperature,
            max_len=max_len, prefix=caption, prefix_len=prefix_len,
            greedy=greedy, sampler=sampler,
            shuffle_fn=self._shuffle_state,
            survivor_update_fn=survivor_update_fn, phases=phases,
            classifier=classifier,
            live_fn=live_fn, compactors=compactors,
            finalize_fn=finalize_fn,
            eos_index=eos_index, pad_index=self.pad_index,
        )

    def generate_from_emb(self, params, enc, key=None, caption=None,
                          max_len=25, temperature=1.0, beam_size=10,
                          top_k=50, eos_index=EOS_ID, greedy=False,
                          approx_top_k=False, sampler=None, attn=None,
                          compact=None, canon=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        sampler = sampler or ("approx" if approx_top_k else "exact")
        n = (enc[0] if isinstance(enc, tuple) else enc).shape[0]
        attn = attn or _default_attn_impl(n, self.hid_dim)
        # the positional table bounds total positions (start emb + tokens);
        # the reference would index past its table here (a latent upstream
        # IndexError at max_len=128 with char models) — we clamp instead
        max_len = min(max_len, self.max_len - 1)
        prefix_len = 0 if caption is None else caption.shape[1]
        fn = _compiled_generate(
            self, False, prefix_len, max_len, beam_size, top_k, greedy,
            eos_index, sampler, attn, compact, canon,
        )
        return fn(params, enc, key, caption, temperature)

    def generate(self, params, images, key=None, caption=None, max_len=25,
                 temperature=1.0, beam_size=10, top_k=50,
                 eos_index=EOS_ID, greedy=False, approx_top_k=False,
                 sampler=None, attn=None, compact=None, canon=None):
        """Batched caption generation
        (API parity: caption_models.py:280-306)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        sampler = sampler or ("approx" if approx_top_k else "exact")
        attn = attn or _default_attn_impl(images.shape[0], self.hid_dim)
        max_len = min(max_len, self.max_len - 1)
        prefix_len = 0 if caption is None else caption.shape[1]
        fn = _compiled_generate(
            self, True, prefix_len, max_len, beam_size, top_k, greedy,
            eos_index, sampler, attn, compact, canon,
        )
        return fn(params, images, key, caption, temperature)

    # -- persistence -------------------------------------------------------
    def save(self, params, path):
        save_params(path, params, {"model_type": self.model_type, **self.hp()})

    @classmethod
    def from_pretrained(cls, path):
        params, hp = load_params(path)
        hp = dict(hp)
        hp.pop("model_type", None)
        return cls(**hp), params

    @classmethod
    def from_torch(cls, ckpt_path):
        from deephumor_tpu.convert.torch_import import load_torch_checkpoint

        params, hp = load_torch_checkpoint(ckpt_path, cls.model_type)
        return cls(**hp), params


@dataclasses.dataclass(frozen=True)
class CaptioningTransformer(CaptioningTransformerBase):
    """Cross-attention transformer captioner over spatial image features.

    Training-from-scratch note: the spatial feature path has NO
    BatchNorm (reference quirk, encoders.py:67 — only the global path
    is normalized), so the decoder's cross-attention sees the trunk's
    raw activation scale through one linear. With a randomly initialized
    trunk those activations run ~20x hotter than a calibrated pretrained
    trunk's, the cross-attention values swamp the token/positional
    signal, and optimization stalls in a bag-of-words minimum (measured:
    the same-layout decoder memorizes a toy set in ~80 steps on
    unit-scale features and never converges at ~20x). Load a pretrained
    trunk (``from_torch``) before training this variant, or use
    :class:`CaptioningTransformerBase`, whose global-only conditioning
    is BN-normalized.
    """

    model_type = "captioning_transformer"
    cross_attention = True

    def forward(self, params, images, captions, lengths=None, train=False,
                rng=None, from_trunk=False, rectangular=False):
        """Teacher-forced logits (parity: caption_models.py:393-406)."""
        if train:
            r_enc, r_dec = jax.random.split(rng)
            (emb, spatial), new_enc = image_encoder_apply(
                params["encoder"], images, spatial_features=True,
                dropout=self.enc_dropout, train=True, rng=r_enc,
                from_trunk=from_trunk,
            )
            decoder, (emb, spatial) = _decoder_compute_cast(
                self, params["decoder"], (emb, spatial))
            logits = tfm.transformer_decoder_forward(
                decoder, captions, spatial, emb, self.n_heads,
                pad_index=self.pad_index, dropout=self.dec_dropout,
                train=True, rng=r_dec, rectangular=rectangular,
            )
            return logits, dict(params, encoder=new_enc)
        emb, spatial = image_encoder_apply(
            params["encoder"], images, spatial_features=True,
            from_trunk=from_trunk,
        )
        decoder, (emb, spatial) = _decoder_compute_cast(
            self, params["decoder"], (emb, spatial))
        return tfm.transformer_decoder_forward(
            decoder, captions, spatial, emb, self.n_heads,
            pad_index=self.pad_index, rectangular=rectangular,
        )

    def encode(self, params, images):
        """Returns (global emb, spatial emb) — both cacheable."""
        return image_encoder_apply(
            params["encoder"], images, spatial_features=True
        )

    def _prefill_and_state(self, params, enc, prefix, max_positions):
        start_emb, spatial = enc
        bs = start_emb.shape[0]
        scale = math.sqrt(self.hid_dim)

        cache = tfm.init_cache(
            params["decoder"], bs, max_positions, dtype=start_emb.dtype
        )
        valid = jnp.zeros((bs, max_positions), bool).at[:, 0].set(True)
        # packed cross-attention (DH_CROSS_PACK, WORD_PERF lever #5)
        # needs the store's T tile-padded; decode_step widens the key
        # mask to match and re-masks pad columns in-kernel via t_real
        cross = tfm.precompute_cross_attention(
            params["decoder"], spatial, pad_to_tile=tfm._CROSS_PACK > 1)
        # the reference masks all-zero encoder rows (transformers.py:480)
        enc_key_mask = ~jnp.all(spatial != 0.0, axis=-1)

        logits, cache = tfm.decode_step(
            params["decoder"], start_emb / scale, jnp.int32(0), cache,
            valid, self.n_heads, cross=cross, enc_key_mask=enc_key_mask,
        )
        pos = 1
        if prefix is not None:
            for i in range(prefix.shape[1]):
                tok = prefix[:, i]
                valid = valid.at[:, pos].set(tok != self.pad_index)
                emb = L.embed(params["decoder"]["tok_embedding"], tok) / scale
                logits, cache = tfm.decode_step(
                    params["decoder"], emb, jnp.int32(pos), cache, valid,
                    self.n_heads, cross=cross, enc_key_mask=enc_key_mask,
                )
                pos += 1

        state = {
            "cache": cache,
            "valid": valid,
            "pos": jnp.full((bs,), pos, jnp.int32),
        }
        return logits, state, {"cross": cross, "enc_key_mask": enc_key_mask,
                               "cross_t_real": int(spatial.shape[1])}


MODEL_REGISTRY = {
    cls.model_type: cls
    for cls in (
        CaptioningLSTM,
        CaptioningLSTMWithLabels,
        CaptioningTransformerBase,
        CaptioningTransformer,
    )
}

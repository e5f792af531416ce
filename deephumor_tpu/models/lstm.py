"""Multi-layer LSTM + token classifier decoder.

Functional rebuild of the reference LSTM decoder
(/root/reference/deephumor/models/rnn_models.py:8-46): embedding (optionally
shared with a label encoder), multi-layer LSTM, linear classifier. The
training forward prepends the image embedding as the step-0 input
(rnn_models.py:33).

TPU-first redesign: the time dimension runs under ``lax.scan`` layer by
layer (each layer consumes the full sequence of the previous one — identical
math to torch's stacked LSTM, but each step is one fused [bs, 4H] matmul
pair on the MXU). The reference's ``pack_padded_sequence`` is dropped: a
unidirectional LSTM's outputs at positions < length are identical with or
without packing, and padded positions are masked in the loss, so a plain
padded scan is numerically equivalent on every used output.

Gate order follows torch (i, f, g, o) so checkpoint rows import without
permutation; kernels are transposed to ``[in, 4H]``.
"""

import jax
import jax.numpy as jnp

from deephumor_tpu.models import layers as L

__all__ = [
    "lstm_init",
    "lstm_forward",
    "lstm_step",
    "lstm_decoder_init",
    "lstm_decoder_forward",
]


def lstm_init(key, input_dim, hidden_size, num_layers, dtype=jnp.float32):
    """Torch-style uniform(-1/sqrt(H), 1/sqrt(H)) init for all weights."""
    bound = 1.0 / (hidden_size ** 0.5)
    params = []
    for layer in range(num_layers):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        in_dim = input_dim if layer == 0 else hidden_size
        params.append(
            {
                "wi": jax.random.uniform(
                    k1, (in_dim, 4 * hidden_size), dtype, -bound, bound
                ),
                "wh": jax.random.uniform(
                    k2, (hidden_size, 4 * hidden_size), dtype, -bound, bound
                ),
                "bi": jax.random.uniform(
                    k3, (4 * hidden_size,), dtype, -bound, bound
                ),
                "bh": jax.random.uniform(
                    k4, (4 * hidden_size,), dtype, -bound, bound
                ),
            }
        )
    return params


def _cell(layer_params, x_t, h, c):
    """One LSTM cell step. Gate order (i, f, g, o) matches torch."""
    gates = (
        x_t @ layer_params["wi"]
        + h @ layer_params["wh"]
        + layer_params["bi"]
        + layer_params["bh"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_forward(params, x, h0=None, c0=None, dropout=0.0, train=False, rng=None):
    """Full-sequence forward.

    Args:
        params: list of per-layer dicts from :func:`lstm_init`.
        x: inputs ``[bs, T, in_dim]``.
        h0, c0: optional initial state ``[num_layers, bs, H]``.
        dropout: inter-layer dropout rate (torch semantics: applied to every
            layer's output except the last; only when ``train``).

    Returns:
        (outputs ``[bs, T, H]``, (h ``[L, bs, H]``, c ``[L, bs, H]``))
    """
    bs = x.shape[0]
    num_layers = len(params)
    hidden = params[0]["wh"].shape[0]
    if (h0 is None) != (c0 is None):
        raise ValueError("pass both h0 and c0 or neither")
    if h0 is None:
        h0 = jnp.zeros((num_layers, bs, hidden), x.dtype)
        c0 = jnp.zeros((num_layers, bs, hidden), x.dtype)

    hs, cs = [], []
    seq = x
    for layer_idx, layer_params in enumerate(params):
        def step(carry, x_t, layer_params=layer_params):
            h, c = carry
            h, c = _cell(layer_params, x_t, h, c)
            return (h, c), h

        (h_f, c_f), outs = jax.lax.scan(
            step,
            (h0[layer_idx], c0[layer_idx]),
            jnp.swapaxes(seq, 0, 1),
        )
        seq = jnp.swapaxes(outs, 0, 1)
        hs.append(h_f)
        cs.append(c_f)
        if train and dropout > 0.0 and layer_idx < num_layers - 1:
            rng, sub = jax.random.split(rng)
            seq = L.dropout(sub, seq, dropout, train)

    return seq, (jnp.stack(hs), jnp.stack(cs))


def lstm_step(params, x_t, h, c):
    """Single decode step through all layers.

    Args:
        x_t: ``[bs, in_dim]``; h, c: ``[L, bs, H]``.

    Returns:
        (top-layer output ``[bs, H]``, (h, c) updated).
    """
    new_h, new_c = [], []
    inp = x_t
    for layer_idx, layer_params in enumerate(params):
        h_l, c_l = _cell(layer_params, inp, h[layer_idx], c[layer_idx])
        new_h.append(h_l)
        new_c.append(c_l)
        inp = h_l
    return inp, (jnp.stack(new_h), jnp.stack(new_c))


def lstm_decoder_init(
    key,
    num_tokens,
    emb_dim=256,
    hidden_size=512,
    num_layers=3,
    shared_embedding=None,
    dtype=jnp.float32,
):
    """Decoder pytree. ``shared_embedding`` injects an external embedding
    table (the reference shares the label-encoder embedding,
    caption_models.py:125); pass the *params dict* to alias it."""
    ke, kl, kc = jax.random.split(key, 3)
    embedding = (
        shared_embedding
        if shared_embedding is not None
        else L.embedding_init(ke, num_tokens, emb_dim, dtype)
    )
    return {
        "embedding": embedding,
        "lstm": lstm_init(kl, emb_dim, hidden_size, num_layers, dtype),
        "classifier": L.linear_init(kc, hidden_size, num_tokens, dtype),
    }


def lstm_decoder_forward(
    params, image_emb, captions, dropout=0.0, train=False, rng=None
):
    """Teacher-forced forward: image embedding is the step-0 input, caption
    token embeddings follow (parity: rnn_models.py:28-46).

    Args:
        image_emb: ``[bs, emb_dim]``.
        captions: token ids ``[bs, T]``.

    Returns:
        logits ``[bs, T+1, num_tokens]``.
    """
    tok_emb = L.embed(params["embedding"], captions)
    x = jnp.concatenate([image_emb[:, None, :], tok_emb], axis=1)
    outputs, _ = lstm_forward(
        params["lstm"], x, dropout=dropout, train=train, rng=rng
    )
    return L.linear(params["classifier"], outputs)

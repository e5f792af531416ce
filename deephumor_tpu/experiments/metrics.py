"""Evaluation metrics.

Parity: /root/reference/deephumor/experiments/metrics.py:4-9 — per-sequence
perplexity = exp(-sum_t log p(target_t) / length), padded positions zeroed,
averaged over the batch.
"""

import jax
import jax.numpy as jnp

__all__ = ["perplexity", "masked_cross_entropy", "masked_ce_and_perplexity"]


def perplexity(logits, targets, lengths, pad_index=0, row_weights=None):
    """Mean per-sequence perplexity.

    Args:
        logits: ``[bs, T, V]``.
        targets: ``[bs, T]`` token ids.
        lengths: ``[bs]`` true lengths (non-pad counts).
        row_weights: optional ``[bs]`` 0/1 — rows weighted into the mean
            (duplicated tail-padding rows pass 0 so they don't bias it).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    tgt_logp = tgt_logp / jnp.maximum(lengths, 1)[:, None]
    tgt_logp = jnp.where(targets == pad_index, 0.0, tgt_logp)
    pp = jnp.exp(-jnp.sum(tgt_logp, axis=-1))
    if row_weights is None:
        return jnp.mean(pp)
    w = row_weights.astype(pp.dtype)
    return jnp.sum(pp * w) / jnp.maximum(jnp.sum(w), 1)


def masked_cross_entropy(logits, targets, pad_index=0):
    """Mean CE over non-pad positions (the reference's
    ``criterion(pred[mask], captions[mask])``, trainer.py:77-78)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = targets != pad_index
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def masked_ce_and_perplexity(logits, targets, lengths, pad_index=0,
                             row_weights=None):
    """One-pass fusion of :func:`masked_cross_entropy` +
    :func:`perplexity` for the train/eval step.

    Same math (``log_softmax(x)[t] == x[t] - logsumexp(x)``), but the
    ``[bs, T, V]`` f32 log-prob tensor is never materialized: the vocab
    axis collapses to ``logsumexp`` (the f32 upcast fuses into the
    reduction) plus a target-logit gather, everything after is ``[bs,
    T]``. At the word train config (V=29184) the two-``log_softmax``
    formulation's f32 logp tensors dominate the loss phase's HBM traffic
    (benchmarks/train_profile.py); the backward here re-reads the bf16
    logits once and writes one bf16 cotangent.

    Accepts bf16 or f32 logits; reductions and the returned values are
    f32 either way.
    """
    lse = jax.scipy.special.logsumexp(
        logits.astype(jnp.float32), axis=-1)
    tgt = jnp.take_along_axis(
        logits, targets[..., None], axis=-1)[..., 0].astype(jnp.float32)
    tgt_logp = tgt - lse  # [bs, T]
    mask = targets != pad_index

    loss = -jnp.sum(tgt_logp * mask) / jnp.maximum(jnp.sum(mask), 1)

    per_tok = jnp.where(mask, tgt_logp, 0.0) / jnp.maximum(
        lengths, 1)[:, None]
    pp = jnp.exp(-jnp.sum(per_tok, axis=-1))
    if row_weights is None:
        pp = jnp.mean(pp)
    else:
        w = row_weights.astype(pp.dtype)
        pp = jnp.sum(pp * w) / jnp.maximum(jnp.sum(w), 1)
    return loss, pp

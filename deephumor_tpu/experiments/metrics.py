"""Evaluation metrics.

Parity: /root/reference/deephumor/experiments/metrics.py:4-9 — per-sequence
perplexity = exp(-sum_t log p(target_t) / length), padded positions zeroed,
averaged over the batch.
"""

import jax
import jax.numpy as jnp

__all__ = ["perplexity", "masked_cross_entropy"]


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

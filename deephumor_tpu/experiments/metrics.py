"""Evaluation metrics.

Parity: /root/reference/deephumor/experiments/metrics.py:4-9 — per-sequence
perplexity = exp(-sum_t log p(target_t) / length), padded positions zeroed,
averaged over the batch.
"""

import jax
import jax.numpy as jnp

__all__ = ["perplexity", "masked_cross_entropy"]


def perplexity(logits, targets, lengths, pad_index=0):
    """Mean per-sequence perplexity.

    Args:
        logits: ``[bs, T, V]``.
        targets: ``[bs, T]`` token ids.
        lengths: ``[bs]`` true lengths (non-pad counts).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    tgt_logp = tgt_logp / lengths[:, None]
    tgt_logp = jnp.where(targets == pad_index, 0.0, tgt_logp)
    return jnp.mean(jnp.exp(-jnp.sum(tgt_logp, axis=-1)))


def masked_cross_entropy(logits, targets, pad_index=0):
    """Mean CE over non-pad positions (the reference's
    ``criterion(pred[mask], captions[mask])``, trainer.py:77-78)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = targets != pad_index
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

"""Functional NN primitives over explicit parameter pytrees.

Every layer is an ``init(key, ...) -> params`` / ``apply(params, x, ...)``
pair; params are plain nested dicts of jnp arrays, so the whole model is a
pytree that jits, shards, and checkpoint-converts without framework
machinery. Kernel layout is JAX-style ``[in, out]`` (torch checkpoints are
transposed at conversion time, see deephumor_tpu/convert/torch_import.py).
"""

import math

import jax
import jax.numpy as jnp

__all__ = [
    "linear_init",
    "linear",
    "embedding_init",
    "embed",
    "layer_norm_init",
    "layer_norm",
    "batch_norm_init",
    "batch_norm",
    "dropout",
]


def linear_init(key, in_dim, out_dim, dtype=jnp.float32):
    """Torch-style Kaiming-uniform init (matches nn.Linear defaults)."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "kernel": jax.random.uniform(
            wkey, (in_dim, out_dim), dtype, -bound, bound
        ),
        "bias": jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound),
    }


def linear(params, x):
    return x @ params["kernel"] + params["bias"]


def embedding_init(key, num_embeddings, dim, dtype=jnp.float32):
    """Torch-style N(0, 1) init (matches nn.Embedding defaults)."""
    return {"table": jax.random.normal(key, (num_embeddings, dim), dtype)}


def embed(params, ids):
    return jnp.take(params["table"], ids, axis=0)


def layer_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    return normed * params["scale"] + params["bias"]


def batch_norm_init(dim, dtype=jnp.float32):
    return {
        "scale": jnp.ones((dim,), dtype),
        "bias": jnp.zeros((dim,), dtype),
        "mean": jnp.zeros((dim,), dtype),
        "var": jnp.ones((dim,), dtype),
    }


def batch_norm(params, x, train=False, momentum=0.1, eps=1e-5, axis=(0,)):
    """BatchNorm matching torch semantics.

    In train mode normalizes by batch statistics and returns
    ``(y, new_params)`` with running stats updated by ``momentum`` (torch
    uses the *unbiased* variance for the running update but the biased one
    for normalization). In eval mode normalizes by running stats and returns
    ``y`` only.
    """
    if train:
        mean = jnp.mean(x, axis=axis)
        var = jnp.var(x, axis=axis)
        n = x.size // x.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_params = dict(
            params,
            mean=(1 - momentum) * params["mean"] + momentum * mean,
            var=(1 - momentum) * params["var"] + momentum * unbiased,
        )
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        y = y * params["scale"] + params["bias"]
        return y, new_params
    y = (x - params["mean"]) * jax.lax.rsqrt(params["var"] + eps)
    return y * params["scale"] + params["bias"]


def dropout(key, x, rate, train):
    """Inverted dropout; identity when not training or rate == 0."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)

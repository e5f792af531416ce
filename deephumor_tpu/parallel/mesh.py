"""Device mesh construction and batch/param placement.

The reference has no distributed story at all (SURVEY.md §2.6 — single
process, manual ``.to(device)``, trainer.py:66). This layer is the
TPU-native replacement: one ``jax.sharding.Mesh`` over the chips, batch
data sharded over the ``data`` axis, parameters replicated (or
tensor-sharded over ``model`` — deephumor_tpu/parallel/sharding.py), and
XLA inserting the collectives (grad psum, all-gathers) over ICI.

Works identically on real chips and on a virtual CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``), which is the
test/dry-run backend.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
    "replicated_sharding",
    "dp_generate",
]


def make_mesh(devices=None, data=None, model=1, axis_names=("data", "model")):
    """Builds a ``data x model`` mesh.

    Args:
        devices: device list (default: all).
        data: size of the data axis (default: n_devices // model).
        model: size of the tensor-parallel axis (default 1 = pure DP).
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh, ndim=1):
    """NamedSharding splitting axis 0 over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh):
    """Places every array in ``batch`` with axis 0 split over ``data``."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, data_sharding(mesh, np.ndim(x))
        ),
        batch,
    )


def replicate(tree, mesh):
    """Replicates a pytree (params, opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


import functools as _functools


@_functools.lru_cache(maxsize=64)
def _dp_generate_fn(model, mesh, enc_is_tuple, n_enc, sharded_names,
                    static_items):
    """Builds (once per distinct config) the jitted shard_map decode.

    A fresh closure per call would RE-TRACE the whole beam-search loop on
    every serving request — models are frozen dataclasses and meshes hash,
    so the transformed callable is cached on (model, mesh, kwarg config)
    and jit's executable cache then keys on shapes."""
    from jax.sharding import PartitionSpec

    static_kw = dict(static_items)
    enc_specs = (
        tuple(PartitionSpec("data") for _ in range(n_enc))
        if enc_is_tuple else PartitionSpec("data")
    )

    def per_shard(params, enc, key, kw):
        idx = jax.lax.axis_index("data")
        local_key = jax.random.fold_in(key, idx)
        return model.generate_from_emb(
            params, enc, key=local_key, **static_kw, **kw
        )

    return jax.jit(jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(PartitionSpec(), enc_specs, PartitionSpec(),
                  {k: PartitionSpec("data") for k in sharded_names}),
        out_specs=PartitionSpec("data"),
        check_vma=False,
    ))


def dp_generate(model, params, enc, mesh, key=None, **generate_kwargs):
    """Data-parallel batched generation over the ``data`` mesh axis.

    Serving scale-out for the generation engine: the encoded batch is
    split across devices and the FULL jitted beam-search loop — including
    the Pallas attention/sampler kernels, which see per-shard local
    shapes — runs independently per device under ``jax.shard_map``. Pure
    DP: no collectives in the loop, so throughput scales linearly over
    ICI-connected chips (and across hosts with jax.distributed).

    Args:
        model: a caption model (``generate_from_emb`` provider).
        params: replicated parameter pytree.
        enc: ``encode()`` output — array or tuple of arrays, batch axis 0
            divisible by ``mesh.shape['data']``.
        key: PRNG key; each shard folds in its data-axis index, so draws
            are decorrelated across shards (greedy mode is unaffected and
            matches the unsharded run token-for-token).
        **generate_kwargs: forwarded to ``generate_from_emb``.

    Returns:
        the usual generation dict with full-batch (sharded) outputs.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if mesh.shape.get("model", 1) != 1:
        raise ValueError("dp_generate shards over 'data' only; build the "
                         "mesh with model=1")

    enc_is_tuple = isinstance(enc, tuple)

    # batch-shaped kwargs (e.g. ``caption`` prefixes [bs, L] or
    # ``labels``) must shard with the batch — captured in the closure
    # they would enter every shard as full-size replicated constants and
    # shape-mismatch against the per-shard encoder rows
    bs = (enc[0] if enc_is_tuple else enc).shape[0]
    sharded_kw = {
        k: v for k, v in generate_kwargs.items()
        if getattr(v, "ndim", 0) >= 1 and v.shape[0] == bs
    }
    static_items = tuple(sorted(
        (k, v) for k, v in generate_kwargs.items() if k not in sharded_kw))

    fn = _dp_generate_fn(
        model, mesh, enc_is_tuple,
        len(enc) if enc_is_tuple else 1,
        tuple(sorted(sharded_kw)), static_items)
    return fn(params, enc, key, sharded_kw)

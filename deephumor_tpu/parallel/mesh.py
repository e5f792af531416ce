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

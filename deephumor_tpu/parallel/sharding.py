"""Tensor-parallel sharding rules for the transformer decoders.

Megatron-style column/row parallelism over the ``model`` mesh axis:

- attention fc_q/fc_k/fc_v: output dim sharded (heads split across chips),
  fc_o: input dim sharded (row-parallel; XLA inserts the psum),
- feed-forward fc_1: output (pf_dim) sharded, fc_2: input sharded,
- token/pos embeddings and classifier replicated (small vocab),
- everything else (LayerNorms, encoders, LSTM) replicated.

At this model scale (hid 512, pf 2048) TP is optional — pure DP is the
throughput path (SURVEY.md §2.6) — but the rules exist so the same train
step runs on a ``data x model`` mesh with XLA placing the collectives over
ICI.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["tp_param_specs", "make_param_shardings"]

_COL_PARALLEL = ("fc_q", "fc_k", "fc_v", "fc_1")  # shard kernel axis 1
_ROW_PARALLEL = ("fc_o", "fc_2")  # shard kernel axis 0


def tp_param_specs(params, model_axis="model"):
    """PartitionSpec pytree for a caption-model param tree."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [walk(v, path + (str(i),)) for i, v in enumerate(tree)]

        # leaf: decide from the enclosing module name + leaf name
        parent = path[-2] if len(path) >= 2 else ""
        leaf = path[-1]
        if parent in _COL_PARALLEL:
            if leaf == "kernel":
                return P(None, model_axis)
            if leaf == "bias":
                return P(model_axis)
        if parent in _ROW_PARALLEL:
            if leaf == "kernel":
                return P(model_axis, None)
            # row-parallel bias is replicated (added after the psum)
        return P()

    return walk(params, ())


def make_param_shardings(params, mesh, model_axis="model"):
    """NamedSharding pytree from :func:`tp_param_specs`."""
    specs = tp_param_specs(params, model_axis)
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )

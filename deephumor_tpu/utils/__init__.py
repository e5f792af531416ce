"""Utilities: pytree checkpoint IO, profiling, orbax wrappers."""

from deephumor_tpu.utils.pytree import (
    flatten_tree,
    load_params,
    save_params,
    unflatten_tree,
)

__all__ = [
    "flatten_tree",
    "unflatten_tree",
    "save_params",
    "load_params",
]

"""Pytree flatten/save/load helpers.

Model params are nested dicts/lists of arrays. Checkpoints are stored as a
``.npz`` of '/'-joined flattened keys plus a JSON hyperparameter sidecar —
the framework's native equivalent of the reference's
``{'model': state_dict, 'hp': dict}`` torch payload
(/root/reference/deephumor/models/caption_models.py:76-98). Orbax handles
full training state (deephumor_tpu/experiments/trainer.py); this format is
for portable model-only checkpoints.
"""

import json

import numpy as np

__all__ = ["flatten_tree", "unflatten_tree", "save_params", "load_params"]


def flatten_tree(tree, prefix=""):
    """Nested dict/list pytree -> {'a/b/0/c': leaf} flat dict."""
    flat = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip("/"): tree}
    for k, v in items:
        flat.update(flatten_tree(v, f"{prefix}{k}/"))
    return flat


def unflatten_tree(flat):
    """Inverse of :func:`flatten_tree`; integer path segments rebuild
    lists."""
    root = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p, nxt in zip(parts[:-1], parts[1:]):
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def _listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [
                _listify(node[str(i)]) for i in range(len(keys))
            ]
        return {k: _listify(v) for k, v in node.items()}

    return _listify(root)


def save_params(path, params, hp=None):
    """Writes ``<base>.npz`` (npz of flat leaves) and ``<base>.json``
    (hp), where ``base`` is ``path`` without any ``.npz`` suffix — the
    exact names :func:`load_params` reads back whether or not the caller
    spelled out ``.npz`` (np.savez appends it itself)."""
    flat = {k: np.asarray(v) for k, v in flatten_tree(params).items()}
    np.savez(path, **flat)
    base = str(path)
    if base.endswith(".npz"):
        base = base[: -len(".npz")]
    if hp is not None:
        with open(f"{base}.json", "w") as f:
            json.dump(hp, f, indent=2)


def load_params(path):
    """Returns ``(params, hp | None)`` saved by :func:`save_params`."""
    with np.load(path if str(path).endswith(".npz") else f"{path}.npz") as z:
        flat = {k: z[k] for k in z.files}
    hp = None
    base = str(path)
    if base.endswith(".npz"):
        base = base[: -len(".npz")]
    try:
        with open(f"{base}.json") as f:
            hp = json.load(f)
    except FileNotFoundError:
        pass
    return unflatten_tree(flat), hp

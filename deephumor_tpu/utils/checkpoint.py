"""Orbax-based checkpointing for full training state.

Complements the portable npz format (deephumor_tpu/utils/pytree.py) with
async-capable, sharding-aware Orbax checkpoints — the right tool for large
multi-chip training state (SURVEY.md §5 checkpoint/resume plan). The
reference has no optimizer-state saving or resume at all
(/root/reference/deephumor/experiments/trainer.py — weights-only saves).
"""

import os

__all__ = ["save_orbax", "restore_orbax", "latest_step"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_orbax(directory, state, step):
    """Writes ``state`` under ``<directory>/<step>``."""
    path = os.path.join(os.path.abspath(directory), str(int(step)))
    _checkpointer().save(path, state, force=True)
    return path


def restore_orbax(directory, step=None, template=None):
    """Restores the given (or latest) step; ``template`` restores with
    matching shardings/dtypes."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), str(int(step)))
    if template is not None:
        import orbax.checkpoint as ocp

        return _checkpointer().restore(
            path, item=template
        ), step
    return _checkpointer().restore(path), step


def latest_step(directory):
    """Highest numeric subdirectory, or None."""
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
    return max(steps) if steps else None

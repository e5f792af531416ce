"""deephumor_tpu — a TPU-native meme-caption generation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ilya16/deephumor
(reference mounted at /root/reference), designed TPU-first:

- all four caption models (2x LSTM, 2x Transformer) as functional modules over
  explicit parameter pytrees,
- a single jitted ``lax.scan`` generation engine with KV caches and batched
  stochastic/greedy beam search (replacing the reference's per-step Python
  loops, ``models/beam.py`` + ``models/rnn_models.py:48-143`` +
  ``models/transformers.py:492-579``),
- ``jax.sharding`` mesh parallelism for batch-scaled generation and training,
- the reference's public data/imaging API surface (tokenizers, Vocab,
  renderer) kept compatible.
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_compile_cache():
    """Point jax at an on-disk compilation cache (first compile of the
    ResNet trunk / decode loop costs tens of seconds; every CLI and
    pipeline run after the first then starts hot). Opt out with
    ``DEEPHUMOR_JAX_CACHE=0``; override the location with
    ``DEEPHUMOR_JAX_CACHE=/path``. Never raises — a read-only filesystem
    just skips the cache."""
    # subprocess guard: render workers (pipeline spawn pool) set this
    # before spawning; the gate's jax.default_backend() probe below
    # would otherwise initialize a device backend INSIDE each worker —
    # on a PJRT-plugin TPU host (JAX_PLATFORMS unset) that contends the
    # single device claim and can hang the workers.
    if _os.environ.get("DEEPHUMOR_SKIP_JAX_CACHE") == "1":
        return
    setting = _os.environ.get("DEEPHUMOR_JAX_CACHE", "")
    if setting == "0":
        return
    path = setting or _os.path.join(
        _os.path.expanduser("~"), ".cache", "deephumor_tpu", "jax"
    )
    try:
        import jax

        # CPU AOT cache entries embed host machine features; reloading
        # them on a different host warns about (and risks) SIGILL —
        # notably with NFS/shared home caches. The cache is for the
        # expensive TPU compiles, so decide on the ACTUAL backend (a host
        # with no accelerator silently defaults to cpu even with
        # JAX_PLATFORMS unset), not just the env var. The env fast-path
        # avoids initializing the backend when it already answers.
        platforms = _os.environ.get("JAX_PLATFORMS", "")
        try:
            # a caller (or conftest/site hook) may have overridden the
            # platform via jax.config BEFORE importing this package —
            # the config value wins over the env var at backend init,
            # so it must win here too
            platforms = jax.config.jax_platforms or platforms
        except AttributeError:
            pass
        if str(platforms).startswith("cpu"):
            return
        if not platforms and jax.default_backend() == "cpu":
            return
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


_enable_persistent_compile_cache()

from deephumor_tpu.data import (
    SPECIAL_TOKENS,
    Vocab,
    build_vocab,
    build_vocab_from_file,
    Tokenizer,
    WordPunctTokenizer,
    CharTokenizer,
)

__all__ = [
    "SPECIAL_TOKENS",
    "Vocab",
    "build_vocab",
    "build_vocab_from_file",
    "Tokenizer",
    "WordPunctTokenizer",
    "CharTokenizer",
]

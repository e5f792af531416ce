"""In-place KV-cache column writes as a Pallas TPU kernel.

The decode loop appends one position to each layer's K/V cache per step.
As a plain ``dynamic_update_slice`` this costs a full cache copy per
update on TPU: the updated buffer is consumed both by the attention
custom-call and the loop carry, so XLA materializes a fresh 38 MB copy
instead of updating in place (measured 1.15 ms/step at 1120 rows x 6
layers — ~37% of the whole decode step).

Here the caches stay in HBM (``memory_space=ANY``) and are aliased
input->output (zero-copy donation). TPU DMAs cannot address a single
position of the tiled (P, D) trailing dims (slices must be 8-aligned
along P), so the kernel read-modify-writes the 8-position tile that
contains ``pos``: tile in (9 MB), insert the new column in VMEM, tile
out. ~18 MB of traffic per cache update instead of a 76 MB buffer copy.
"""

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cache_column_write"]

_TILE = 8  # sublane tiling of the position axis


def _kernel(pos_ref, k_cache, v_cache, k_new, v_new, k_out, v_out,
            k_tile, v_tile, sem_k, sem_v, *, block_rows):
    del k_cache, v_cache  # aliased with k_out/v_out (same HBM buffers)
    i = pl.program_id(0)
    pos = pos_ref[0]
    tile = pl.multiple_of((pos // _TILE) * _TILE, _TILE)
    off = pos % _TILE
    row0 = i * block_rows

    k_dst = k_out.at[pl.ds(row0, block_rows), pl.ds(tile, _TILE), :]
    v_dst = v_out.at[pl.ds(row0, block_rows), pl.ds(tile, _TILE), :]
    dk = pltpu.make_async_copy(k_dst, k_tile, sem_k)
    dv = pltpu.make_async_copy(v_dst, v_tile, sem_v)
    dk.start()
    dv.start()
    dk.wait()
    dv.wait()

    # masked insert (a dynamic single-sublane store is not addressable)
    sel = jax.lax.broadcasted_iota(
        jnp.int32, (block_rows, _TILE, k_tile.shape[-1]), 1) == off
    k_tile[:] = jnp.where(sel, k_new[:], k_tile[:])
    v_tile[:] = jnp.where(sel, v_new[:], v_tile[:])

    dk = pltpu.make_async_copy(k_tile, k_dst, sem_k)
    dv = pltpu.make_async_copy(v_tile, v_dst, sem_v)
    dk.start()
    dv.start()
    dk.wait()
    dv.wait()


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows"))
def cache_column_write(cache_k, cache_v, k_new, v_new, pos,
                       block_rows=320, interpret=False):
    """Writes ``k_new``/``v_new`` at position ``pos`` of the caches.

    Args:
        cache_k/cache_v: ``[rows, P, D]`` (any float dtype) — donated;
            returned aliased, with only column ``pos`` rewritten.
        k_new/v_new: ``[rows, D]`` new entries (cast to the cache dtype).
        pos: int32 scalar.

    Returns:
        (cache_k, cache_v) — the same buffers, updated in place.
    """
    rows, p, d = cache_k.shape
    block_rows = min(block_rows, rows)
    while block_rows < rows and (
        rows % block_rows != 0 or block_rows % _TILE != 0
    ):
        block_rows -= 1
    if block_rows < 1:
        block_rows = rows

    k_new = k_new.astype(cache_k.dtype)[:, None, :]
    v_new = v_new.astype(cache_v.dtype)[:, None, :]
    pos = jnp.asarray(pos, jnp.int32).reshape(1)
    kernel = functools.partial(_kernel, block_rows=block_rows)

    if interpret:
        ctx = pltpu.force_tpu_interpret_mode()
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        return pl.pallas_call(
            kernel,
            grid=(rows // block_rows,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((block_rows, 1, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, 1, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
                jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
            ),
            input_output_aliases={1: 0, 2: 1},
            scratch_shapes=[
                pltpu.VMEM((block_rows, _TILE, d), cache_k.dtype),
                pltpu.VMEM((block_rows, _TILE, d), cache_v.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(pos, cache_k, cache_v, k_new, v_new)

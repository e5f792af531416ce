"""Stage attribution INSIDE the fused top-k Gumbel sampler kernel.

The word-config decode profile (benchmarks/word_profile.py) shows the
sampler kernel at ~2.4 ms/call on [4480, 29184] — 7.6x its HBM read bound
(261 MB bf16 logits), i.e. VPU-bound. This bench times stripped kernel
variants to attribute that time to the three VPU phases:

  count    - the 17 threshold-search count passes (exact kth largest)
  gumbel   - on-core RNG bits + u -> -log(-log u) + perturb/mask
  extract  - num_draws x (masked max + hit + without-replacement update)

Variants (cumulative, so stage cost = difference):
  count_only     : threshold search, emit t as a dummy id
  no_extract     : count + gumbel + ONE draw
  full           : the real kernel (count + gumbel + 5 draws)

Run: python -m benchmarks.sampler_profile  (real TPU)
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deephumor_tpu.ops.pallas_sampler import (
    _INT_MIN, _NEG_LARGE, _order_key, fused_topk_gumbel_sample)

ROWS, VOCAB, TOP_K, DRAWS = 4480, 29184, 64, 5
BLOCK = 128


def _count_kernel(seed_ref, invt_ref, logits_ref, ids_ref, *, top_k,
                  num_draws, unk_index, vocab):
    logits = logits_ref[:].astype(jnp.float32)
    keys = _order_key(logits)
    cnt = jnp.sum((keys >= 0).astype(jnp.int32), axis=1, keepdims=True)
    t = jnp.where(cnt >= top_k, 0, _INT_MIN).astype(jnp.int32)

    def refine(bit, t):
        cand = t | (jnp.int32(1) << bit)
        c = jnp.sum((keys >= cand).astype(jnp.int32), axis=1,
                    keepdims=True)
        return jnp.where(c >= top_k, cand, t)

    t = jax.lax.fori_loop(0, 16, lambda i, t: refine(30 - i, t), t)
    for j in range(num_draws):
        ids_ref[:, j] = t[:, 0]  # dummy: keep t live


def _partial_kernel(seed_ref, invt_ref, logits_ref, ids_ref, *, top_k,
                    num_draws, unk_index, vocab, draws):
    """count + gumbel + ``draws`` extraction passes (real math)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    logits = logits_ref[:].astype(jnp.float32)
    rows = logits.shape[0]
    keys = _order_key(logits)
    cnt = jnp.sum((keys >= 0).astype(jnp.int32), axis=1, keepdims=True)
    t = jnp.where(cnt >= top_k, 0, _INT_MIN).astype(jnp.int32)

    def refine(bit, t):
        cand = t | (jnp.int32(1) << bit)
        c = jnp.sum((keys >= cand).astype(jnp.int32), axis=1,
                    keepdims=True)
        return jnp.where(c >= top_k, cand, t)

    t = jax.lax.fori_loop(0, 16, lambda i, t: refine(30 - i, t), t)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, vocab), 1)
    keep = (keys >= t) & (col != unk_index)
    bits = pltpu.bitcast(pltpu.prng_random_bits((rows, vocab)), jnp.uint32)
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = bits24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    u = jnp.maximum(u, jnp.float32(1e-10))
    gumbel = -jnp.log(-jnp.log(u))
    perturbed = jnp.where(keep, logits * invt_ref[0] + gumbel, _NEG_LARGE)
    col_bits = max(13, int(vocab - 1).bit_length())
    cmask = (1 << col_bits) - 1
    pcol = jnp.int32(cmask) - col
    packed = (_order_key(perturbed) & jnp.int32(~cmask)) | pcol
    packed = jnp.where(keep, packed, _INT_MIN)
    for j in range(num_draws):
        if j < draws:
            m = jnp.max(packed, axis=1, keepdims=True)
            idx = jnp.int32(cmask) - (m & jnp.int32(cmask))
            idx = jnp.where(m == _INT_MIN, 0, idx)
            hit = col == idx
            ids_ref[:, j] = idx[:, 0]
            packed = jnp.where(hit, _INT_MIN, packed)
        else:
            ids_ref[:, j] = jnp.zeros((rows,), jnp.int32)


def _run_variant(kernel, logits, name, iters=30):
    rows, vocab = logits.shape
    grid = (rows // BLOCK,)
    out_cols = 128  # lane width, as in the production kernel
    f = pl.pallas_call(
        functools.partial(kernel, top_k=TOP_K, num_draws=DRAWS,
                          unk_index=1, vocab=vocab),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK, vocab), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, out_cols), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    @jax.jit
    def loop(logits):
        def body(i, acc):
            ids = f(jnp.asarray([i], jnp.int32),
                    jnp.asarray([1.0], jnp.float32), logits)
            return acc + ids[0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    int(loop(logits))  # compile + warm
    t0 = time.perf_counter()
    int(loop(logits))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:7.3f} ms/call")
    return dt


def main():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(
        rng.normal(size=(ROWS, VOCAB)).astype(np.float32), jnp.bfloat16)

    # the real production kernel (its own wrapper: block sizing etc.)
    @jax.jit
    def real_loop(logits):
        def body(i, acc):
            ids, _ = fused_topk_gumbel_sample(
                logits, i, jnp.float32(1.0), top_k=TOP_K, num_draws=DRAWS)
            return acc + ids[0, 0]
        return jax.lax.fori_loop(0, 30, body, jnp.int32(0))

    int(real_loop(logits))
    t0 = time.perf_counter()
    int(real_loop(logits))
    t_real = (time.perf_counter() - t0) / 30
    print(f"{'production kernel':34s} {t_real*1e3:7.3f} ms/call")

    t_count = _run_variant(_count_kernel, logits, "count passes only")
    t_d1 = _run_variant(
        functools.partial(_partial_kernel, draws=1), logits,
        "count + gumbel + 1 draw")
    t_d5 = _run_variant(
        functools.partial(_partial_kernel, draws=5), logits,
        "count + gumbel + 5 draws (= full)")
    print()
    print(f"count passes : {t_count*1e3:7.3f} ms")
    print(f"gumbel+1draw : {(t_d1 - t_count)*1e3:7.3f} ms")
    print(f"4 more draws : {(t_d5 - t_d1)*1e3:7.3f} ms "
          f"({(t_d5 - t_d1)/4*1e3:.3f} ms/draw)")


if __name__ == "__main__":
    main()

"""Ablation ladder for the fused ancestry-attention decode kernel.

Strips one stage at a time from _kernel_native4d_update to localize the
per-step cost (the kernel is per-element bound, not DMA bound — see
attn_microbench.py). Variants are NOT numerically meaningful; only their
amortized runtimes matter.
"""

import contextlib
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deephumor_tpu.ops import pallas_attention as pa

ITEMS, BEAM, P, D, HEADS = 224, 5, 40, 512, 8
ROWS = ITEMS * BEAM
HD = D // HEADS
SCALE = float(HD) ** 0.5


def make_kernel(*, substitute, writeback, qk, softmax, av):
    def kernel(pos_ref, q_ref, k_ref, v_ref, knew_ref, vnew_ref, bias_ref,
               kout_ref, vout_ref, out_ref, e_ref, kw_ref, vw_ref, sem_k,
               sem_v, *, n_heads, scale, block_items):
        pos = pos_ref[0]
        grid_i = pl.program_id(0)
        bi, beam, pe, d_model = k_ref.shape
        head_dim = d_model // n_heads
        inv_scale = 1.0 / scale

        if substitute:
            sel = jax.lax.broadcasted_iota(
                jnp.int32, (bi, beam, pe, 1), 2) == pos
            kb = jnp.where(sel, knew_ref[:].astype(k_ref.dtype), k_ref[:])
            vb = jnp.where(sel, vnew_ref[:].astype(v_ref.dtype), v_ref[:])
        else:
            kb = k_ref[:]
            vb = v_ref[:]

        if writeback:
            tile = pl.multiple_of((pos // 8) * 8, 8)
            row0 = grid_i * block_items
            dk = pltpu.make_async_copy(
                k_ref.at[:, :, pl.ds(tile, 8), :], kw_ref, sem_k)
            dv = pltpu.make_async_copy(
                v_ref.at[:, :, pl.ds(tile, 8), :], vw_ref, sem_v)
            dk.start(); dv.start(); dk.wait(); dv.wait()
            sel8 = jax.lax.broadcasted_iota(
                jnp.int32, (bi, beam, 8, 1), 2) == pos % 8
            kw_ref[:] = jnp.where(sel8, knew_ref[:].astype(kw_ref.dtype),
                                  kw_ref[:])
            vw_ref[:] = jnp.where(sel8, vnew_ref[:].astype(vw_ref.dtype),
                                  vw_ref[:])
            dk = pltpu.make_async_copy(
                kw_ref, kout_ref.at[pl.ds(row0, bi), :, pl.ds(tile, 8), :],
                sem_k)
            dv = pltpu.make_async_copy(
                vw_ref, vout_ref.at[pl.ds(row0, bi), :, pl.ds(tile, 8), :],
                sem_v)
            dk.start(); dv.start()

        for h in range(n_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q_h = q_ref[:, :, sl]
            if qk:
                for i in range(beam):
                    e = jax.lax.dot_general(
                        q_h, kb[:, i, :, sl],
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    e_ref[:, :, i, :] = e * inv_scale + bias_ref[:, :, i, 0:pe]
            else:
                e_ref[:] = jnp.broadcast_to(
                    bias_ref[:][:, :, :, 0:pe], e_ref.shape)

            e_all = e_ref[:]
            if softmax:
                m = jnp.max(jnp.max(e_all, axis=3, keepdims=True), axis=2,
                            keepdims=True)
                w = jnp.exp(e_all - m)
                denom = jnp.sum(jnp.sum(w, axis=3, keepdims=True), axis=2,
                                keepdims=True)
                w = (w / denom).astype(vb.dtype)
            else:
                w = e_all.astype(vb.dtype)

            if av:
                acc = None
                for i in range(beam):
                    part = jax.lax.dot_general(
                        w[:, :, i, :], vb[:, i, :, sl],
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
                out_ref[:, :, sl] = acc.astype(out_ref.dtype)
            else:
                # still touch both caches so their DMA isn't dead-code'd
                out_ref[:, :, sl] = (kb[:, :, 0, sl]
                                     + vb[:, :, 0, sl]).astype(out_ref.dtype)

        if writeback:
            dk.wait()
            dv.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("block_items", "flags"))
def run_variant(q, cache_k, cache_v, k_new, v_new, bias, pos, *,
                block_items=8, flags=()):
    fl = dict(flags)
    rows, p, d_model = cache_k.shape
    num_items = rows // beam_ if (beam_ := BEAM) else 0
    qg = q.reshape(num_items, BEAM, d_model)
    kg = cache_k.reshape(num_items, BEAM, p, d_model)
    vg = cache_v.reshape(num_items, BEAM, p, d_model)
    knew = k_new.astype(cache_k.dtype).reshape(num_items, BEAM, 1, d_model)
    vnew = v_new.astype(cache_v.dtype).reshape(num_items, BEAM, 1, d_model)
    bias4 = bias.reshape(num_items, BEAM, BEAM, p)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    bi = block_items

    kernel = functools.partial(
        make_kernel(**fl), n_heads=HEADS, scale=SCALE, block_items=bi)
    kc, vc, out = pl.pallas_call(
        kernel,
        grid=(num_items // bi,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bi, BEAM, d_model), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, BEAM, p, d_model), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, BEAM, p, d_model), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, BEAM, 1, d_model), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, BEAM, 1, d_model), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, BEAM, BEAM, p), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bi, BEAM, d_model), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(kg.shape, kg.dtype),
            jax.ShapeDtypeStruct(vg.shape, vg.dtype),
            jax.ShapeDtypeStruct((num_items, BEAM, d_model), q.dtype),
        ),
        input_output_aliases={2: 0, 3: 1},
        scratch_shapes=[
            pltpu.VMEM((bi, BEAM, BEAM, p), jnp.float32),
            pltpu.VMEM((bi, BEAM, 8, d_model), cache_k.dtype),
            pltpu.VMEM((bi, BEAM, 8, d_model), cache_v.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 2 ** 20),
    )(pos_arr, qg, kg, vg, knew, vnew, bias4)
    return (out.reshape(rows, d_model), kc.reshape(rows, p, d_model),
            vc.reshape(rows, p, d_model))


def timeit(fn, args, iters=500):
    @jax.jit
    def loop(args):
        def body(_, a):
            o, k2, v2 = fn(*a)
            return (a[0], k2, v2) + tuple(a[3:])
        return jax.lax.fori_loop(0, iters, body, args)

    out = loop(args)
    np.asarray(jax.tree.leaves(out)[0][0, 0])
    t0 = time.perf_counter()
    out = loop(args)
    np.asarray(jax.tree.leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.normal(size=(ROWS, D)), dt)
    ck = jnp.asarray(rng.normal(size=(ROWS, P, D)), dt)
    cv = jnp.asarray(rng.normal(size=(ROWS, P, D)), dt)
    knew = jnp.asarray(rng.normal(size=(ROWS, D)), dt)
    vnew = jnp.asarray(rng.normal(size=(ROWS, D)), dt)
    anc = jnp.tile(jnp.arange(BEAM, dtype=jnp.int32)[None, :, None],
                   (ITEMS, 1, P))
    valid = jnp.ones((ROWS, P), bool)
    bias = pa.ancestry_bias(anc, valid, P)
    pos = jnp.int32(33)

    base = dict(substitute=True, writeback=True, qk=True, softmax=True,
                av=True)
    variants = [("full", {})]
    for drop in ("substitute", "writeback", "qk", "softmax", "av"):
        variants.append((f"-{drop}", {drop: False}))
    variants.append(("dma-only", dict(substitute=False, qk=False,
                                      softmax=False, av=False,
                                      writeback=False)))

    for name, over in variants:
        fl = tuple(sorted({**base, **over}.items()))
        try:
            f = functools.partial(run_variant, block_items=8, flags=fl)
            t = timeit(f, (q, ck, cv, knew, vnew, bias, pos)) * 1e3
            print(f"{name:12s}: {t:7.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()

"""Prototype v3 decode-attention kernels, benchmarked against v2.

Candidate optimizations over _kernel_native4d_update (see attn_ablation.py
for the stage costs this targets):
  A. writeback DMA overlapped with compute (v2 blocks on the tile read
     before any math),
  B. energies scratch with a LEADING head axis -> ONE softmax pass over
     all heads instead of 8 small ones,
  C. single rank-4 QK dot per head (slot loop folded into the rhs),
  D. multi-contraction AV dot per head (slot+position contracted at once).
Numerics are checked against the shipped kernel before timing.
"""

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


def make_v3(*, batched_softmax, qk_one_dot, av_one_dot):
    def kernel(pos_ref, q_ref, k_ref, v_ref, knew_ref, vnew_ref, bias_ref,
               kout_ref, vout_ref, out_ref, e_ref, kw_ref, vw_ref, sem_k,
               sem_v, *, n_heads, scale, block_items):
        pos = pos_ref[0]
        grid_i = pl.program_id(0)
        bi, beam, pe, d_model = k_ref.shape
        head_dim = d_model // n_heads
        inv_scale = 1.0 / scale

        # A: start the writeback tile read immediately; wait AFTER the
        # attention math so the DMA hides behind compute
        tile = pl.multiple_of((pos // 8) * 8, 8)
        row0 = grid_i * block_items
        dk_in = pltpu.make_async_copy(
            k_ref.at[:, :, pl.ds(tile, 8), :], kw_ref, sem_k)
        dv_in = pltpu.make_async_copy(
            v_ref.at[:, :, pl.ds(tile, 8), :], vw_ref, sem_v)
        dk_in.start()
        dv_in.start()

        sel = jax.lax.broadcasted_iota(
            jnp.int32, (bi, beam, pe, 1), 2) == pos
        kb = jnp.where(sel, knew_ref[:].astype(k_ref.dtype), k_ref[:])
        vb = jnp.where(sel, vnew_ref[:].astype(v_ref.dtype), v_ref[:])

        # ---- energies ----
        for h in range(n_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q_h = q_ref[:, :, sl]
            if qk_one_dot:
                e = jax.lax.dot_general(
                    q_h, kb[:, :, :, sl],
                    dimension_numbers=(((2,), (3,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                               # [bi, j, i, P]
                if batched_softmax:
                    e_ref[h] = e * inv_scale + bias_ref[:]
                else:
                    e_ref[:] = e * inv_scale + bias_ref[:]
            else:
                for i in range(beam):
                    e = jax.lax.dot_general(
                        q_h, kb[:, i, :, sl],
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    if batched_softmax:
                        e_ref[h, :, :, i, :] = (e * inv_scale
                                                + bias_ref[:, :, i, :])
                    else:
                        e_ref[:, :, i, :] = (e * inv_scale
                                             + bias_ref[:, :, i, :])

            if not batched_softmax:
                e_all = e_ref[:]
                m = jnp.max(jnp.max(e_all, axis=3, keepdims=True), axis=2,
                            keepdims=True)
                w = jnp.exp(e_all - m)
                denom = jnp.sum(jnp.sum(w, axis=3, keepdims=True), axis=2,
                                keepdims=True)
                w = (w / denom).astype(vb.dtype)
                _av(out_ref, w, vb, sl, av_one_dot)

        if batched_softmax:
            e_all = e_ref[:]                     # [H, bi, j, i, P]
            m = jnp.max(jnp.max(e_all, axis=4, keepdims=True), axis=3,
                        keepdims=True)
            w_all = jnp.exp(e_all - m)
            denom = jnp.sum(jnp.sum(w_all, axis=4, keepdims=True), axis=3,
                            keepdims=True)
            w_all = (w_all / denom).astype(vb.dtype)
            for h in range(n_heads):
                sl = slice(h * head_dim, (h + 1) * head_dim)
                _av(out_ref, w_all[h], vb, sl, av_one_dot)

        # writeback: wait tile read, insert column, DMA out, wait
        dk_in.wait()
        dv_in.wait()
        sel8 = jax.lax.broadcasted_iota(
            jnp.int32, (bi, beam, 8, 1), 2) == pos % 8
        kw_ref[:] = jnp.where(sel8, knew_ref[:].astype(kw_ref.dtype),
                              kw_ref[:])
        vw_ref[:] = jnp.where(sel8, vnew_ref[:].astype(vw_ref.dtype),
                              vw_ref[:])
        dk_out = pltpu.make_async_copy(
            kw_ref, kout_ref.at[pl.ds(row0, bi), :, pl.ds(tile, 8), :],
            sem_k)
        dv_out = pltpu.make_async_copy(
            vw_ref, vout_ref.at[pl.ds(row0, bi), :, pl.ds(tile, 8), :],
            sem_v)
        dk_out.start()
        dv_out.start()
        dk_out.wait()
        dv_out.wait()

    def _av(out_ref, w, vb, sl, one_dot):
        bi, beam = w.shape[0], w.shape[1]
        if one_dot:
            out = jax.lax.dot_general(
                w, vb[:, :, :, sl],
                dimension_numbers=(((2, 3), (1, 2)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                   # [bi, j, hd]
            out_ref[:, :, sl] = out.astype(out_ref.dtype)
        else:
            acc = None
            for i in range(beam):
                part = jax.lax.dot_general(
                    w[:, :, i, :], vb[:, i, :, sl],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
            out_ref[:, :, sl] = acc.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("block_items", "flags"))
def run_v3(q, cache_k, cache_v, k_new, v_new, bias, pos, *, block_items=8,
           flags=()):
    fl = dict(flags)
    rows, p, d_model = cache_k.shape
    num_items = rows // BEAM
    qg = q.reshape(num_items, BEAM, d_model)
    kg = cache_k.reshape(num_items, BEAM, p, d_model)
    vg = cache_v.reshape(num_items, BEAM, p, d_model)
    knew = k_new.astype(cache_k.dtype).reshape(num_items, BEAM, 1, d_model)
    vnew = v_new.astype(cache_v.dtype).reshape(num_items, BEAM, 1, d_model)
    bias4 = bias.reshape(num_items, BEAM, BEAM, p)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    bi = block_items

    e_shape = ((HEADS, bi, BEAM, BEAM, p) if fl["batched_softmax"]
               else (bi, BEAM, BEAM, p))
    kernel = functools.partial(
        make_v3(**fl), n_heads=HEADS, scale=SCALE, block_items=bi)
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
            pltpu.VMEM(e_shape, jnp.float32),
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
    anc = jnp.asarray(
        rng.integers(0, BEAM, size=(ITEMS, BEAM, P)), jnp.int32)
    valid = jnp.asarray(rng.random((ROWS, P)) < 0.9)
    valid = valid.at[:, 33].set(True)  # pos column must be valid
    bias = pa.ancestry_bias(anc, valid, P)
    pos = jnp.int32(33)

    # reference output from the shipped kernel
    ref_out, ref_k, ref_v = pa.ancestry_attention_update(
        q, ck, cv, knew, vnew, bias, pos, beam=BEAM, n_heads=HEADS)
    ref = (np.asarray(ref_out, np.float32), np.asarray(ref_k, np.float32),
           np.asarray(ref_v, np.float32))

    t = timeit(functools.partial(
        pa.ancestry_attention_update, beam=BEAM, n_heads=HEADS),
        (q, ck, cv, knew, vnew, bias, pos)) * 1e3
    print(f"shipped v2                         : {t:7.3f} ms")

    for name, fl in [
        ("A reorder only", dict(batched_softmax=False, qk_one_dot=False,
                                av_one_dot=False)),
        ("A+B batched softmax", dict(batched_softmax=True, qk_one_dot=False,
                                     av_one_dot=False)),
        ("A+B+C qk one dot", dict(batched_softmax=True, qk_one_dot=True,
                                  av_one_dot=False)),
        ("A+B+C+D av one dot", dict(batched_softmax=True, qk_one_dot=True,
                                    av_one_dot=True)),
    ]:
        flt = tuple(sorted(fl.items()))
        for bi in (8, 16):
            try:
                f = functools.partial(run_v3, block_items=bi, flags=flt)
                out = f(q, ck, cv, knew, vnew, bias, pos)
                got = [np.asarray(o, np.float32) for o in out]
                errs = [np.max(np.abs(g - r)) for g, r in zip(got, ref)]
                ok = all(e < 2e-2 for e in errs)
                t = timeit(f, (q, ck, cv, knew, vnew, bias, pos)) * 1e3
                print(f"{name:35s} bi={bi:2d}: {t:7.3f} ms  "
                      f"{'OK' if ok else 'MISMATCH ' + str(errs)}")
            except Exception as e:  # noqa: BLE001
                print(f"{name:35s} bi={bi:2d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()

"""v4 prototype: ALL heads in one QK + one AV dot via block-diagonal
masked queries.

Rows of q_all are (head, branch) pairs; row (h, j) carries q[j] masked to
head h's 64 lanes, so contracting the FULL d_model against the flat cache
gives exactly head h's energies (the other heads' lanes contribute 0).
The AV dot similarly produces per-(head, branch) full-D outputs whose
head-h lane block is the head's attention output. 8x the MACs of the
useful computation, but 2 MXU issues per block instead of 16 tiny ones.
Numerics-checked against the shipped kernel.
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


def kernel(pos_ref, q_ref, k_ref, v_ref, knew_ref, vnew_ref, bias_ref,
           kout_ref, vout_ref, out_ref, kw_ref, vw_ref, sem_k, sem_v,
           *, n_heads, block_items):
    pos = pos_ref[0]
    grid_i = pl.program_id(0)
    bi, beam, pe, d_model = k_ref.shape
    head_dim = d_model // n_heads
    inv_scale = 1.0 / SCALE

    tile = pl.multiple_of((pos // 8) * 8, 8)
    row0 = grid_i * block_items
    dk_in = pltpu.make_async_copy(k_ref.at[:, :, pl.ds(tile, 8), :],
                                  kw_ref, sem_k)
    dv_in = pltpu.make_async_copy(v_ref.at[:, :, pl.ds(tile, 8), :],
                                  vw_ref, sem_v)
    dk_in.start(); dv_in.start()

    sel = jax.lax.broadcasted_iota(jnp.int32, (bi, beam, pe, 1), 2) == pos
    kb = jnp.where(sel, knew_ref[:].astype(k_ref.dtype), k_ref[:])
    vb = jnp.where(sel, vnew_ref[:].astype(v_ref.dtype), v_ref[:])
    kb2 = kb.reshape(bi, beam * pe, d_model)
    vb2 = vb.reshape(bi, beam * pe, d_model)
    bias = bias_ref[:]                           # [bi, beam, beam*P]

    # masked q rows: [bi, H*beam, D]; row (h, j) = q[j] on head h lanes
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (bi, n_heads * beam, d_model), 2)
    hrow = jax.lax.broadcasted_iota(
        jnp.int32, (bi, n_heads * beam, d_model), 1) // beam
    qt = jnp.concatenate([q_ref[:]] * n_heads, axis=1)  # [bi, H*beam, D]
    q_all = jnp.where(lane // head_dim == hrow, qt, 0).astype(q_ref.dtype)

    e = jax.lax.dot_general(
        q_all, kb2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * inv_scale                                 # [bi, H*beam, beam*P]
    e = e + jnp.concatenate([bias] * n_heads, axis=1)
    attn = jax.nn.softmax(e, axis=-1).astype(vb2.dtype)

    out_all = jax.lax.dot_general(
        attn, vb2,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                             # [bi, H*beam, D]
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        out_ref[:, :, sl] = out_all[
            :, h * beam:(h + 1) * beam, sl].astype(out_ref.dtype)

    dk_in.wait(); dv_in.wait()
    sel8 = jax.lax.broadcasted_iota(jnp.int32, (bi, beam, 8, 1), 2) == pos % 8
    kw_ref[:] = jnp.where(sel8, knew_ref[:].astype(kw_ref.dtype), kw_ref[:])
    vw_ref[:] = jnp.where(sel8, vnew_ref[:].astype(vw_ref.dtype), vw_ref[:])
    dk_out = pltpu.make_async_copy(
        kw_ref, kout_ref.at[pl.ds(row0, bi), :, pl.ds(tile, 8), :], sem_k)
    dv_out = pltpu.make_async_copy(
        vw_ref, vout_ref.at[pl.ds(row0, bi), :, pl.ds(tile, 8), :], sem_v)
    dk_out.start(); dv_out.start(); dk_out.wait(); dv_out.wait()


@functools.partial(jax.jit, static_argnames=("block_items",))
def run(q, cache_k, cache_v, k_new, v_new, bias, pos, *, block_items=8):
    rows, p, d_model = cache_k.shape
    num_items = rows // BEAM
    qg = q.reshape(num_items, BEAM, d_model)
    kg = cache_k.reshape(num_items, BEAM, p, d_model)
    vg = cache_v.reshape(num_items, BEAM, p, d_model)
    knew = k_new.astype(cache_k.dtype).reshape(num_items, BEAM, 1, d_model)
    vnew = v_new.astype(cache_v.dtype).reshape(num_items, BEAM, 1, d_model)
    bias_flat = bias.reshape(num_items, BEAM, BEAM * p)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    bi = block_items
    k = functools.partial(kernel, n_heads=HEADS, block_items=bi)
    kc, vc, out = pl.pallas_call(
        k, grid=(num_items // bi,),
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
            pl.BlockSpec((bi, BEAM, BEAM * p), lambda i: (i, 0, 0),
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
            pltpu.VMEM((bi, BEAM, 8, d_model), cache_k.dtype),
            pltpu.VMEM((bi, BEAM, 8, d_model), cache_v.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 2 ** 20),
    )(pos_arr, qg, kg, vg, knew, vnew, bias_flat)
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
    anc = jnp.asarray(rng.integers(0, BEAM, size=(ITEMS, BEAM, P)),
                      jnp.int32)
    valid = jnp.asarray(rng.random((ROWS, P)) < 0.9).at[:, 33].set(True)
    bias = pa.ancestry_bias(anc, valid, P)
    pos = jnp.int32(33)

    ref = pa.ancestry_attention_update(
        q, ck.copy(), cv.copy(), knew, vnew, bias, pos, beam=BEAM,
        n_heads=HEADS)
    refs = [np.asarray(o, np.float32) for o in ref]
    t = timeit(functools.partial(
        pa.ancestry_attention_update, beam=BEAM, n_heads=HEADS),
        (q, ck, cv, knew, vnew, bias, pos)) * 1e3
    print(f"shipped flat kernel : {t:7.3f} ms")

    for bi in (8, 16):
        try:
            f = functools.partial(run, block_items=bi)
            got = [np.asarray(o, np.float32)
                   for o in f(q, ck.copy(), cv.copy(), knew, vnew, bias,
                              pos)]
            errs = [np.max(np.abs(g - r)) for g, r in zip(got, refs)]
            ok = all(e < 2e-2 for e in errs)
            t = timeit(f, (q, ck, cv, knew, vnew, bias, pos)) * 1e3
            print(f"v4 all-heads bi={bi:2d}: {t:7.3f} ms  "
                  f"{'OK' if ok else 'MISMATCH ' + str(errs)}")
        except Exception as e:  # noqa: BLE001
            print(f"v4 all-heads bi={bi:2d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()

"""Micro-benchmark: decode-step ancestry-attention kernel in isolation.

Times ops/pallas_attention.ancestry_attention_update at the serving shape
(224 memes x beam 5 = 1120 rows, P=40, D=512, bf16) across p_eff settings.
If the kernel is DMA-bound (STATUS.md round-2 hypothesis), time should
scale ~linearly with the cache prefix read — which decides whether an
int8 KV cache (halved DMA bytes) is worth a kernel variant.

Run on the real chip: python benchmarks/attn_microbench.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from deephumor_tpu.ops import pallas_attention as pa

ITEMS, BEAM, P, D, HEADS = 224, 5, 40, 512, 8
ROWS = ITEMS * BEAM


def timeit(fn, *args, iters=500, **kw):
    """Times ``fn`` amortized inside ONE jitted fori_loop (per-dispatch
    latency through the remote tunnel is ~1 ms and would swamp a
    call-per-iteration measurement; the real decode loop is one jit)."""

    @jax.jit
    def loop(args):
        def body(_, a):
            out = fn(*a, **kw)
            if isinstance(out, tuple):  # update kernel: thread the caches
                o, ck, cv = out
                return (a[0], ck, cv) + tuple(a[3:])
            return (out.astype(a[0].dtype),) + tuple(a[1:])
        return jax.lax.fori_loop(0, iters, body, args)

    out = loop(args)
    np.asarray(jax.tree.leaves(out)[0][0, 0])  # force remote completion
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

    for pe in (None, 32, 24, 16, 8):
        vb = valid if pe is None else valid.at[:, pe:].set(False)
        b = pa.ancestry_bias(anc, vb, P)
        ps = pos if pe is None else jnp.int32(pe - 1)
        dt_ms = timeit(
            pa.ancestry_attention_update, q, ck, cv, knew, vnew, b, ps,
            beam=BEAM, n_heads=HEADS, p_eff=pe,
        ) * 1e3
        label = P if pe is None else pe
        bytes_mb = 2 * ROWS * label * D * 2 / 2**20
        print(f"p_eff={label:3d}: {dt_ms:7.3f} ms   "
              f"(K+V read {bytes_mb:.0f} MiB -> {bytes_mb/2**10/dt_ms*1e3:.0f} GiB/s)")

    # read-only kernel (no fused write): impl comparison
    for impl in ("native4d", "grouped", "blockdiag"):
        for bi in (8, 16, 32):
            try:
                dt_ms = timeit(pa.ancestry_attention, q, ck, cv, bias,
                               beam=BEAM, n_heads=HEADS, impl=impl,
                               block_items=bi) * 1e3
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"read-only {impl:9s} bi={bi:2d}: FAILED "
                      f"{type(e).__name__}")
                continue
            print(f"read-only {impl:9s} bi={bi:2d}: {dt_ms:7.3f} ms")


if __name__ == "__main__":
    main()

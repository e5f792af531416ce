"""What is the DMA floor for streaming the KV caches once per step?

A trivial Pallas kernel reads the K and V blocks and writes a tiny
per-block reduction — measuring pure HBM->VMEM streaming at the decode
kernel's exact shapes/blocking, amortized inside one jitted loop.
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITEMS, BEAM, P, D = 224, 5, 40, 512
ROWS = ITEMS * BEAM


def _read_kernel(k_ref, v_ref, out_ref):
    def red(ref):
        x = jnp.sum(ref[:].astype(jnp.float32), axis=2, keepdims=True)
        return jnp.sum(x, axis=1, keepdims=True)  # [br, 1, 1]

    s = red(k_ref) + red(v_ref)
    out_ref[:, :, :] = jnp.broadcast_to(s, out_ref.shape)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def stream_read(ck, cv, block_rows=80):
    rows = ck.shape[0]
    grid = (rows // block_rows,)
    return pl.pallas_call(
        _read_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, P, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, P, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 1, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20,
        ),
    )(ck, cv)


def timeit(fn, *args, iters=500):
    @jax.jit
    def loop(a):
        def body(_, acc):
            out = fn(*a)
            return acc + out[0, 0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    np.asarray(loop(args))
    t0 = time.perf_counter()
    np.asarray(loop(args))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        if dt == jnp.int8:
            ck = jnp.asarray(
                rng.integers(-127, 127, size=(ROWS, P, D)), jnp.int8)
            cv = ck
        else:
            ck = jnp.asarray(rng.normal(size=(ROWS, P, D)), dt)
            cv = jnp.asarray(rng.normal(size=(ROWS, P, D)), dt)
        nbytes = 2 * ck.nbytes / 2**20
        for br in (40, 80, 160, 280, 560):
            if ROWS % br:
                continue
            try:
                t = timeit(functools.partial(stream_read, block_rows=br),
                           ck, cv) * 1e3
            except Exception as e:  # noqa: BLE001
                print(f"{name} block_rows={br:4d}: FAILED {type(e).__name__}")
                continue
            print(f"{name} block_rows={br:4d}: {t:7.3f} ms  "
                  f"({nbytes:.0f} MiB -> {nbytes/2**10/t*1e3:.0f} GiB/s)")


if __name__ == "__main__":
    main()

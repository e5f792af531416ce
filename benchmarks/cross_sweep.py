"""Cross-attention kernel sweep at the word headline shape (lever #5).

WORD_PERF.md: grouped cross-attention measures 0.84 ms/step (6 layers)
vs a 0.33 ms byte floor — "issue-bound at 49 positions". Two candidate
mechanisms, separable by this sweep:

  (a) grid-step issue overhead  -> larger ``block_items`` amortizes it;
  (b) per-item skinny-dot MXU granularity (each batched dot is a
      [40,512]x[512,49] stub, ~12% of an MXU tile) -> block size is
      irrelevant; the fix is restructuring the dot.

Times one layer's `grouped_cross_attention` amortized inside a jitted
fori_loop (attn_microbench.py explains the ~25 ms tunnel dispatch
overhead that invalidates isolated timings).

Run: python -m benchmarks.cross_sweep
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from deephumor_tpu.ops import pallas_attention as pa

G, BEAM, T, D, HEADS = 896, 5, 49, 512, 8
ITERS = 300


def amortized(loop, iters):
    out = loop()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    out = loop()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(G * BEAM, D)), jnp.bfloat16)
    ek = jnp.asarray(rng.normal(size=(G, T, D)), jnp.bfloat16)
    ev = jnp.asarray(rng.normal(size=(G, T, D)), jnp.bfloat16)

    floor_ms = (2 * G * T * D * 2) / 810e9 * 1e3
    print(f"shape: G={G} beam={BEAM} T={T} D={D}; "
          f"K/V stream floor {floor_ms:.3f} ms/layer")

    t_pad = -(-T // 8) * 8
    ekp = jnp.pad(ek, ((0, 0), (0, t_pad - T), (0, 0)))
    evp = jnp.pad(ev, ((0, 0), (0, t_pad - T), (0, 0)))

    def leg(label, fn):
        @jax.jit
        def loop(q):
            def body(_, acc):
                return fn(acc).astype(acc.dtype)
            return jax.lax.fori_loop(0, ITERS, body, q)

        try:
            t = amortized(lambda: loop(q), ITERS)
            print(f"{label}: {t*1e3:7.3f} ms/layer "
                  f"({floor_ms/(t*1e3)*100:5.1f}% of byte floor)",
                  flush=True)
        except Exception as e:  # Mosaic rejections at large blocks
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    import os
    only = os.environ.get("DH_CROSS_SWEEP", "")  # e.g. "b16,p56.4"
    sel = set(only.split(",")) if only else None

    for bi in (16, 32, 56):
        if sel is not None and f"b{bi}" not in sel:
            continue
        leg(f"baseline    bi={bi:3d}       ",
            functools.partial(pa.grouped_cross_attention, ek=ek, ev=ev,
                              bias=None, groups=G, n_heads=HEADS,
                              block_items=bi))

    for bi in (16, 32, 56, 112):
        for ng in (2, 4, 8, 16):
            if bi % ng or G % bi:
                continue
            if sel is not None and f"p{bi}.{ng}" not in sel:
                continue
            leg(f"packed      bi={bi:3d} ng={ng:2d} ",
                functools.partial(pa.grouped_cross_attention, ek=ekp,
                                  ev=evp, bias=None, groups=G,
                                  n_heads=HEADS, block_items=bi,
                                  pack_items=ng, t_real=T))


if __name__ == "__main__":
    main()

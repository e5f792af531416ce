"""Block-size sweep + achieved-bandwidth ledger for the decode kernels.

The char serving step is HBM-bound (BENCH char config: rows=1792, D=512,
6 layers — the canon step's modeled minimum traffic is ~1.2 GB/step, so
1250 capt/s/chip sits near the bandwidth speed-of-light for the bf16
layout). This harness measures each Pallas kernel IN ISOLATION at the
exact char shapes, sweeping ``block_items``, and reports ms/call plus
achieved GB/s against the modeled bytes — the data for choosing the
block-size defaults (currently heuristic: pallas_attention.py:874-875)
and for judging how much headroom kernel tuning has left vs a layout
change (e.g. int8 shared prefix).

Run on hardware: python -m benchmarks.canon_block_sweep
CPU plumbing smoke: DH_SWEEP_SMOKE=1 python -m benchmarks.canon_block_sweep
"""

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

SMOKE = os.environ.get("DH_SWEEP_SMOKE") == "1"
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

from deephumor_tpu.ops import pallas_attention as pa  # noqa: E402

# char serving config (benchmarks/char_ledger.py)
BATCH, BEAM, HID, HEADS = 256, 7, 512, 8
LEN = 128
ITERS = 50
INTERPRET = False
if SMOKE:
    BATCH, LEN, ITERS = 8, 32, 2
    INTERPRET = True

ROWS = BATCH * BEAM
P_CACHE = -(-(LEN + 1) // 8) * 8
DT = jnp.bfloat16
BYTES = 2  # bf16


def amortized(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / ITERS


def report(name, t_s, model_bytes):
    gbs = model_bytes / t_s / 1e9
    print(f"{name:52s} {t_s*1e3:7.3f} ms  {gbs:7.1f} GB/s", flush=True)


def make_inputs(c, pe):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(ROWS, HID)), DT)
    ck = jnp.asarray(rng.normal(size=(ROWS, P_CACHE, HID)), DT)
    cv = jnp.asarray(rng.normal(size=(ROWS, P_CACHE, HID)), DT)
    sk = jnp.asarray(rng.normal(size=(BATCH, c, HID)), DT)
    sv = jnp.asarray(rng.normal(size=(BATCH, c, HID)), DT)
    knew = jnp.asarray(rng.normal(size=(ROWS, HID)), DT)
    vnew = jnp.asarray(rng.normal(size=(ROWS, HID)), DT)
    bsh = jnp.zeros((BATCH, 1, c), jnp.float32)
    bwin = jnp.zeros((BATCH, BEAM, BEAM * (pe - c)), jnp.float32)
    # full-width kernel's bias spans the whole (padded) cache axis
    bias_full = jnp.zeros((BATCH, BEAM, BEAM * P_CACHE), jnp.float32)
    return q, ck, cv, sk, sv, knew, vnew, bsh, bwin, bias_full


def sweep_canon(c, pe, pos):
    w = pe - c
    q, ck, cv, sk, sv, knew, vnew, bsh, bwin, _ = make_inputs(c, pe)
    # model: shared (K+V) once per item + window (K+V) per row + one
    # 8-tile writeback per row (K+V) + q/out/knew/vnew rows
    model_bytes = (
        BATCH * c * HID * 2 * BYTES
        + ROWS * w * HID * 2 * BYTES
        + ROWS * 8 * HID * 2 * BYTES
        + 4 * ROWS * HID * BYTES
        + bsh.size * 4 + bwin.size * 4
    )
    for bi in (8, 16, 32, 64):
        # bi*BEAM must be sublane-aligned or _pick_block_items falls
        # back to ONE whole-axis block (measured: VMEM OOM at c=112)
        if BATCH % bi or (bi * BEAM) % 8:
            continue

        @jax.jit
        def loop(q, ck, cv, sk, sv, knew, vnew, bsh, bwin, _bi=bi):
            def body(i, carry):
                ck, cv, acc = carry
                out, ck, cv = pa.ancestry_attention_update_canon(
                    q, ck, cv, sk, sv, knew, vnew, bsh, bwin, pos,
                    beam=BEAM, n_heads=HEADS, c=c, p_eff=pe,
                    block_items=_bi, interpret=INTERPRET)
                return (ck, cv, acc + out[0, 0])
            return jax.lax.fori_loop(
                0, ITERS, body, (ck, cv, jnp.zeros((), DT)))[2]

        t = amortized(loop, q, ck, cv, sk, sv, knew, vnew, bsh, bwin)
        report(f"canon c={c} pe={pe} block_items={bi}", t, model_bytes)


def sweep_full(pe, pos):
    q, ck, cv, _, _, knew, vnew, _, _, bias = make_inputs(8, pe)
    model_bytes = (
        ROWS * pe * HID * 2 * BYTES
        + ROWS * 8 * HID * 2 * BYTES
        + 4 * ROWS * HID * BYTES
        + bias.size * 4
    )
    for bi in (8, 16, 32):
        if BATCH % bi or (bi * BEAM) % 8:
            continue

        @jax.jit
        def loop(q, ck, cv, knew, vnew, bias, _bi=bi):
            def body(i, carry):
                ck, cv, acc = carry
                out, ck, cv = pa.ancestry_attention_update(
                    q, ck, cv, knew, vnew, bias, pos,
                    beam=BEAM, n_heads=HEADS, p_eff=pe,
                    block_items=_bi, interpret=INTERPRET)
                return (ck, cv, acc + out[0, 0])
            return jax.lax.fori_loop(
                0, ITERS, body, (ck, cv, jnp.zeros((), DT)))[2]

        t = amortized(loop, q, ck, cv, knew, vnew, bias)
        report(f"full  pe={pe} block_items={bi}", t, model_bytes)


def sweep_cross():
    t_enc = 49
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(ROWS, HID)), DT)
    ek = jnp.asarray(rng.normal(size=(BATCH, t_enc, HID)), DT)
    ev = jnp.asarray(rng.normal(size=(BATCH, t_enc, HID)), DT)
    model_bytes = (BATCH * t_enc * HID * 2 * BYTES
                   + 2 * ROWS * HID * BYTES)
    for bi in (8, 16, 32, 64):
        if BATCH % bi:
            continue

        @jax.jit
        def loop(q, ek, ev, _bi=bi):
            def body(i, acc):
                out = pa.grouped_cross_attention(
                    q + acc, ek, ev, None, groups=BATCH, n_heads=HEADS,
                    block_items=_bi, interpret=INTERPRET)
                return acc + out[0, 0]
            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), DT))

        t = amortized(loop, q, ek, ev)
        report(f"cross T=49 block_items={bi}", t, model_bytes)


def main():
    print(f"rows={ROWS} D={HID} P={P_CACHE} iters={ITERS} "
          f"(per-layer figures; char step = 6 layers)")
    # tip: canon c=112, phase budget pe=128, pos=120
    c_tip = max(8, ((LEN - 16) // 8) * 8)
    pe_tip = P_CACHE - 8 if P_CACHE - 8 > c_tip else P_CACHE
    legs = [
        (functools.partial(sweep_canon, c_tip, pe_tip,
                           pos=min(LEN - 8, pe_tip - 1)), "canon tip"),
        # mid: c=48, pe=72, pos=60
        (functools.partial(
            sweep_canon, max(8, ((LEN // 2 - 16) // 8) * 8),
            min(P_CACHE, max(8, ((LEN // 2 - 16) // 8) * 8) + 24),
            pos=max(8, ((LEN // 2 - 16) // 8) * 8) + 12), "canon mid"),
        (functools.partial(sweep_full, pe_tip,
                           pos=min(LEN - 8, pe_tip - 1)), "full"),
        (sweep_cross, "cross"),
    ]
    for fn, name in legs:
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — keep the other legs' data
            print(f"{name} leg FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()

"""Hardware validation + microbench of the canonical-prefix kernels.

1. ancestry_attention_update_canon (real Mosaic lowering) vs the XLA
   reference at the char serving shape — exactness + cache-write parity.
2. ancestry_attention_ids (scalar-prefetch indirection) vs full-width
   ancestry_attention on the selected items.
3. Amortized per-step timing: full-width update vs canon(+ids straggler
   recompute) at matched shapes.

Run on the real chip: python benchmarks/canon_validate.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from deephumor_tpu.ops import pallas_attention as pa

ITEMS, BEAM, P, D, HEADS = 448, 7, 136, 512, 8
C, PE = 96, 120
ROWS = ITEMS * BEAM
DT = jnp.bfloat16


def timeit(fn, state, iters=300):
    @jax.jit
    def loop(state):
        def body(_, st):
            return fn(st)
        return jax.lax.fori_loop(0, iters, body, state)

    jax.block_until_ready(loop(state))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(state))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(ROWS, D)), DT)
    k = jnp.asarray(rng.normal(size=(ROWS, P, D)), DT)
    v = jnp.asarray(rng.normal(size=(ROWS, P, D)), DT)
    k_new = jnp.asarray(rng.normal(size=(ROWS, D)), DT)
    v_new = jnp.asarray(rng.normal(size=(ROWS, D)), DT)
    pos = PE - 2

    path = rng.integers(0, BEAM, size=(ITEMS, P)).astype(np.int32)
    anc = np.broadcast_to(path[:, None, :], (ITEMS, BEAM, P)).copy()
    anc[:, :, C:] = rng.integers(0, BEAM, size=(ITEMS, BEAM, P - C))
    strag = rng.choice(ITEMS, size=ITEMS // 5, replace=False)
    for b in strag:
        anc[b] = rng.integers(0, BEAM, size=(BEAM, P))
    valid = np.zeros((ROWS, P), bool)
    valid[:, :pos + 1] = True
    anc_j, valid_j = jnp.asarray(anc), jnp.asarray(valid)

    shared_k = np.zeros((ITEMS, P, D), np.float32)
    shared_v = np.zeros((ITEMS, P, D), np.float32)
    kn, vn = np.asarray(k, np.float32), np.asarray(v, np.float32)
    rows_idx = (np.arange(ITEMS)[:, None] * BEAM + anc[:, 0, :C])
    pos_idx = np.arange(C)[None, :]
    shared_k[:, :C] = kn[rows_idx, pos_idx]
    shared_v[:, :C] = vn[rows_idx, pos_idx]
    shared_k = jnp.asarray(shared_k, DT)
    shared_v = jnp.asarray(shared_v, DT)

    bias_full = pa.ancestry_bias(anc_j, valid_j, P)
    w = PE - C
    bias_sh = jnp.where(valid_j.reshape(ITEMS, BEAM, P)[:, :1, :C],
                        0.0, -1e8).astype(jnp.float32)
    bias_win = pa.ancestry_bias(
        anc_j[:, :, C:PE],
        valid_j.reshape(ITEMS, BEAM, P)[:, :, C:PE].reshape(ROWS, w), w)

    # --- correctness: canon vs reference ---
    got, gk, gv = pa.ancestry_attention_update_canon(
        q, k, v, shared_k, shared_v, k_new, v_new, bias_sh, bias_win,
        pos, beam=BEAM, n_heads=HEADS, c=C, p_eff=PE)
    ref = pa._canon_attention_reference(
        q, jax.lax.dynamic_update_slice_in_dim(
            k, k_new[:, None, :].astype(DT), pos, axis=1),
        jax.lax.dynamic_update_slice_in_dim(
            v, v_new[:, None, :].astype(DT), pos, axis=1),
        shared_k, shared_v, bias_sh, bias_win,
        beam=BEAM, n_heads=HEADS, c=C, p_eff=PE)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    kerr = float(jnp.max(jnp.abs(
        gk[:, pos].astype(jnp.float32) - k_new.astype(DT).astype(jnp.float32))))
    untouched = float(jnp.max(jnp.abs(
        gk[:, :pos].astype(jnp.float32) - k[:, :pos].astype(jnp.float32))))
    print(f"canon kernel max|err| vs reference: {err:.5f} "
          f"(bf16; cache col err {kerr}, untouched {untouched})")
    assert err < 0.05 and kerr == 0.0 and untouched == 0.0

    # --- correctness: ids kernel vs full-width on selected items ---
    ids = np.full(ITEMS, 0, np.int32)
    ids[:len(strag)] = np.sort(strag)
    out_ids = pa.ancestry_attention_ids(
        q, gk, gv, pa.ancestry_bias(
            anc_j, jnp.asarray(valid).at[:, pos].set(True), P),
        jnp.asarray(ids), jnp.int32(len(strag)), beam=BEAM, n_heads=HEADS,
        p_eff=PE)
    full = pa.ancestry_attention(
        q, gk, gv, pa.ancestry_bias(
            anc_j, jnp.asarray(valid).at[:, pos].set(True), P),
        beam=BEAM, n_heads=HEADS, p_eff=PE, block_items=8)
    oi = np.asarray(out_ids.astype(jnp.float32)).reshape(ITEMS, BEAM, D)
    fl = np.asarray(full.astype(jnp.float32)).reshape(ITEMS, BEAM, D)
    ierr = np.max(np.abs(oi[np.sort(strag)] - fl[np.sort(strag)]))
    print(f"ids kernel max|err| on selected items: {ierr:.5f}")
    assert ierr < 0.05

    # --- timing ---
    posj = jnp.int32(pos)

    def full_step(st):
        o, ck, cv = pa.ancestry_attention_update(
            q, st[0], st[1], k_new, v_new, bias_full, posj,
            beam=BEAM, n_heads=HEADS, p_eff=PE)
        return (ck, cv)

    def canon_step(st):
        ck0, cv0, acc = st
        o, ck, cv = pa.ancestry_attention_update_canon(
            q, ck0, cv0, shared_k, shared_v, k_new, v_new,
            bias_sh, bias_win, posj, beam=BEAM, n_heads=HEADS, c=C,
            p_eff=PE)
        o2 = pa.ancestry_attention_ids(
            q, ck, cv, bias_full, jnp.asarray(ids),
            jnp.int32(len(strag)), beam=BEAM, n_heads=HEADS, p_eff=PE)
        # the ids kernel has no side effects and its output must feed the
        # carry, or XLA dead-code-eliminates the whole straggler recompute
        # from the timed loop (the canon/full update kernels survive via
        # their aliased cache outputs + has_side_effects)
        return (ck, cv, acc + o2[0, 0].astype(jnp.float32))

    t_full = timeit(full_step, (k, v))
    t_canon = timeit(canon_step, (k, v, jnp.float32(0)))
    print(f"full-width update: {t_full:.3f} ms/step")
    print(f"canon+ids (20% stragglers): {t_canon:.3f} ms/step "
          f"({t_full / t_canon:.2f}x)")


if __name__ == "__main__":
    main()

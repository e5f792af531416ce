"""Per-component ledger of the CHAR serving config (real chip).

Times, amortized inside jitted fori_loops (axon dispatch is ~25 ms, so
per-call timing lies — see attn_microbench.py):

  1. decoder step_fn at the cache TIP (pos=120, full read budget),
     full-width vs canon (+ids) vs canon (no ids),
  2. decoder step_fn mid-run (pos=60, p_eff=72), same three ways,
  3. the beam engine WITHOUT the decoder: a fake step returns a
     precomputed hidden state, so the loop measures sampler + survivor
     bookkeeping + sequence/ancestry updates only,
  4. boundary costs: one _canonicalize_state and one _compact_state call
     at the full char shape (multiply by ~16 boundaries / ~5 points).

Run: python -m benchmarks.char_ledger
"""

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

SMOKE = os.environ.get("DH_LEDGER_SMOKE") == "1"
if SMOKE:
    # the axon sitecustomize overrides JAX_PLATFORMS=cpu from the
    # environment; force the CPU backend via config before first use —
    # and before importing deephumor_tpu, whose persistent-compile-cache
    # gate reads the effective platform at import time.
    jax.config.update("jax_platforms", "cpu")

from deephumor_tpu.models import CaptioningTransformer
from deephumor_tpu.models.caption_models import _tile_tree

VOCAB, LEN, BEAM, TOPK = 128, 128, 7, 50
# batch 768 = the round-4 sweep's plateau peak (docs/CHAR_PERF.md);
# override for historical comparisons with DH_LEDGER_BATCH=256
BATCH = int(os.environ.get("DH_LEDGER_BATCH", 768))
HID, LAYERS, HEADS, PF = 512, 6, 8, 2048
ITERS = 100
ATTN = "pallas"
SAMPLER = "pallas"

# DH_LEDGER_SMOKE=1: tiny shapes + interpreted kernels, CPU-runnable —
# validates the script's plumbing before a hardware window (timings are
# meaningless). The pallas sampler has no interpret path through the
# engine, so the engine leg uses the exact sampler under smoke.
if SMOKE:
    LEN, BEAM, TOPK, BATCH = 32, 3, 16, 8
    HID, LAYERS, HEADS, PF = 64, 2, 2, 128
    ITERS = 2
    ATTN = "pallas_interpret"
    SAMPLER = "exact"

ROWS = BATCH * BEAM

# probe positions, derived from LEN (at LEN=128 these reproduce the
# figures the docstring cites: tip pos=120/c=112, mid pos=60/pe=72/c=48,
# compact pe=64)
POS_TIP = LEN - 8
C_TIP = max(8, LEN - 16)
POS_MID = max(8, LEN // 2 - 4)
PE_MID = ((POS_MID + 12 + 7) // 8) * 8
C_MID = max(8, ((POS_MID - 12) // 8) * 8)
PE_COMPACT = ((POS_MID + 4 + 7) // 8) * 8


def amortized(loop, *args, iters=ITERS):
    out = loop(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    out = loop(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters


def step_loop(step, state, tokens):
    @jax.jit
    def loop(state, tokens):
        def body(_, carry):
            st, tok = carry
            logits, st2 = step(st, tok)
            st2 = dict(st2, pos=st["pos"])  # hold position fixed
            return (st2, tok)
        return jax.lax.fori_loop(0, ITERS, body, (state, tokens))
    return amortized(loop, state, tokens)


def main():
    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=HID, n_layers=LAYERS, n_heads=HEADS,
        pf_dim=PF, max_len=LEN + 2, compute_dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    start = jnp.asarray(rng.normal(size=(BATCH, HID)).astype(np.float32))
    spatial = jnp.asarray(
        rng.normal(size=(BATCH, 49, HID)).astype(np.float32))

    dt = jnp.bfloat16
    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, t)
    p = cast(params)
    enc = (start.astype(dt), spatial.astype(dt))
    max_positions = LEN + 1
    p_cache = -(-max_positions // 8) * 8
    @jax.jit
    def prefill():
        # NOTE: must run under jit — eagerly this is hundreds of op
        # dispatches over the axon tunnel (~25 ms each)
        logits0, state0, consts = model._prefill_and_state(
            p, enc, None, max_positions)
        return logits0, _tile_tree(state0, BEAM), consts

    logits0, state0, consts = prefill()

    tokens = jnp.asarray(rng.integers(6, VOCAB, size=(ROWS,)), jnp.int32)

    def at_pos(pos, c):
        """State at decode position ``pos`` with ancestry coalesced
        below ``c`` (random beyond), all branches live."""
        st = dict(state0)
        path = rng.integers(0, BEAM, size=(BATCH, 1, max_positions))
        anc = np.broadcast_to(path, (BATCH, BEAM, max_positions)).copy()
        anc[:, :, c:] = rng.integers(
            0, BEAM, size=(BATCH, BEAM, max_positions - c))
        st["anc"] = jnp.asarray(anc, jnp.int32)
        valid = np.zeros((ROWS, max_positions), bool)
        valid[:, :pos] = True
        st["valid"] = jnp.asarray(valid)
        st["pos"] = jnp.full((ROWS,), pos, jnp.int32)
        return st

    results = {}

    def bench_step(name, pos, pe, c, canon, no_ids=False):
        st = at_pos(pos, c if canon else 8)
        if canon:
            @jax.jit
            def _canon(st):
                ended = jnp.zeros((BATCH, BEAM), bool)
                s2, _, _, _ = model._canonicalize_state(
                    st, None, None, ended, c=c)
                return s2
            st = _canon(st)
        # the probe knob is read at import (see transformer._CANON_NO_IDS);
        # this ledger builds fresh (unjitted-engine) steps per variant, so
        # monkeypatching the module constant is trace-safe here
        from deephumor_tpu.models import transformer as _tfm
        _tfm._CANON_NO_IDS = bool(no_ids)
        try:
            step = model._make_step(
                p, consts, ATTN, p_eff=pe, return_hidden=True,
                canon_c=c if canon else None)
            t = step_loop(step, st, tokens)
        finally:
            _tfm._CANON_NO_IDS = False
        results[name] = t
        print(f"{name:44s} {t*1e3:7.3f} ms", flush=True)

    bench_step(f"step tip (pos={POS_TIP}, pe={p_cache}) full-width",
               POS_TIP, None, C_TIP, False)
    bench_step(f"step tip canon c={C_TIP} (+ids)", POS_TIP, None, C_TIP,
               True)
    bench_step(f"step tip canon c={C_TIP} (no ids)", POS_TIP, None,
               C_TIP, True, no_ids=True)
    bench_step(f"step mid (pos={POS_MID}, pe={PE_MID}) full-width",
               POS_MID, PE_MID, C_MID, False)
    bench_step(f"step mid canon c={C_MID} (+ids)", POS_MID, PE_MID,
               C_MID, True)
    bench_step(f"step mid canon c={C_MID} (no ids)", POS_MID, PE_MID,
               C_MID, True, no_ids=True)

    # ---- engine-without-decoder ----
    from deephumor_tpu.models.sampling import beam_search
    hidden = jnp.asarray(rng.normal(size=(ROWS, HID)), dt)
    st = at_pos(1, 8)
    st["live"] = jnp.int32(BATCH)
    st["item_perm"] = jnp.arange(BATCH, dtype=jnp.int32)

    cls = params["decoder"]["classifier"]
    classifier = (cast(cls["kernel"]), cast(cls["bias"]))

    # state/hidden/logits0 MUST be jit arguments, not closure captures:
    # captured they become executable constants (~3 GB: the tiled KV
    # caches), which the remote (axon) tunnel re-ships at compile —
    # measured to stall this leg for 10+ minutes.
    @jax.jit
    def engine(key, st, hidden, logits0):
        def fake_step(state, tok):
            return hidden * state["pos"][0].astype(dt), dict(
                state, pos=state["pos"] + 1)

        return beam_search(
            key, fake_step, st, logits0, beam_size=BEAM, top_k=TOPK,
            temperature=1.1, max_len=LEN, sampler=SAMPLER,
            shuffle_fn=model._shuffle_state, classifier=classifier,
            live_fn=lambda s: s.get("live"))

    out = engine(jax.random.PRNGKey(1), st, hidden, logits0)
    np.asarray(out["chosen"])
    t0 = time.perf_counter()
    out = engine(jax.random.PRNGKey(2), st, hidden, logits0)
    np.asarray(out["chosen"])
    t_eng = (time.perf_counter() - t0) / (LEN - 1)
    print(f"{'engine w/o decoder (sampler+bookkeeping)':44s} "
          f"{t_eng*1e3:7.3f} ms/step", flush=True)

    # ---- boundary costs ----
    st = at_pos(POS_MID, C_MID)
    ended = jnp.zeros((BATCH, BEAM), bool)
    seq = jnp.zeros((BATCH, BEAM, LEN), jnp.int32)
    val = jnp.zeros((BATCH, BEAM), jnp.float32)

    @jax.jit
    def canonize(st):
        s2, _, _, _ = model._canonicalize_state(st, seq, val, ended,
                                                c=C_MID)
        return s2["shared"][0]["sk"]

    @jax.jit
    def compact(st):
        st = dict(st, live=jnp.int32(BATCH),
                  item_perm=jnp.arange(BATCH, dtype=jnp.int32),
                  cross=consts["cross"],
                  enc_key_mask=consts["enc_key_mask"])
        s2, _, _, _ = model._compact_state(
            st, seq, val, ended, prefix_positions=PE_COMPACT)
        return s2["cache"][0]["k"]

    for name, fn in ((f"canonicalize boundary (c={C_MID})", canonize),
                     (f"compaction boundary (pe={PE_COMPACT})", compact)):
        out = fn(st)
        np.asarray(out).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(st)
        np.asarray(out).ravel()[0]
        print(f"{name:44s} {(time.perf_counter()-t0)/5*1e3:7.3f} ms",
              flush=True)

    # ---- summary ----
    full = results[f"step tip (pos={POS_TIP}, pe={p_cache}) full-width"]
    canon = results[f"step tip canon c={C_TIP} (+ids)"]
    print(f"\ntip step speedup canon/full: {full/canon:.2f}x; engine "
          f"residual {t_eng*1e3:.3f} ms/step rides every config")


if __name__ == "__main__":
    main()

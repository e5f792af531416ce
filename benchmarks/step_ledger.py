"""Per-step ledger of the serving decode loop at the bench shape.

Times, amortized inside one jitted fori_loop (see attn_microbench.py for
why): the decoder step_fn alone, the fused sampler alone, and the full
generation (per-step average derived from total/steps). The difference
between step total and (decoder + sampler) is engine bookkeeping
(survivor select, sequence/ancestry reorder, logits handoff).
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from deephumor_tpu.models import CaptioningTransformer
from deephumor_tpu.ops.pallas_sampler import fused_topk_gumbel_sample

import os

# defaults = the WORD headline config (bench.py); override via env for
# the historical small-vocab shape (DH_LEDGER_VOCAB=8192 DH_LEDGER_BATCH=224)
VOCAB = int(os.environ.get("DH_LEDGER_VOCAB", 29184))
BATCH = int(os.environ.get("DH_LEDGER_BATCH", 896))
HID, LAYERS, HEADS, PF = 512, 6, 8, 2048
BEAM, MAX_LEN, TOP_K = 5, 32, 64
ROWS = BATCH * BEAM


def amortized(loop, iters):
    out = loop()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    out = loop()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=HID, n_layers=LAYERS, n_heads=HEADS,
        pf_dim=PF, max_len=MAX_LEN + 2, compute_dtype="bfloat16",
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    start_emb = jnp.asarray(rng.normal(size=(BATCH, HID)).astype(np.float32))
    spatial = jnp.asarray(rng.normal(size=(BATCH, 49, HID)).astype(np.float32))

    # ---- full generation / derived per-step ----
    def run(k):
        return model.generate_from_emb(
            params, (start_emb, spatial), key=k, max_len=MAX_LEN,
            beam_size=BEAM, top_k=TOP_K, temperature=1.0, sampler="pallas",
        )

    out = run(jax.random.PRNGKey(1))
    np.asarray(out["chosen"])
    t0 = time.perf_counter()
    for i in range(5):
        out = run(jax.random.PRNGKey(2 + i))
    np.asarray(out["chosen"])
    total = (time.perf_counter() - t0) / 5
    # steps actually run: stochastic EOS, assume full 31 scan steps + init
    print(f"full generation: {total*1e3:8.2f} ms/batch "
          f"-> {BATCH*5/(total*5):.0f} captions/s")
    print(f"  per decode step (/{MAX_LEN-1} steps): {total/ (MAX_LEN-1)*1e3:6.3f} ms (upper bound incl prefill)")

    # ---- decoder step_fn alone ----
    from deephumor_tpu.models import transformer as tfm
    import deephumor_tpu.models.layers as L
    import math

    dt = jnp.bfloat16
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, t)
    p = cast(params)
    enc = (start_emb.astype(dt), spatial.astype(dt))
    max_positions = MAX_LEN + 1
    logits0, state, consts = model._prefill_and_state(
        p, enc, None, max_positions)
    from deephumor_tpu.models.caption_models import _tile_tree
    state = _tile_tree(state, BEAM)
    state["anc"] = jnp.broadcast_to(
        jnp.arange(BEAM, dtype=jnp.int32)[None, :, None],
        (BATCH, BEAM, max_positions)).copy()
    tokens = jnp.asarray(rng.integers(6, VOCAB, size=(ROWS,)), jnp.int32)

    iters = 200

    # params/consts must be jit ARGUMENTS, not closure constants: at
    # V=29184 the captured weights blow past the axon remote-compile
    # request-body limit (HTTP 413)
    @jax.jit
    def dec_loop(p, consts, state, tokens):
        step = model._make_step(p, consts, attn="pallas")

        def body(_, carry):
            st, tok = carry
            logits, st2 = step(st, tok)
            st2 = dict(st2, pos=st["pos"])  # hold position fixed
            return (st2, tok)
        return jax.lax.fori_loop(0, iters, body, (state, tokens))

    t = amortized(lambda: dec_loop(p, consts, state, tokens), iters)
    print(f"decoder step_fn (6L, cross, pallas): {t*1e3:6.3f} ms")

    # ---- sampler alone ----
    logits = jnp.asarray(rng.normal(size=(ROWS, VOCAB)), dt)

    @jax.jit
    def samp_loop(logits):
        def body(i, acc):
            ids, vals = fused_topk_gumbel_sample(
                logits, i, jnp.float32(1.0), top_k=TOP_K, num_draws=BEAM)
            return acc + vals[0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    t = amortized(lambda: samp_loop(logits), iters)
    print(f"pallas sampler [{ROWS}, {VOCAB}]:         {t*1e3:6.3f} ms")

    # classifier matmul for scale: [1120, 512] x [512, 8192]
    x = jnp.asarray(rng.normal(size=(ROWS, HID)), dt)
    wcls = jnp.asarray(rng.normal(size=(HID, VOCAB)), dt)

    @jax.jit
    def cls_loop(x, w):
        def body(_, acc):
            # chain the carry into the input so while-loop LICM cannot
            # hoist the (loop-invariant) matmul, and consume the FULL
            # product — slicing [0,0] lets XLA rewrite slice(dot) ->
            # dot(slice) and time a single dot-product instead
            y = x + acc.astype(dt)
            return jnp.sum((y @ w).astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    t = amortized(lambda: cls_loop(x, wcls), iters)
    print(f"classifier matmul:                   {t*1e3:6.3f} ms")


if __name__ == "__main__":
    main()

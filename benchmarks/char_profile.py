"""Trace the char decode step on hardware and aggregate op self-times.

The block sweep (canon_block_sweep.py) showed the canon kernel at ~219
GB/s vs the full-width kernel's ~424 GB/s — isolation numbers, but the
2x efficiency gap needs a real trace to attribute (DMA stalls vs issue
rate vs MXU padding). This traces ITERS steps of the tip-canon step
inside one jit (plus the engine-without-decoder loop), then parses the
profiler's trace.json.gz and prints the top ops by total self time.

Measured (step mode, 2026-08-19): in-situ the canon kernel runs at ~711
GB/s — near peak, nothing like the isolated 219 GB/s (the isolated loop
serializes on the cache carry; in the real step the next layer's DMA
overlaps the previous layer's FFN). Per step: 6x canon kernel = 1.31 ms
(60%), cross ~0.25 ms, everything else ~0.6 ms.

Run: python -m benchmarks.char_profile [outdir]
     python -m benchmarks.char_profile --full [outdir]   # whole
        generate_from_emb run (canon on): attributes the engine
        residual (sampler kernel vs XLA bookkeeping glue) op by op.
"""

import glob
import gzip
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp


def aggregate_trace(logdir, top=25):
    """Sums durations per op name across the TensorBoard trace events."""
    paths = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        print(f"no trace files under {logdir}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # keep only device-lane complete events (phase X with a duration)
    totals, counts = {}, {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0) + e["dur"]
        counts[name] = counts.get(name, 0) + 1
    print(f"trace: {path}")
    print(f"{'op':70s} {'total_ms':>9s} {'n':>6s}")
    for name in sorted(totals, key=totals.get, reverse=True)[:top]:
        print(f"{name[:70]:70s} {totals[name]/1e3:9.3f} {counts[name]:6d}")


def profile_full_generation(outdir):
    """Traces one whole generate_from_emb run at the char config."""
    from benchmarks.char_ledger import (
        BATCH, BEAM, HEADS, HID, LAYERS, LEN, PF, TOPK, VOCAB,
    )
    from deephumor_tpu.models import CaptioningTransformer

    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=HID, n_layers=LAYERS, n_heads=HEADS,
        pf_dim=PF, max_len=LEN + 2, compute_dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    start = jnp.asarray(rng.normal(size=(BATCH, HID)).astype(np.float32))
    spatial = jnp.asarray(
        rng.normal(size=(BATCH, 49, HID)).astype(np.float32))

    def run(k):
        return model.generate_from_emb(
            params, (start, spatial), key=k, max_len=LEN, beam_size=BEAM,
            top_k=TOPK, temperature=1.1, sampler="pallas", canon=True)

    np.asarray(run(jax.random.PRNGKey(1))["chosen"])  # compile + warm
    with jax.profiler.trace(outdir):
        np.asarray(run(jax.random.PRNGKey(2))["chosen"])
    aggregate_trace(outdir, top=45)
    print(f"\n(window = one {LEN}-step generation at batch {BATCH}; "
          f"divide by {LEN - 1} for per-step)")


def main():
    args = [a for a in sys.argv[1:] if a != "--full"]
    full = "--full" in sys.argv[1:]
    outdir = args[0] if args else "/tmp/char_profile"
    os.makedirs(outdir, exist_ok=True)
    if full:
        profile_full_generation(outdir)
        return

    from benchmarks.char_ledger import (
        BATCH, BEAM, HEADS, HID, LAYERS, LEN, PF, VOCAB,
    )
    from deephumor_tpu.models import CaptioningTransformer
    from deephumor_tpu.models.caption_models import _tile_tree

    ITERS = 20
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
        logits0, state0, consts = model._prefill_and_state(
            p, enc, None, max_positions)
        return logits0, _tile_tree(state0, BEAM), consts

    logits0, state0, consts = prefill()
    rows = BATCH * BEAM
    tokens = jnp.asarray(rng.integers(6, VOCAB, size=(rows,)), jnp.int32)

    # tip canon state (mirrors char_ledger.at_pos + canonicalize)
    pos, c, pe = LEN - 8, max(8, LEN - 16), p_cache - 8
    st = dict(state0)
    path = rng.integers(0, BEAM, size=(BATCH, 1, max_positions))
    anc = np.broadcast_to(path, (BATCH, BEAM, max_positions)).copy()
    anc[:, :, c:] = rng.integers(0, BEAM,
                                 size=(BATCH, BEAM, max_positions - c))
    st["anc"] = jnp.asarray(anc, jnp.int32)
    valid = np.zeros((rows, max_positions), bool)
    valid[:, :pos] = True
    st["valid"] = jnp.asarray(valid)
    st["pos"] = jnp.full((rows,), pos, jnp.int32)

    @jax.jit
    def _canon(st):
        ended = jnp.zeros((BATCH, BEAM), bool)
        s2, _, _, _ = model._canonicalize_state(st, None, None, ended, c=c)
        return s2

    st = _canon(st)
    step = model._make_step(p, consts, "pallas", p_eff=pe,
                            return_hidden=True, canon_c=c)

    @jax.jit
    def loop(state, tokens):
        def body(_, carry):
            stt, tok = carry
            h, st2 = step(stt, tok)
            st2 = dict(st2, pos=stt["pos"])
            return (st2, tok)
        return jax.lax.fori_loop(0, ITERS, body, (state, tokens))

    out = loop(st, tokens)  # compile outside the trace
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    with jax.profiler.trace(outdir):
        out = loop(st, tokens)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    aggregate_trace(outdir)
    print(f"\n(total window = {ITERS} steps; divide totals by {ITERS} "
          f"for per-step)")


if __name__ == "__main__":
    main()

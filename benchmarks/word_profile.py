"""Trace the WORD-config decode on hardware; op-family attribution.

VERDICT r3 #4: the word headline (V=29184, batch=896, beam=5, len=32,
top_k=64, bf16, pallas attention+sampler) plateaued at ~2830 capt/s for
two rounds with no measured attribution of the ~0.35 ms/caption step.
This is the char_profile.py treatment at the headline config: trace one
full ``generate_from_emb`` run inside the profiler, aggregate device op
self-times into families (attention kernels / sampler / classifier /
engine bookkeeping / XLA glue), and print per-step costs + in-situ GB/s
for the attention kernel. Results feed docs/WORD_PERF.md.

Run: python -m benchmarks.word_profile [outdir]
     python -m benchmarks.word_profile --batch 1792 [outdir]
"""

import glob
import gzip
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

VOCAB, HID, LAYERS, HEADS, PF = 29184, 512, 6, 8, 2048
BEAM, MAX_LEN, TOPK = 5, 32, 64
EOS_BIAS = 1.5  # bench.py's length shaping


def family(name):
    n = name.lower()
    if "ancestry" in n or "attention_update" in n or "attn" in n and \
            "pallas" in n:
        return "attention kernels (pallas)"
    if "grouped_cross" in n or "cross_attention" in n:
        return "cross-attention kernels"
    if "gumbel" in n or "sampler" in n or "topk" in n or "top_k" in n:
        return "sampler kernel"
    if "fusion" in n:
        return "XLA fusions (glue + matmuls)"
    if "copy" in n or "reshape" in n or "transpose" in n or \
            "bitcast" in n or "convert" in n:
        return "layout/copies"
    if "dot" in n or "conv" in n:
        return "XLA dots"
    if "dynamic-update" in n or "dynamic_update" in n or "scatter" in n:
        return "cache/seq updates"
    if "gather" in n or "select" in n or "iota" in n or "compare" in n:
        return "gathers/selects"
    if "rng" in n or "threefry" in n:
        return "rng"
    return "other"


def aggregate(logdir, steps, top=40):
    """Device-lane-only op attribution.

    The raw trace mixes host python lanes, device region events (the
    ``while``/``jit_fn`` envelopes, which CONTAIN their child ops) and
    the per-HLO device ops. Summing everything double-counts and buries
    the device time under host profiler overhead (the first run of this
    script did exactly that). The per-HLO leaf events live on threads
    the TPU profiler names "XLA Ops" — keep only those."""
    paths = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        print(f"no trace files under {logdir}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    op_tids = set()  # (pid, tid) of "XLA Ops" lanes
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" and \
                "XLA Ops" in str(e.get("args", {}).get("name", "")):
            op_tids.add((e.get("pid"), e.get("tid")))
    if not op_tids:
        print("WARNING: no 'XLA Ops' lanes in trace; falling back to "
              "all X events (attribution will double-count regions)")
    totals, counts, fams = {}, {}, {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if op_tids and (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "?")
        # while/region envelopes CONTAIN their child op events on the
        # same lane — summing both double-counts (children here sum to
        # the module wall; the envelopes alone were ~96% of it again)
        if name.startswith(("while", "jit_", "body", "condition")):
            continue
        totals[name] = totals.get(name, 0) + e["dur"]
        counts[name] = counts.get(name, 0) + 1
    device_total = sum(totals.values())
    print(f"trace: {path}")
    print(f"device op time total: {device_total/1e3:.1f} ms "
          f"({device_total/steps:.0f} us/step over {steps} steps)\n")
    print(f"{'op':64s} {'total_ms':>9s} {'per_step_us':>12s} {'n':>6s}")
    for name in sorted(totals, key=totals.get, reverse=True)[:top]:
        print(f"{name[:64]:64s} {totals[name]/1e3:9.3f} "
              f"{totals[name]/steps:12.1f} {counts[name]:6d}")
    for name, t in totals.items():  # families over ALL ops, not top-N
        fams[family(name)] = fams.get(family(name), 0) + t
    print("\n-- families (all device ops) --")
    for fam in sorted(fams, key=fams.get, reverse=True):
        print(f"{fam:42s} {fams[fam]/1e3:9.3f} ms "
              f"({fams[fam]/steps:8.1f} us/step, "
              f"{100*fams[fam]/max(device_total,1):4.1f}%)")
    return totals, device_total


def main():
    args = sys.argv[1:]
    batch = 896
    if "--batch" in args:
        i = args.index("--batch")
        batch = int(args[i + 1])
        del args[i:i + 2]
    outdir = args[0] if args else "/tmp/word_profile"
    os.makedirs(outdir, exist_ok=True)

    from deephumor_tpu.models import CaptioningTransformer

    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=HID, n_layers=LAYERS, n_heads=HEADS,
        pf_dim=PF, max_len=MAX_LEN + 2, compute_dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0))
    cls = dict(params["decoder"]["classifier"])
    cls["bias"] = cls["bias"].at[3].set(EOS_BIAS)
    params["decoder"] = dict(params["decoder"], classifier=cls)
    rng = np.random.default_rng(0)
    start = jnp.asarray(rng.normal(size=(batch, HID)).astype(np.float32))
    spatial = jnp.asarray(
        rng.normal(size=(batch, 49, HID)).astype(np.float32))

    def run(k):
        return model.generate_from_emb(
            params, (start, spatial), key=k, max_len=MAX_LEN,
            beam_size=BEAM, top_k=TOPK, temperature=1.0, sampler="pallas")

    import time

    np.asarray(run(jax.random.PRNGKey(1))["chosen"])  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(jax.random.PRNGKey(2))["chosen"])
    wall = time.perf_counter() - t0
    print(f"batch={batch}: {wall*1e3:.1f} ms/call wall "
          f"-> {batch/wall:.0f} captions/s (single call, tunnel incl.)")
    with jax.profiler.trace(outdir):
        np.asarray(run(jax.random.PRNGKey(3))["chosen"])
    aggregate(outdir, steps=MAX_LEN - 1)
    print(f"\n(window = one {MAX_LEN}-token generation at batch {batch}; "
          f"{MAX_LEN - 1} decode steps)")


if __name__ == "__main__":
    main()

"""Serving latency under concurrent open-loop load (VERDICT r2 #4).

The round-2 ``p50_latency_ms`` bench line is amortized (a jitted
fori_loop of generations divided by count) — it says nothing about
queueing. This benchmark drives :class:`deephumor_tpu.serving.
DynamicBatcher` the way a real endpoint is loaded:

- **open loop**: request arrival times are a Poisson process drawn ahead
  of time; the submitter fires at those wall-clock times regardless of
  completions (so when the server falls behind, queueing delay is
  *measured*, not hidden by client backpressure the way a closed loop
  would).
- latency for each request = completion time minus its *scheduled*
  arrival (submitter scheduling slip counts against the server too).
- three arrival rates, fractions of the measured single-batch capacity
  (``max_batch / t_batch``), report p50/p99 and the dispatched
  batch-size distribution per rate.

Reference counterpart: none (the reference serves from a notebook one
meme at a time, deephumor_demo.ipynb cell 35). BASELINE.md's "p50
per-meme latency" is the anchored metric; this gives it an honest
under-load definition.

Run standalone::

    python -m benchmarks.serving_load          # real TPU
    DH_LOAD_SMOKE=1 python -m benchmarks.serving_load   # tiny CPU smoke
    # composed MULTI-CHIP serving stack (pipeline mesh + dp_generate +
    # batcher) under load — on the virtual 8-device CPU mesh:
    DH_LOAD_SMOKE=1 DH_LOAD_MESH=1 python -m benchmarks.serving_load

or from bench.py via :func:`measure_serving_load`.
"""

import json
import os
import threading
import time

import numpy as np

SMOKE = os.environ.get("DH_LOAD_SMOKE") == "1"
if SMOKE:
    # the axon sitecustomize overrides JAX_PLATFORMS=cpu from the
    # environment; force the CPU backend via config before first use —
    # and before importing deephumor_tpu, whose persistent-compile-cache
    # gate reads the effective platform at import time.
    import jax

    jax.config.update("jax_platforms", "cpu")


def _percentiles(xs, ps=(50, 99)):
    arr = np.asarray(xs, dtype=np.float64)
    return {f"p{p}": float(np.percentile(arr, p)) for p in ps}


def _batch_hist(sizes):
    """Compact batch-size distribution: min/p50/max + mean."""
    if not sizes:
        return {}
    arr = np.asarray(sizes)
    return {
        "n_batches": int(arr.size),
        "min": int(arr.min()),
        "p50": int(np.percentile(arr, 50)),
        "max": int(arr.max()),
        "mean": float(arr.mean()),
    }


def run_load(batcher, template_ids, rate_rps, duration_s, seed=0):
    """Open-loop Poisson load at ``rate_rps`` for ``duration_s``.

    Returns a dict with latency percentiles (ms), achieved rate, and the
    batch-size distribution over the window.
    """
    rng = np.random.default_rng(seed)
    n_est = max(4, int(rate_rps * duration_s * 1.25) + 8)
    arrivals = np.cumsum(rng.exponential(1.0 / rate_rps, size=n_est))
    arrivals = arrivals[arrivals < duration_s]
    if arrivals.size == 0:
        arrivals = np.asarray([0.0])
    tmpl = [template_ids[i % len(template_ids)]
            for i in range(arrivals.size)]

    lat_ms = [None] * arrivals.size
    done = threading.Event()
    remaining = [arrivals.size]
    errors = []  # first recorded failure re-raised after the drain
    lock = threading.Lock()
    size0 = len(batcher.batch_sizes)
    pad0 = len(getattr(batcher, "pad_sizes", []))

    t0 = time.perf_counter()

    def _mk_cb(idx, t_sched):
        def cb(fut):
            # an exception raised INSIDE an add_done_callback is swallowed
            # by concurrent.futures — record it and keep the remaining
            # count honest, or a single failed request would stall the
            # drain into an opaque TimeoutError minutes later
            try:
                fut.result()
                lat_ms[idx] = (time.perf_counter() - t_sched) * 1e3
            except Exception as e:  # noqa: BLE001 — re-raised below
                with lock:
                    errors.append(e)
            finally:
                with lock:
                    remaining[0] -= 1
                    if remaining[0] == 0:
                        done.set()
        return cb

    for i, a in enumerate(arrivals):
        t_sched = t0 + float(a)
        now = time.perf_counter()
        if t_sched > now:
            time.sleep(t_sched - now)
        fut = batcher.submit(tmpl[i])
        fut.add_done_callback(_mk_cb(i, t_sched))

    if not done.wait(timeout=duration_s * 4 + 120):
        raise TimeoutError(
            f"load run did not drain: {remaining[0]} of "
            f"{arrivals.size} requests outstanding")
    if errors:
        raise RuntimeError(
            f"{len(errors)} of {arrivals.size} requests failed during the "
            "load run") from errors[0]
    wall = time.perf_counter() - t0

    out = {
        "offered_rps": float(rate_rps),
        "achieved_rps": round(arrivals.size / wall, 1),
        "n_requests": int(arrivals.size),
        "latency_ms": {k: round(v, 2)
                       for k, v in _percentiles(lat_ms).items()},
        "batch_sizes": _batch_hist(batcher.batch_sizes[size0:]),
    }
    pads = getattr(batcher, "pad_sizes", [])[pad0:]
    if pads:
        out["pad_sizes"] = _batch_hist(pads)
    return out


def measure_serving_load(pipe, template_ids, max_batch=256, max_wait_ms=10.0,
                         duration_s=12.0, fractions=(0.3, 0.6, 0.85),
                         buckets=None, hysteresis=3, **generate_kwargs):
    """Measures single-batch capacity, then runs the open-loop sweep at
    ``fractions`` of it. Returns (per-rate list, capacity_rps)."""
    import jax

    from deephumor_tpu.serving import DynamicBatcher

    with DynamicBatcher(pipe, max_batch=max_batch, max_wait_ms=max_wait_ms,
                        key=jax.random.PRNGKey(7), buckets=buckets,
                        hysteresis=hysteresis, **generate_kwargs) as server:
        # compile every bucket executable out of the measured path, then
        # warm the full-batch path through the server itself
        server.warmup(template_ids[0])
        futs = [server.submit(template_ids[i % len(template_ids)])
                for i in range(max_batch)]
        for f in futs:
            f.result()
        # capacity: one more full batch, timed (compiled + warm)
        t0 = time.perf_counter()
        futs = [server.submit(template_ids[i % len(template_ids)])
                for i in range(max_batch)]
        for f in futs:
            f.result()
        t_batch = time.perf_counter() - t0
        capacity = max_batch / t_batch

        results = []
        for j, frac in enumerate(fractions):
            server.batch_sizes.clear()
            server.pad_sizes.clear()
            r = run_load(server, template_ids, rate_rps=capacity * frac,
                         duration_s=duration_s, seed=100 + j)
            r["capacity_fraction"] = frac
            results.append(r)
    return results, capacity


def _main():
    import jax

    from deephumor_tpu.data import Vocab
    from deephumor_tpu.models import CaptioningTransformer
    from deephumor_tpu.pipeline import MemeGenerationPipeline

    if SMOKE:
        vocab_size, hid, layers, heads, pf = 512, 128, 2, 4, 256
        max_batch, duration, gen = 16, 2.0, dict(
            max_len=8, beam_size=3, top_k=16)
        n_templates = 8
        # auto floors at 16 = max_batch here, which would degenerate to
        # ONE bucket — pin a 2-bucket ladder so the smoke run actually
        # exercises multi-bucket dispatch (mesh mode: ladder steps must
        # be multiples of the 8-device data axis)
        buckets = ([8, 16] if os.environ.get("DH_LOAD_MESH") == "1"
                   else [4, 16])
    else:
        vocab_size, hid, layers, heads, pf = 29184, 512, 6, 8, 2048
        max_batch, duration, gen = 256, 12.0, dict(
            max_len=32, beam_size=5, top_k=64, sampler="pallas")
        n_templates = 300
        buckets = "auto"

    model = CaptioningTransformer(
        num_tokens=vocab_size, hid_dim=hid, n_layers=layers,
        n_heads=heads, pf_dim=pf, max_len=max(50, gen["max_len"] + 2))
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocab([f"w{i}" for i in range(vocab_size - 6)])
    mesh = None
    if os.environ.get("DH_LOAD_MESH") == "1":
        # the composed multi-chip serving stack: feature store
        # row-sharded, decode N-way DP via dp_generate, buckets
        # constrained to the data axis
        from deephumor_tpu.parallel import make_mesh

        mesh = make_mesh(model=1)
        gen = dict(gen, attn="xla") if SMOKE else gen
        print(f"mesh: {dict(mesh.shape)}")
    pipe = MemeGenerationPipeline(model, params, vocab, mesh=mesh)
    rng = np.random.default_rng(0)
    ids = [f"tmpl{i}" for i in range(n_templates)]
    pipe.add_templates(
        ids, rng.normal(size=(n_templates, 224, 224, 3)).astype(np.float32))

    if os.environ.get("DH_LOAD_AB") == "1":
        # same-process hysteresis A/B: one capacity estimate, then at
        # each fraction run hysteresis=3 and hysteresis=0 back to back —
        # identical offered rates, tunnel drift largely cancelled
        from deephumor_tpu.serving import DynamicBatcher

        out = {"arms": {}}
        servers = {}
        for name, h, bk in (("hyst3", 3, buckets), ("raw", 0, buckets),
                            ("padmax", 0, None)):
            servers[name] = DynamicBatcher(
                pipe, max_batch=max_batch, max_wait_ms=10.0,
                key=jax.random.PRNGKey(7), buckets=bk,
                hysteresis=h, **gen)
            servers[name].warmup(ids[0])
            out["arms"][name] = []
        srv0 = servers["hyst3"]
        for _ in range(2):  # warm full-batch path
            futs = [srv0.submit(ids[i % len(ids)])
                    for i in range(max_batch)]
            t0 = time.perf_counter()
            for f in futs:
                f.result()
        capacity = max_batch / (time.perf_counter() - t0)
        out["capacity_rps"] = round(capacity, 1)
        print(f"capacity: {capacity:.0f} rps", flush=True)
        for j, frac in enumerate((0.3, 0.6, 0.85)):
            for name, srv in servers.items():
                srv.batch_sizes.clear()
                srv.pad_sizes.clear()
                r = run_load(srv, ids, rate_rps=capacity * frac,
                             duration_s=duration, seed=100 + j)
                r["capacity_fraction"] = frac
                out["arms"][name].append(r)
                print(f"{name} @{frac}: p50 {r['latency_ms']['p50']} "
                      f"p99 {r['latency_ms']['p99']}", flush=True)
        for srv in servers.values():
            srv.close()
        pipe.close()
        print(json.dumps(out, indent=2))
        return

    results, capacity = measure_serving_load(
        pipe, ids, max_batch=max_batch, duration_s=duration,
        buckets=buckets, **gen)
    pipe.close()
    print(json.dumps({"capacity_rps": round(capacity, 1),
                      "rates": results}, indent=2))


if __name__ == "__main__":
    _main()

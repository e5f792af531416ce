"""Benchmark: the serving + training paths at REALISTIC configs.

Headline metric (BASELINE.md north star): generated captions/sec at
beam=5, len=32 — measured at the REAL memes900k word-vocab scale
(min_df=5 ~= 29k types; reference deephumor_demo.ipynb cell 9), not a
flattering small vocab. Baseline target is 10,000/s aggregate on v5e-8,
i.e. 1,250/s per chip — ``vs_baseline`` reports value / 1250 measured on
the single available chip.

Secondary driver-visible numbers in the same JSON line:
  - word_v8192_captions_s: the round-1 headline config (kernel-perf view),
  - char_captions_s: char-model serving (len=128, beam=7, top_k=50 —
    notebook cells 35/43 defaults; 4 of the 8 reference checkpoints),
  - train_examples_s: trunk-cached jitted train step at the word config,
  - e2e_memes_s: the BASELINE config-5 product path — 300-template sweep,
    encode + batched generate + host-side PIL rendering overlapped
    (spawn process pool across available cores; best-of-3 full sweeps);
    e2e_captions_s is the same sweep without rendering.

Serving design being measured: per-template ResNet features are encoded
once and cached (300 templates, amortized to ~0), and the decoder runs the
whole beam-search token loop inside one jitted while_loop over KV caches,
batched over (memes x beams). The reference has no published numbers and
re-runs a full O(L^2) forward per token per meme on GPU
(transformers.py:547-573).

EOS shaping: random-weight logits essentially never produce EOS inside
the top-64, which would make every caption run to max_len — unrealistic.
The classifier's EOS bias is raised to 1.5, calibrated so the mean
generated caption is ~14 tokens (memes900k captions are filtered to <=31
tokens and average in the low teens). Measured effect on captions/s is
<1% (items rarely have ALL beams end under the reference's stochastic
survivor sampling, so the loop still runs near max_len — see
docs/DIVERGENCES.md on early-exit dynamics); the shaping is kept for
honesty, not effect.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# flagship serving config: word-level CaptioningTransformer
VOCAB = 29184  # memes900k word vocab @ min_df=5 (~29k), lane-padded
VOCAB_SMALL = 8192
HID, LAYERS, HEADS, PF = 512, 6, 8, 2048
BEAM = 5
MAX_LEN = 32
BATCH = 896   # memes per call for the e2e/latency legs (224-2240 swept)
# headline generation batch: the round-5 re-sweep on the final build
# reads 1792 consistently ~2% above 896 (2925.5 vs 2872.8 best,
# 2919.5 vs 2845 median; 2688 rolls off to 2910.3/2879.9) — the
# per-step engine stalls amortize over more rows up to 1792. e2e keeps
# 896 (3000-item sweeps would pad a 1208 tail).
GEN_BATCH = 1792
EOS_BIAS = 1.5  # mean generated length ~14 tokens (see module docstring)
PER_CHIP_TARGET = 10_000 / 8  # BASELINE.json north star / v5e-8 chips

# char serving config (notebook cells 35/43: len=128, beam=7, top_k=50)
CHAR_VOCAB = 128
CHAR_LEN = 128
CHAR_BEAM = 7
CHAR_TOPK = 50
CHAR_BATCH = 768  # swept 256-1024 (benchmarks: 661.7/688.5/691.7/685.9
# capt/s at 256/512/768/1024) — the ~2.3 ms position-independent step
# floor amortizes into a 512-1024 plateau; 768 is its peak


def _finish(x):
    """Forces completion with a host transfer — under the remote (axon)
    platform ``block_until_ready`` returns before the remote execution has
    actually finished, so wall-clock timing must fetch data."""
    return np.asarray(x)


# per-leg {best, median} window throughput, keyed by label — emitted in
# the bench JSON so readers can see how far the peak-window headline sits
# from the typical window (tunnel stalls vs genuine recurring slowdowns)
WINDOW_STATS = {}


def _best_window(run, keys, work_per_call, windows=3, label=None):
    """Split a leg's iteration budget into ``windows`` timed windows and
    return the best window's throughput (work units / s).

    The axon tunnel's host<->device link suffers transient multi-second
    service interruptions: the same train leg measured 222 vs 3658 ex/s
    minutes apart on 2026-08-19. A single timed window folds any such
    stall into the reported number; best-of-N windows (the standard
    min-cost repetition estimator) reports the throughput the chip
    actually sustains while total device work stays the same. Each
    window ends with a host fetch so async dispatch cannot leak work
    across window boundaries.

    Headline numbers derived from this are PEAK-WINDOW figures; the
    median across windows is recorded in ``WINDOW_STATS[label]`` (and the
    bench JSON's ``window_stats``) so recurring slowdowns the best-of
    estimator masks (periodic recompiles, host GC) stay visible."""
    per = max(1, -(-len(keys) // windows))
    rates = []
    for w in range(0, len(keys), per):
        chunk = keys[w:w + per]
        t0 = time.perf_counter()
        out = None
        for k in chunk:
            out = run(k)
        _finish(out)
        dt = time.perf_counter() - t0
        rates.append(work_per_call * len(chunk) / dt)
    best = max(rates)
    if label is not None:
        WINDOW_STATS[label] = {
            "best": round(best, 1),
            "median": round(float(np.median(rates)), 1),
            "n_windows": len(rates),
        }
    return best


def _word_model(vocab):
    from deephumor_tpu.models import CaptioningTransformer

    model = CaptioningTransformer(
        num_tokens=vocab, hid_dim=HID, n_layers=LAYERS, n_heads=HEADS,
        pf_dim=PF, max_len=MAX_LEN + 2, compute_dtype="bfloat16",
    )
    params = model.init(jax.random.PRNGKey(0))
    cls = dict(params["decoder"]["classifier"])
    cls["bias"] = cls["bias"].at[3].set(EOS_BIAS)
    params["decoder"] = dict(params["decoder"], classifier=cls)
    return model, params


def _features(batch, hid, seed=0):
    rng = np.random.default_rng(seed)
    start = jnp.asarray(rng.normal(size=(batch, hid)).astype(np.float32))
    spatial = jnp.asarray(
        rng.normal(size=(batch, 49, hid)).astype(np.float32))
    return start, spatial


def bench_generation(vocab, batch=BATCH, iters=10):
    model, params = _word_model(vocab)
    start_emb, spatial = _features(batch, HID)

    def run(k):
        return model.generate_from_emb(
            params, (start_emb, spatial), key=k, max_len=MAX_LEN,
            beam_size=BEAM, top_k=64, temperature=1.0, sampler="pallas",
        )

    _finish(run(jax.random.PRNGKey(1))["chosen"])
    best = _best_window(
        lambda k: run(k)["chosen"],
        [jax.random.PRNGKey(2 + i) for i in range(iters)], batch,
        label=f"word_v{vocab}")
    return best, (model, params)


def bench_lstm(iters=9, batch=None):
    """LSTM-family serving rate at the SAME realistic word vocab and
    sampler as the headline (reference CaptioningLSTM; rnn_models.py
    re-runs the LSTM from scratch per token — here the recurrent state
    carries through the jitted loop). No attention/cross cost, so the
    classifier+sampler dominates: measured ~1.9x the transformer
    headline at V=29184."""
    from deephumor_tpu.models import CaptioningLSTM

    batch = batch or GEN_BATCH
    model = CaptioningLSTM(num_tokens=VOCAB, emb_dim=256,
                           hidden_size=512, num_layers=3,
                           compute_dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0))
    dec = dict(params["decoder"])
    cls = dict(dec["classifier"])
    cls["bias"] = cls["bias"].at[3].set(EOS_BIAS)
    dec["classifier"] = cls
    params = dict(params, decoder=dec)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(batch, 256)).astype(np.float32))

    def run(k):
        return model.generate_from_emb(
            params, emb, key=k, max_len=MAX_LEN, beam_size=BEAM,
            top_k=64, sampler="pallas")["chosen"]

    _finish(run(jax.random.PRNGKey(1)))
    return _best_window(
        run, [jax.random.PRNGKey(2 + i) for i in range(iters)], batch,
        label="lstm")


def bench_latency(model, params):
    """Amortized single-meme latency: a per-call wall measurement is
    dominated by the ~25 ms dispatch+fetch overhead of the remote tunnel
    (see benchmarks/attn_microbench.py), not device time."""
    se1, sp1 = _features(1, HID, seed=3)

    def run1(k):
        return model.generate_from_emb(
            params, (se1, sp1), key=k, max_len=MAX_LEN, beam_size=BEAM,
            top_k=64, temperature=1.0, sampler="pallas",
        )

    @jax.jit
    def lat_loop(k0):
        def body(i, acc):
            out = run1(jax.random.fold_in(k0, i))
            return acc + out["chosen"][0, 0]
        return jax.lax.fori_loop(0, 20, body, jnp.int32(0))

    _finish(lat_loop(jax.random.PRNGKey(90)))
    best = float("inf")
    for seed in (91, 92):  # best-of-2 (tunnel stalls; see _best_window)
        t0 = time.perf_counter()
        _finish(lat_loop(jax.random.PRNGKey(seed)))
        best = min(best, time.perf_counter() - t0)
    return best / 20 * 1000


def bench_char(iters=4):
    from deephumor_tpu.models import CaptioningTransformer

    model = CaptioningTransformer(
        num_tokens=CHAR_VOCAB, hid_dim=HID, n_layers=LAYERS,
        n_heads=HEADS, pf_dim=PF, max_len=CHAR_LEN + 2,
        compute_dtype="bfloat16",
    )
    params = model.init(jax.random.PRNGKey(0))
    cls = dict(params["decoder"]["classifier"])
    # chars per caption ~55 on memes900k; bias for plausible termination
    cls["bias"] = cls["bias"].at[3].set(1.0)
    params["decoder"] = dict(params["decoder"], classifier=cls)
    start_emb, spatial = _features(CHAR_BATCH, HID, seed=1)

    def run(k):
        return model.generate_from_emb(
            params, (start_emb, spatial), key=k, max_len=CHAR_LEN,
            beam_size=CHAR_BEAM, top_k=CHAR_TOPK, temperature=1.1,
            sampler="pallas",
        )

    _finish(run(jax.random.PRNGKey(1))["chosen"])
    return _best_window(
        lambda k: run(k)["chosen"],
        [jax.random.PRNGKey(2 + i) for i in range(iters)], CHAR_BATCH,
        windows=2, label="char")


def bench_train(iters=20, bs=256, compute_dtype=None, tuned=False):
    """Trunk-cached jitted train step (forward+backward+optax) at the
    word config — the Trainer's serving-style amortization (reference
    anchor: trainer.py:148-149 prints epoch wall time, never records it).
    ``compute_dtype='bfloat16'`` measures the mixed-precision step (bf16
    decoder matmuls, f32 master weights/loss — no reference parity
    constraint; the reference trains f32 on Colab GPU, trainer.py:66-92).
    ``tuned=True`` adds rectangular decoder shapes (T+1 positions instead
    of the reference's pad-to-49 quirk; eval losses identical, divergence
    #13) and hardware-RNG dropout keys (rng_impl='rbg') — the measured
    levers from benchmarks/train_ab.py.
    """
    from deephumor_tpu.experiments.trainer import Trainer
    from deephumor_tpu.models import CaptioningTransformer

    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=HID, n_layers=LAYERS, n_heads=HEADS,
        pf_dim=PF, max_len=50,  # pad-to-common-length quirk needs >= 49
    )
    trainer = Trainer(model, experiment_title="bench",
                      log_dir="/tmp/dh_bench_logs", donate=False,
                      compute_dtype=compute_dtype,
                      rectangular=tuned,
                      rng_impl="rbg" if tuned else None)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    trainer._trunk_cache = jnp.asarray(
        rng.normal(size=(300, 7, 7, 2048)).astype(np.float32))
    trainer._build_steps()
    step = trainer._train_step
    batch = {
        "captions": jnp.asarray(
            rng.integers(6, VOCAB, size=(bs, 33)), jnp.int32),
        "image_rows": jnp.asarray(
            rng.integers(0, 300, size=(bs,)), jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    state, m = step(state, batch, key)
    _finish(m["loss"])

    def run(k):
        nonlocal state
        state, m = step(state, batch, k)
        return m["loss"]

    label = "train_tuned" if tuned else (
        "train_bf16" if compute_dtype == "bfloat16" else "train_f32")
    ex_s = _best_window(
        run, [jax.random.fold_in(key, i) for i in range(iters)], bs,
        label=label)
    # MFU only for the reported (tuned) leg: lower().compile() does NOT
    # reuse the jit's in-memory executable, so this can cost one extra
    # XLA compile (softened by the persistent cache where enabled)
    flops = _step_flops(step, state, batch, key) if tuned else None
    mfu = None if flops is None else flops * (ex_s / bs) / V5E_PEAK_FLOPS
    return ex_s, mfu


# v5e per-chip peak: 197 TFLOP/s bf16 (MXU). MFU below is reported
# against this bf16 peak for every dtype — "fraction of the chip's
# matmul roofline" — so f32 legs read honestly low rather than being
# flattered by a smaller denominator.
V5E_PEAK_FLOPS = 197e12


def _step_flops(step, *args):
    """XLA's estimated FLOPs for one step (None if the backend doesn't
    expose cost analysis). May pay a fresh lowering+compile — jit's
    in-memory executable cache is separate from lower().compile()."""
    try:
        ca = step.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def bench_epoch(n_captions=240 * 256, epochs=4):
    """End-to-end tuned-train epoch rate (VERDICT r3 #3): the real
    disk -> BatchIterator -> run_epoch path at the bench config, with a
    synthetic trunk-feature cache (the one-time ResNet encode is not
    what this measures). Warm-epoch examples/s; compare against
    train_tuned_examples_s (device-only, pre-staged batch).

    240 steps/epoch: the old 30-step epochs ran ~1.5 s each, small
    enough that one link stall or the per-epoch dispatch warmup set the
    number (77-88% readings of the same path that measures 98-117% of
    the device-leg window at 390 steps — benchmarks/epoch_bench.py at
    100k captions); 120 steps still swung 5.1-6.3k ex/s between solo
    runs."""
    from benchmarks.epoch_bench import run as epoch_run

    out = epoch_run(n_captions, epochs=epochs, synth_trunk=True)
    return out["epoch_examples_s"]


def bench_serving_load(duration_s=12.0):
    """Open-loop serving latency (VERDICT r2 #4): Poisson arrivals into
    the DynamicBatcher at 0.3/0.6/0.85 of measured single-batch capacity;
    p50/p99 request latency + batch-size distribution per rate. Unlike
    ``bench_latency`` this measures queueing + padding + dispatch, not an
    amortized device loop. See benchmarks/serving_load.py."""
    from benchmarks.serving_load import measure_serving_load
    from deephumor_tpu.data import Vocab
    from deephumor_tpu.pipeline import MemeGenerationPipeline

    model, params = _word_model(VOCAB)
    vocab = Vocab([f"w{i}" for i in range(VOCAB - 6)])
    pipe = MemeGenerationPipeline(model, params, vocab)
    rng = np.random.default_rng(0)
    ids = [f"tmpl{i}" for i in range(300)]
    pipe.add_templates(
        ids, rng.normal(size=(300, 224, 224, 3)).astype(np.float32))
    try:
        results, capacity = measure_serving_load(
            pipe, ids, max_batch=256, max_wait_ms=10.0, buckets="auto",
            duration_s=duration_s, max_len=MAX_LEN, beam_size=BEAM,
            top_k=64, sampler="pallas")
    finally:
        pipe.close()
    return results, capacity


def bench_end_to_end(render=True):
    """BASELINE config-5: 300-template sweep — encode once, generate 10
    captions per template (batched), render overlapped on host threads."""
    from PIL import Image

    from deephumor_tpu.data import Vocab
    from deephumor_tpu.pipeline import MemeGenerationPipeline

    model, params = _word_model(VOCAB)
    vocab = Vocab([f"w{i}" for i in range(VOCAB - 6)])
    # rendering is embarrassingly parallel across host cores: on a
    # multi-core box use a spawn process pool (FreeType holds the GIL,
    # so threads do not scale), leaving one core for the device loop;
    # on a 1-core box keep the in-process thread pool.
    ncpu = os.cpu_count() or 1
    procs = max(0, min(ncpu - 1, 16)) if ncpu > 1 else 0
    pipe = MemeGenerationPipeline(model, params, vocab,
                                  render_processes=procs)

    rng = np.random.default_rng(0)
    ids = [f"tmpl{i}" for i in range(300)]
    images = rng.normal(size=(300, 224, 224, 3)).astype(np.float32)
    pils = None
    if render:
        pils = [
            Image.fromarray(
                rng.integers(0, 255, (300, 400, 3), dtype=np.uint8), "RGB")
            for _ in ids
        ]
    t0 = time.perf_counter()
    pipe.add_templates(ids, images, pil_images=pils)
    t_encode = time.perf_counter() - t0

    work = [tid for tid in ids for _ in range(10)]
    gen = dict(max_len=MAX_LEN, beam_size=BEAM, top_k=64,
               sampler="pallas")
    # warm the decode-loop compile out of the measurement (the pipeline
    # reuses the generation executable compiled by bench_generation only
    # if shapes match; pad_to=BATCH keeps one executable)
    pipe.generate_captions(work[:BATCH], key=jax.random.PRNGKey(0),
                           pad_to=BATCH, **gen)
    if render:
        # spawn render workers + ship the template snapshot up front —
        # serving setups pay this once at startup, not per request
        pipe.warm_render_pool()
    # best-of-N full sweeps (VERDICT r4 #7: the one-window render leg
    # of record swung 2x between rounds — 532.2 r3 vs 331.9 r4 — under
    # concurrent load / tunnel stalls). Whole-sweep repetition keeps the
    # decode/render overlap that per-batch windows would serialize; the
    # best sweep is the rate the machine sustains without a stall.
    rates = []
    for w in range(3):
        t0 = time.perf_counter()
        if render:
            outputs = pipe.generate_memes_batched(
                work, batch_size=BATCH,
                key=jax.random.fold_in(jax.random.PRNGKey(1), w), **gen)
        else:
            outputs = []
            for start in range(0, len(work), BATCH):
                outputs += pipe.generate_captions(
                    work[start:start + BATCH],
                    key=jax.random.fold_in(
                        jax.random.PRNGKey(1), w * 10000 + start),
                    pad_to=BATCH, **gen)
        dt = time.perf_counter() - t0
        assert len(outputs) == len(work)
        rates.append(len(work) / dt)
    pipe.close()
    label = "e2e_memes" if render else "e2e_captions"
    WINDOW_STATS[label] = {
        "best": round(max(rates), 1),
        "median": round(float(np.median(rates)), 1),
        "n_windows": len(rates),
    }
    return max(rates), t_encode


def main():
    # Watchdog: a wedged device tunnel hangs backend init forever (the
    # claim leg never returns). Emit a diagnosable JSON line and exit
    # instead of silently eating the round's bench window. Disarmed the
    # moment the first device dispatch succeeds.
    import os
    import threading

    def _bail():
        print(json.dumps({
            "metric": "captions/sec/chip (word V=%d, beam=5, len=32)"
                      % VOCAB,
            "value": 0.0,
            "unit": "captions/s",
            "vs_baseline": 0.0,
            "error": "device backend init timed out (tunnel claim "
                     "never granted) — see STATUS.md infra note",
        }), flush=True)
        os._exit(17)

    watchdog = threading.Timer(600.0, _bail)
    watchdog.daemon = True
    watchdog.start()
    jnp.zeros(8).block_until_ready()  # forces backend init + one dispatch
    watchdog.cancel()

    # secondary metrics must not take down the headline: a sub-bench
    # that fails (e.g. a kernel variant that lowers under the CPU
    # interpreter but trips on real hardware) reports null + an error
    # note instead of killing the whole JSON line
    errors = {}

    def guard(name, fn, default=None):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — diagnosable, not fatal
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            return default

    word_capt_s, (model, params) = bench_generation(VOCAB,
                                                    batch=GEN_BATCH)
    p50_ms = guard("p50", lambda: bench_latency(model, params))
    # release the headline model's device buffers before the remaining
    # legs — keeping them alive through the train/epoch legs pressured
    # HBM (the in-process epoch leg read 5.3-5.5k ex/s vs 7.7k solo)
    del model, params
    import gc

    gc.collect()
    word_small_capt_s = guard(
        "word_v8192",
        lambda: bench_generation(VOCAB_SMALL, batch=GEN_BATCH,
                                 iters=6)[0])
    char_capt_s = guard("char", bench_char)
    lstm_capt_s = guard("lstm", bench_lstm)
    train_ex_s, _ = guard("train", bench_train, default=(None, None))
    train_bf16_ex_s, _ = guard(
        "train_bf16", lambda: bench_train(compute_dtype="bfloat16"),
        default=(None, None))
    train_tuned_ex_s, train_tuned_mfu = guard(
        "train_tuned",
        lambda: bench_train(compute_dtype="bfloat16", tuned=True),
        default=(None, None))
    epoch_ex_s = guard("epoch", bench_epoch)
    e2e_capt_s = guard("e2e_captions",
                       lambda: bench_end_to_end(render=False)[0])
    e2e = guard("e2e_memes", lambda: bench_end_to_end(render=True))
    e2e_memes_s, t_encode = e2e if e2e is not None else (None, None)
    load = guard("serving_load", bench_serving_load)
    load_rates, load_capacity = load if load is not None else (None, None)

    def rnd(x, nd=1):
        return None if x is None else round(x, nd)

    out = {
        "metric":
            f"captions/sec/chip (word V={VOCAB}, beam=5, len=32)",
        "value": round(word_capt_s, 1),
        "unit": "captions/s",
        "vs_baseline": round(word_capt_s / PER_CHIP_TARGET, 3),
        "p50_per_meme_ms": rnd(p50_ms, 2),
        "word_v8192_captions_s": rnd(word_small_capt_s),
        "char_captions_s": rnd(char_capt_s),
        # LSTM family at the same V/sampler/beam as the headline
        "lstm_captions_s": rnd(lstm_capt_s),
        "train_examples_s": rnd(train_ex_s),
        "train_bf16_examples_s": rnd(train_bf16_ex_s),
        # 33 target tokens per example at the bench shape (no pads)
        "train_bf16_tokens_s": rnd(
            None if train_bf16_ex_s is None else train_bf16_ex_s * 33),
        # bf16 + rectangular shapes + hardware-RNG dropout (train_ab.py)
        "train_tuned_examples_s": rnd(train_tuned_ex_s),
        "train_tuned_tokens_s": rnd(
            None if train_tuned_ex_s is None else train_tuned_ex_s * 33),
        # XLA-estimated step FLOPs x steps/s over the v5e bf16 matmul
        # peak (197 TFLOP/s); None when the backend hides cost analysis
        "train_tuned_mfu": rnd(train_tuned_mfu, 4),
        # END-TO-END tuned epoch: disk dataset -> BatchIterator fast path
        # (C++ batch tokenizer) + trunk-cache rows -> Trainer.run_epoch
        # (chunked logging); proves the host feeds the device-only rate
        "epoch_examples_s": rnd(epoch_ex_s),
        "e2e_captions_s": rnd(e2e_capt_s),
        "e2e_memes_s": rnd(e2e_memes_s),
        "encode_300_templates_s": rnd(t_encode, 2),
    }
    if load_rates is not None:
        mid = load_rates[1]  # 0.6x capacity — the representative rate
        out["serving_p50_ms"] = mid["latency_ms"]["p50"]
        out["serving_p99_ms"] = mid["latency_ms"]["p99"]
        out["serving_capacity_rps"] = rnd(load_capacity)
        out["serving_load"] = load_rates
    if WINDOW_STATS:
        # headline figures above are PEAK-window; this shows the median
        # window per leg so masked recurring slowdowns stay visible
        out["window_stats"] = WINDOW_STATS
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()

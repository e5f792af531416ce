"""A/B the canonical-prefix serving path at the char config (real chip).

canon=False vs canon=True at len=128/beam=7/top_k=50, EOS-shaped logits
(bench.py bench_char config). Exact draw-for-draw equality does NOT hold
in bf16 on hardware — the canonical kernel sums its softmax over a
(shared, window) split while the full-width kernel sums over the flat
beam*P axis, so logits drift at bf16 epsilon and occasionally flip a
sampled draw, after which that item's suffix diverges chaotically (both
suffixes are valid samples of the same distribution). We therefore
report the per-item prefix agreement and mean |score| drift instead of
asserting equality; the exact-math equality is covered by
tests/test_pallas_attention.py::test_generation_canon_equality (f32,
interpret kernels).

Run: python -m benchmarks.canon_char_ab
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from deephumor_tpu.models import CaptioningTransformer

VOCAB, LEN, BEAM, TOPK, BATCH = 128, 128, 7, 50, 256
HID, LAYERS, HEADS, PF = 512, 6, 8, 2048


def main():
    model = CaptioningTransformer(
        num_tokens=VOCAB, hid_dim=HID, n_layers=LAYERS, n_heads=HEADS,
        pf_dim=PF, max_len=LEN + 2, compute_dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0))
    cls = dict(params["decoder"]["classifier"])
    cls["bias"] = cls["bias"].at[3].set(1.0)
    params["decoder"] = dict(params["decoder"], classifier=cls)
    rng = np.random.default_rng(1)
    start = jnp.asarray(rng.normal(size=(BATCH, HID)).astype(np.float32))
    spatial = jnp.asarray(
        rng.normal(size=(BATCH, 49, HID)).astype(np.float32))

    outs = {}
    for canon in (False, True):
        def run(k, canon=canon):
            return model.generate_from_emb(
                params, (start, spatial), key=k, max_len=LEN,
                beam_size=BEAM, top_k=TOPK, temperature=1.1,
                sampler="pallas", canon=canon)
        out = run(jax.random.PRNGKey(1))
        np.asarray(out["chosen"])  # warm + fetch
        iters = 4
        t0 = time.perf_counter()
        for i in range(iters):
            out = run(jax.random.PRNGKey(2 + i))
        np.asarray(out["chosen"])
        dt = time.perf_counter() - t0
        outs[canon] = out
        print(f"canon={canon}: {BATCH * iters / dt:.1f} captions/s",
              flush=True)
    a = np.asarray(outs[False]["chosen"])
    b = np.asarray(outs[True]["chosen"])
    ident = np.all(a == b, axis=tuple(range(1, a.ndim)))
    neq = a != b
    first_diff = np.where(
        neq.any(axis=-1), neq.argmax(axis=-1), a.shape[-1])
    sa = np.asarray(outs[False]["scores"], np.float64)
    sb = np.asarray(outs[True]["scores"], np.float64)
    print(f"items draw-for-draw identical: {ident.mean():.1%}")
    print(f"mean first-divergence step (diverged items): "
          f"{first_diff[~ident].mean() if (~ident).any() else LEN:.1f}")
    print(f"mean |score| rel drift: "
          f"{np.abs(sa - sb).mean() / max(np.abs(sa).mean(), 1e-9):.4f}")


if __name__ == "__main__":
    main()

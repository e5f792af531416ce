#!/usr/bin/env bash
# Hardware-window runbook: the measurement queue for the next time the
# axon tunnel grants a claim (single-claim tunnel — run ONE at a time).
# Each step is independently useful; order is by information value.
#
#   bash scripts/hw_window.sh [outdir]
#
# Context: the tunnel's claim wedged mid-round-2 (see STATUS.md infra
# note); these runs re-validate the canonical-prefix attention work that
# landed CPU-verified in the meantime.
set -u
OUT="${1:-/tmp/hw_window}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name="$1"; shift
  echo "=== $name ==="
  # pipefail so the reported exit is the command's, not tee's
  ( set -o pipefail; timeout 1200 "$@" 2>&1 | tee "$OUT/$name.log" )
  echo "=== $name exit=$? ==="
}

# 0. 60-second smoke: confirm the claim works and the kernels lower on
#    real hardware before committing to the long benches.
run smoke python - <<'PY'
import time
import numpy as np
import jax, jax.numpy as jnp
t0 = time.time()
print(jax.devices())
# hid_dim must stay on the 128-lane tiling: the fused cache-update
# kernels DMA rank-4 HBM slices with d_model in the last dim (narrower
# models auto-fall back to the XLA path, which this smoke must NOT take)
from deephumor_tpu.models import CaptioningTransformer
m = CaptioningTransformer(num_tokens=512, hid_dim=512, n_layers=2,
                          n_heads=8, pf_dim=128, max_len=18)
p = m.init(jax.random.PRNGKey(0))
r = np.random.default_rng(0)
emb = jnp.asarray(r.normal(size=(64, 512)).astype(np.float32))
spa = jnp.asarray(r.normal(size=(64, 49, 512)).astype(np.float32))
out = m.generate_from_emb(p, (emb, spa), key=jax.random.PRNGKey(1),
                          max_len=16, beam_size=5, top_k=16,
                          sampler="pallas")
toks = np.asarray(out["chosen"])
assert toks.shape[0] == 64 and (toks >= 0).all() and (toks < 512).all()
print("smoke OK", round(time.time() - t0, 1), "s")
PY

# 0b. Narrow-model smoke (ADVICE r2): hid_dim=64 is below the 128-lane
#     DMA tiling, so the engine must auto-fall back to the XLA decode
#     path on hardware instead of raising from the fused kernels.
run smoke_narrow python - <<'PY'
import time
import numpy as np
import jax, jax.numpy as jnp
t0 = time.time()
from deephumor_tpu.models import CaptioningTransformer
m = CaptioningTransformer(num_tokens=256, hid_dim=64, n_layers=2,
                          n_heads=4, pf_dim=128, max_len=18)
p = m.init(jax.random.PRNGKey(0))
r = np.random.default_rng(0)
emb = jnp.asarray(r.normal(size=(16, 64)).astype(np.float32))
spa = jnp.asarray(r.normal(size=(16, 49, 64)).astype(np.float32))
out = m.generate_from_emb(p, (emb, spa), key=jax.random.PRNGKey(1),
                          max_len=16, beam_size=5, top_k=16)
toks = np.asarray(out["chosen"])
assert toks.shape[0] == 16 and (toks >= 0).all() and (toks < 256).all()
print("narrow smoke OK (XLA fallback)", round(time.time() - t0, 1), "s")
PY

# 1. Mosaic lowering + exactness + HONEST per-step timing of the
#    double-buffered canon kernel and the ids straggler recompute
#    (the pre-fix 1.63x figure had the ids kernel DCE'd out).
# -m keeps the repo root on sys.path (plain ``python benchmarks/x.py``
# puts benchmarks/ first and deephumor_tpu is not found)
run canon_validate python -m benchmarks.canon_validate

# 2. End-to-end char A/B at the serving config (canon off/on).
run canon_char_ab python -m benchmarks.canon_char_ab

# 3. Per-component ledger of the char step: full vs canon(+/-ids) at
#    tip and mid-run, engine-without-decoder, boundary costs.
run char_ledger python -m benchmarks.char_ledger

# 4. Full driver bench (all BENCH metrics incl. word 29k headline,
#    e2e render path at the new ~519 renders/s).
run bench python bench.py

# 5. shard_map x pallas composition (VERDICT r2 weak #4): dp_generate on
#    a 1-device TPU mesh with the FUSED kernels enabled — validates that
#    shard_map(pallas_call + aliased-cache donation) lowers and runs on
#    real hardware (the virtual-CPU mesh necessarily tests attn="xla").
#    Token-equality vs the unsharded run is asserted, not just liveness.
run shardmap_pallas python - <<'PY'
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.sharding import Mesh
t0 = time.time()
from deephumor_tpu.models import CaptioningTransformer
from deephumor_tpu.parallel.mesh import dp_generate
m = CaptioningTransformer(num_tokens=512, hid_dim=512, n_layers=2,
                          n_heads=8, pf_dim=128, max_len=18)
p = m.init(jax.random.PRNGKey(0))
r = np.random.default_rng(0)
emb = jnp.asarray(r.normal(size=(64, 512)).astype(np.float32))
spa = jnp.asarray(r.normal(size=(64, 49, 512)).astype(np.float32))
gen = dict(max_len=16, beam_size=5, top_k=16, temperature=0.0,
           sampler="pallas", attn="pallas")
mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
out = dp_generate(m, p, (emb, spa), mesh, key=jax.random.PRNGKey(1), **gen)
ref = m.generate_from_emb(p, (emb, spa), key=jax.random.PRNGKey(1), **gen)
sh, un = np.asarray(out["chosen"]), np.asarray(ref["chosen"])
assert sh.shape == un.shape and (sh == un).all(), "sharded != unsharded"
print("shard_map x pallas OK (greedy token-equal)",
      round(time.time() - t0, 1), "s")
PY

# 6. Fused survivor-update kernel on real Mosaic: math equality on the
#    live prefix AND the aliased dead-tail passthrough that the TPU
#    interpreter cannot emulate (unvisited blocks must keep prior state).
run survivor_kernel python - <<'PY'
import numpy as np
import jax, jax.numpy as jnp
from deephumor_tpu.ops import pallas_engine as pe
ITEMS, BEAM, L, P, EOS, PAD = 32, 7, 128, 136, 3, 0
rng = np.random.default_rng(2)
new_idx = jnp.asarray(rng.integers(4, 120, (ITEMS, BEAM, BEAM)), jnp.int32)
new_idx = new_idx.at[0, 1, 2].set(EOS).at[3, 0, 0].set(EOS)
new_val = jnp.asarray(rng.normal(size=(ITEMS, BEAM, BEAM)).astype(np.float32))
surv = jnp.asarray(rng.integers(0, BEAM * BEAM, (ITEMS, BEAM)), jnp.int32)
ended = jnp.asarray(rng.integers(0, 2, (ITEMS, BEAM)), bool)
val = jnp.asarray(rng.normal(size=(ITEMS, BEAM)).astype(np.float32))
seq = jnp.asarray(rng.integers(0, 120, (ITEMS, BEAM, L)), jnp.int32)
anc = jnp.asarray(rng.integers(0, BEAM, (ITEMS, BEAM, P)), jnp.int32)
valid = jnp.asarray(rng.integers(0, 2, (ITEMS, BEAM, P)), bool)
pos = jnp.int32(77)
ref = pe._reference_update(new_idx, new_val, surv, ended, val, seq, anc,
                           valid, pos, beam=BEAM, eos_index=EOS, pad_index=PAD)
got = pe.fused_survivor_update(new_idx, new_val, surv, ended, val, seq,
                               anc, valid, pos, beam=BEAM, eos_index=EOS,
                               pad_index=PAD, interpret=False)
for g, r, n in zip(got, ref, ("chosen", "val", "ended", "seq", "anc", "valid")):
    np.testing.assert_array_equal(np.asarray(g), np.asarray(r), err_msg=n)
got = pe.fused_survivor_update(new_idx, new_val, surv, ended, val, seq,
                               anc, valid, pos, beam=BEAM, eos_index=EOS,
                               pad_index=PAD, interpret=False, block_items=8,
                               live_items=jnp.int32(16))
for g, r, n in zip(got, ref, ("chosen", "val", "ended", "seq", "anc", "valid")):
    np.testing.assert_array_equal(np.asarray(g)[:16], np.asarray(r)[:16],
                                  err_msg="live " + n)
for g, orig, n in ((got[1], val, "val"), (got[2], ended, "ended"),
                   (got[3], seq, "seq"), (got[4], anc, "anc"),
                   (got[5], valid, "valid")):
    np.testing.assert_array_equal(np.asarray(g)[16:], np.asarray(orig)[16:],
                                  err_msg="dead tail " + n)
print("survivor kernel OK (math + aliased dead-tail passthrough)")
PY

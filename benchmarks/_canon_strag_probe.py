"""Probe: straggler fraction at canon boundaries (CPU, interpret kernels).

The coalescence condition is 'MRCA of live branches at depth >= c', a
property of the sampling dynamics only - identical math on CPU - so a
small-batch CPU run estimates the hardware straggler fraction.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["DH_DEBUG_CANON"] = "1"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")  # sitecustomize may force axon
from deephumor_tpu.models import CaptioningTransformer

VOCAB, LEN, BEAM, TOPK, BATCH = 128, 128, 7, 50, 48
model = CaptioningTransformer(num_tokens=VOCAB, hid_dim=512, n_layers=6,
    n_heads=8, pf_dim=2048, max_len=LEN + 2)
params = model.init(jax.random.PRNGKey(0))
cls = dict(params["decoder"]["classifier"]); cls["bias"] = cls["bias"].at[3].set(1.0)
params["decoder"] = dict(params["decoder"], classifier=cls)
rng = np.random.default_rng(1)
start = jnp.asarray(rng.normal(size=(BATCH, 512)).astype(np.float32))
spatial = jnp.asarray(rng.normal(size=(BATCH, 49, 512)).astype(np.float32))
out = model.generate_from_emb(params, (start, spatial), key=jax.random.PRNGKey(1),
    max_len=LEN, beam_size=BEAM, top_k=TOPK, temperature=1.1,
    attn="pallas_interpret", canon=True)
np.asarray(out["chosen"])

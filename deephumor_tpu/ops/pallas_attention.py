"""Fused ancestry-beam decode attention as a Pallas TPU kernel.

The engine's beam search never shuffles KV caches; instead each branch
carries an ancestry table and attention selects ancestor energies
(deephumor_tpu/models/transformer.py _ancestry_attention). The XLA einsum
formulation is correct but forces the head dimension into a dot batch
dimension, which relays the whole cache through HBM every step (measured
~2.9 ms/step for the K side alone at 1120 rows — and an int8 cache does
not help, so it is layout cost, not bandwidth).

This kernel reads the caches ONCE per step in their stored layout; the
head split, all-pairs energies, ancestor selection, masked softmax, and
weighted sum all happen on VMEM-resident blocks. HBM traffic is the
theoretical floor: K + V read once, plus the small q/out vectors and a
tiny selection-bias tensor.

Design notes (Mosaic constraints shaped this):
  - No reshapes inside the kernel — Mosaic's vector layout inference
    rejects leading-dim shape casts (e.g. [40,64]->[8,5,64]). All shape
    surgery happens OUTSIDE in XLA where it is a free bitcast on the
    row-major caches: rows -> (groups, beam) and (beam, P) -> beam*P.
  - Ancestor selection + validity masking are folded into ONE additive
    f32 bias [G, beam, beam*P] (0 where (slot, position) is the branch's
    ancestor and the position is valid, -1e8 otherwise), computed once
    per decode step in XLA from the tiny ancestry/validity tables and
    shared by every layer. Softmax over the masked flat beam*P axis
    equals the per-position softmax of the einsum path exactly.
  - The head split is a static in-kernel loop of rank-3 dot_generals
    (one batch dim, the most Mosaic lowers) over minor-dim slices.

Numerics: energies and softmax in f32, inputs/outputs in the cache dtype
(bf16 on the serving path) — the same policy as the XLA path.
"""

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ancestry_attention", "ancestry_bias"]

MASK_FILL = -1e8


def ancestry_bias(anc, valid, p, flat=True):
    """Additive selection bias from ancestry + validity (XLA-side, tiny).

    Args:
        anc: ``[B, beam, P]`` int32 — anc[b, j, pos] = physical slot that
            holds branch j's key at ``pos``.
        valid: bool ``[B*beam, P]`` — branch-local position validity.
        p: static int, the cache length P (= anc.shape[-1]).
        flat: collapse the trailing (slot, position) axes.

    Returns:
        ``[B, beam, beam*P]`` f32 (or ``[B, beam, beam, P]`` when not
        ``flat``) — 0 at (slot i, position pos) iff
        ``anc[b, j, pos] == i`` and the position is valid; -1e8 elsewhere.
    """
    b, beam, _ = anc.shape
    sel = jax.nn.one_hot(anc, beam, axis=-2, dtype=jnp.bool_)  # [B,j,i,pos]
    sel = jnp.logical_and(sel, valid.reshape(b, beam, 1, p))
    if flat:
        sel = sel.reshape(b, beam, beam * p)
    return jnp.where(sel, 0.0, MASK_FILL).astype(jnp.float32)


def _kernel_native4d(q_ref, k_ref, v_ref, bias_ref, out_ref, e_ref, *,
                     n_heads, scale):
    # Consumes the caches in their NATIVE [items, beam, P, D] view (a free
    # leading-dim split of the engine's [rows, P, D] storage) — flattening
    # (beam, P) in XLA is a 38 MB retile per layer per step, and Mosaic
    # cannot shape-cast it in-kernel, so the slot axis is a static loop.
    bi, beam, p, d_model = k_ref.shape
    head_dim = d_model // n_heads
    inv_scale = 1.0 / scale

    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q_h = q_ref[:, :, sl]                       # [bi, beam, hd]
        for i in range(beam):
            e = jax.lax.dot_general(
                q_h, k_ref[:, i, :, sl],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                        # [bi, beam, P]
            e_ref[:, :, i, :] = e * inv_scale + bias_ref[:, :, i, :]

        e_all = e_ref[:]                             # [bi, beam, beam, P]
        # Mosaic only reduces one trailing axis at a time
        m = jnp.max(jnp.max(e_all, axis=3, keepdims=True), axis=2,
                    keepdims=True)
        w = jnp.exp(e_all - m)
        denom = jnp.sum(jnp.sum(w, axis=3, keepdims=True), axis=2,
                        keepdims=True)
        w = (w / denom).astype(v_ref.dtype)

        acc = None
        for i in range(beam):
            part = jax.lax.dot_general(
                w[:, :, i, :], v_ref[:, i, :, sl],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                        # [bi, beam, hd]
            acc = part if acc is None else acc + part
        out_ref[:, :, sl] = acc.astype(out_ref.dtype)


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, n_heads, scale):
    _, _, d_model = q_ref.shape
    head_dim = d_model // n_heads
    inv_scale = 1.0 / scale

    bias = bias_ref[:]                        # [g, beam, beam*P] f32
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q_h = q_ref[:, :, sl]                 # [g, beam, hd]
        k_h = k_ref[:, :, sl]                 # [g, beam*P, hd]
        v_h = v_ref[:, :, sl]

        energy = jax.lax.dot_general(
            q_h, k_h,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv_scale + bias                  # [g, beam, beam*P]
        attn = jax.nn.softmax(energy, axis=-1).astype(v_h.dtype)

        out_ref[:, :, sl] = jax.lax.dot_general(
            attn, v_h,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)               # [g, beam, hd]


def _kernel_blockdiag(q_ref, k_ref, v_ref, bias_ref, out_ref, *, beam, p,
                      n_heads, scale):
    # One LARGE rank-2 dot per head over the whole block: queries of every
    # group in the block against keys of every group, with cross-group
    # pairs masked block-diagonally. The wasted cross-group FLOPs are tiny
    # (the dot is HBM-feed-bound), and a single [R, C] dot keeps the MXU
    # fed where a g-batched [beam, C_g] dot issues dozens of 5-row stubs.
    rows, d_model = q_ref.shape                # R = block_items * beam
    cols = k_ref.shape[0]                      # C = R * P
    head_dim = d_model // n_heads
    inv_scale = 1.0 / scale
    n_groups = rows // beam

    # block-diagonal expansion of the compact per-group bias [R, beam*P]:
    # tile it C/(beam*P) times along lanes, then mask cross-group windows
    tiled = jnp.concatenate([bias_ref[:]] * n_groups, axis=1)  # [R, C]
    rowg = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // beam
    colg = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) // (beam * p)
    bias = jnp.where(rowg == colg, tiled, MASK_FILL)

    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        energy = jax.lax.dot_general(
            q_ref[:, sl], k_ref[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_scale + bias                   # [R, C]
        # cross-group columns carry ~-1e8 and contribute exp(.) == 0, so
        # softmax over the full C axis equals the per-group softmax
        attn = jax.nn.softmax(energy, axis=-1).astype(v_ref.dtype)
        out_ref[:, sl] = jax.lax.dot_general(
            attn, v_ref[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)                # [R, hd]


@functools.partial(
    jax.jit,
    static_argnames=("beam", "n_heads", "block_items", "interpret", "impl"),
)
def ancestry_attention(q, cache_k, cache_v, bias, *, beam, n_heads,
                       block_items=16, interpret=False, impl="native4d"):
    """Single-query beam attention over unshuffled caches.

    Args:
        q: ``[B*beam, D]`` pre-projected queries.
        cache_k/cache_v: ``[B*beam, P, D]`` per-slot caches.
        bias: ``[B, beam, beam*P]`` f32 from :func:`ancestry_bias` —
            computed ONCE per decode step and shared by every layer.
        impl: "native4d" (default — consumes the caches through a FREE
            leading-dim-split view, the only impl with zero XLA-side cache
            retiles), "grouped" (g-batched rank-3 dots over
            (beam*P)-flattened caches — the flatten is a 38 MB retile per
            call), or "blockdiag" (one cross-group-masked dot per head;
            kept for ablation).

    Returns:
        ``[B*beam, D]`` attention output (pre output-projection).
    """
    rows, p, d_model = cache_k.shape
    num_items = rows // beam
    head_dim = d_model // n_heads
    scale = float(head_dim) ** 0.5

    # block rows must be sublane-aligned (divisible by 8) unless the block
    # covers the whole row axis
    block_items = min(block_items, num_items)
    while block_items < num_items and (
        num_items % block_items != 0 or (block_items * beam) % 8 != 0
    ):
        block_items -= 1
    if block_items < 1:
        block_items = num_items
    block_rows = block_items * beam

    grid = (num_items // block_items,)

    if interpret:
        # TPU-specific lowering only interprets under the TPU interpreter
        # context (the pallas_call must be CONSTRUCTED inside it, not just
        # invoked) — same pattern as ops/pallas_sampler.py
        ctx = pltpu.force_tpu_interpret_mode()
    else:
        ctx = contextlib.nullcontext()

    if impl == "native4d":
        # only FREE views: leading-dim splits keep the tiled (P, D) /
        # trailing dims intact, so no cache bytes move outside the kernel
        qg = q.reshape(num_items, beam, d_model)
        kg = cache_k.reshape(num_items, beam, p, d_model)
        vg = cache_v.reshape(num_items, beam, p, d_model)
        bias4 = bias.reshape(num_items, beam, beam, p)
        kernel = functools.partial(
            _kernel_native4d, n_heads=n_heads, scale=scale
        )
        with ctx:
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((block_items, beam, d_model),
                                 lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((block_items, beam, p, d_model),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((block_items, beam, p, d_model),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((block_items, beam, beam, p),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((block_items, beam, d_model),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (num_items, beam, d_model), q.dtype
                ),
                scratch_shapes=[
                    pltpu.VMEM((block_items, beam, beam, p), jnp.float32),
                ],
            )(qg, kg, vg, bias4)
        return out.reshape(rows, d_model)

    if impl == "blockdiag":
        # free row-major bitcasts: caches flatten to [rows*P, D]; the
        # compact bias flattens to [rows, beam*P]
        kg = cache_k.reshape(rows * p, d_model)
        vg = cache_v.reshape(rows * p, d_model)
        bias2 = bias.reshape(rows, beam * p)
        kernel = functools.partial(
            _kernel_blockdiag, beam=beam, p=p, n_heads=n_heads, scale=scale
        )
        with ctx:
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((block_rows, d_model), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((block_rows * p, d_model),
                                 lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((block_rows * p, d_model),
                                 lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((block_rows, beam * p), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((block_rows, d_model),
                                       lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, d_model), q.dtype),
            )(q, kg, vg, bias2)

    # impl == "grouped"
    # free row-major bitcasts: rows -> (groups, beam); (beam, P) -> beam*P
    qg = q.reshape(num_items, beam, d_model)
    kg = cache_k.reshape(num_items, beam * p, d_model)
    vg = cache_v.reshape(num_items, beam * p, d_model)
    kernel = functools.partial(_kernel, n_heads=n_heads, scale=scale)
    with ctx:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_items, beam, d_model),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_items, beam * p, d_model),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_items, beam * p, d_model),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_items, beam, beam * p),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_items, beam, d_model),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (num_items, beam, d_model), q.dtype
            ),
        )(qg, kg, vg, bias)
    return out.reshape(rows, d_model)

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

__all__ = ["ancestry_attention", "ancestry_attention_update",
           "ancestry_attention_update_canon", "ancestry_attention_ids",
           "ancestry_attention_update_flash", "ancestry_bias",
           "supports_fused_update"]

MASK_FILL = -1e8

# The fused update/canon/flash kernels DMA rank-4 HBM cache slices whose
# LAST dimension is the full d_model — Mosaic requires manual-copy slices
# to align to the (8, 128) tile in their trailing two dims, so d_model
# must be a multiple of the 128-lane tiling (hardware-verified failure:
# "Slice shape along dimension 3 must be aligned to tiling (128)" at
# d_model=64). All reference configs use 512; models below the lane
# width must take the XLA einsum decode path instead.
_DMA_LANE = 128


def supports_fused_update(d_model):
    """Whether the fused Pallas cache-update kernels can lower for this
    model width on real TPU hardware (see _DMA_LANE note above)."""
    return d_model % _DMA_LANE == 0


def _force_interpret_active():
    """True when pltpu.force_tpu_interpret_mode() wraps this trace —
    pallas_call then interprets regardless of its ``interpret`` flag."""
    try:
        from jax._src import config as _jax_config

        return (
            _jax_config.pallas_tpu_interpret_mode_context_manager.value
            is not None
        )
    except Exception:  # config internals moved — fail open to the check
        return False


def _check_fused_width(d_model, kernel_name):
    # the constraint is a property of the REAL Mosaic DMA lowering; the
    # interpreter has no tiling. Callers skip this check when their
    # ``interpret`` flag is set; force_tpu_interpret_mode (which
    # interprets regardless of that flag) is detected here — the active
    # lowering, not the process's default backend, decides (ADVICE r2:
    # a backend consult misfires in multi-backend processes).
    if _force_interpret_active():
        return
    if not supports_fused_update(d_model):
        raise ValueError(
            f"{kernel_name} requires d_model % {_DMA_LANE} == 0 (HBM DMA "
            f"lane tiling of the rank-4 cache slices), got d_model="
            f"{d_model}. Use the XLA decode path (attn='xla') for "
            f"narrow models."
        )


def _pick_block_items(start, n, row_mult):
    """Largest block size <= ``start`` that divides ``n`` with
    sublane-aligned rows (``block * row_mult % 8 == 0``); falls back to
    the whole axis as ONE block when no smaller size satisfies both
    (a full block has no partial-tile edge, so it is always legal —
    e.g. n prime with row_mult=7, where the old decrement loop would
    reach 0 and divide by zero)."""
    b = min(start, n)
    while 1 < b < n and (n % b != 0 or (b * row_mult) % 8 != 0):
        b -= 1
    if b < n and (n % b != 0 or (b * row_mult) % 8 != 0):
        b = n
    return b


def _pick_packed_block_items(start, g, r, ng):
    """Largest block size <= ``start`` that divides ``g``, holds whole
    ``ng``-item subgroups, and keeps sublane-aligned rows; falls back to
    the smallest valid multiple of ``ng``.  Enumerates the valid
    multiples of ``ng`` directly — the round-4 decrement-search
    re-entered ``_pick_block_items`` (which searches DOWNWARD) and could
    return the same size forever (ADVICE r4 #1: G=896, r=5,
    block_items=56, ng=16 hung at trace time)."""
    cands = [b for b in range(ng, g + 1, ng)
             if g % b == 0 and (b * r) % 8 == 0]
    if not cands:
        raise ValueError(f"no block size holds pack_items={ng} whole "
                         f"subgroups at G={g}, r={r}")
    at_most = [b for b in cands if b <= start]
    return max(at_most) if at_most else min(cands)


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
            )                                        # [bi, beam, P_eff]
            # the bias block always spans full P (lane-divisibility rule);
            # p may be restricted to a prefix (p_eff partial cache read)
            e_ref[:, :, i, :] = e * inv_scale + bias_ref[:, :, i, 0:p]

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
    static_argnames=("beam", "n_heads", "block_items", "interpret", "impl",
                     "p_eff"),
)
def ancestry_attention(q, cache_k, cache_v, bias, *, beam, n_heads,
                       block_items=None, interpret=False, impl="native4d",
                       p_eff=None):
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
        p_eff: native4d only — restrict reads/compute to the first
            ``p_eff`` cache positions (a free partial BlockSpec read; the
            decode loop dispatches on the current position so early steps
            skip the untouched cache tail). Must cover every VALID
            position; excluded positions must be invalid. Multiple of 8
            (or == P).

    Returns:
        ``[B*beam, D]`` attention output (pre output-projection).
    """
    rows, p, d_model = cache_k.shape
    num_items = rows // beam
    head_dim = d_model // n_heads
    scale = float(head_dim) ** 0.5

    if block_items is None:
        block_items = 16  # measured sweet spot (bigger blocks hurt the
        # DMA/compute pipeline; see STATUS.md round-2 notes)

    # block rows must be sublane-aligned (divisible by 8) unless the block
    # covers the whole row axis
    block_items = _pick_block_items(block_items, num_items, beam)
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
        pe = p if p_eff is None else min(p_eff, p)
        assert pe == p or pe % 8 == 0, (pe, p)
        # only FREE views: leading-dim splits keep the tiled (P, D) /
        # trailing dims intact, so no cache bytes move outside the kernel.
        # The position-axis BlockSpec covers only the first pe positions —
        # a partial read, the cache tail never leaves HBM.
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
                    pl.BlockSpec((block_items, beam, pe, d_model),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((block_items, beam, pe, d_model),
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
                    pltpu.VMEM((block_items, beam, beam, pe), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 2 ** 20,
                ),
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


def _kernel_native4d_update(pos_ref, q_ref, k_ref, v_ref, knew_ref,
                            vnew_ref, bias_ref, kout_ref, vout_ref, out_ref,
                            kw_ref, vw_ref, sem_k, sem_v, *,
                            n_heads, scale, block_items):
    """native4d attention FUSED with the per-step cache column write.

    The decode step must append this position's K/V to the caches. Doing
    that with an XLA ``dynamic_update_slice`` costs a full cache copy per
    layer per step (the updated buffer has two consumers: the attention
    custom-call and the loop carry). Here the caches are aliased
    input->output (zero copy); the kernel substitutes the fresh column
    into the VMEM blocks it already streamed for attention, and DMAs ONLY
    the 8-position tile containing ``pos`` back to HBM (~1.1 MB of
    writes per cache instead of a 38 MB copy).

    Early-EOS compaction enters as a DYNAMIC GRID, not in-kernel logic:
    the wrapper sizes the grid to the live block count, so dead blocks
    never iterate — no DMA, no compute (clamped index maps + pl.when
    were measured to skip compute only; Pallas still fetched every
    block's cache bytes).
    """
    pos = pos_ref[0]
    grid_i = pl.program_id(0)
    bi, beam, pe, d_model = k_ref.shape
    head_dim = d_model // n_heads
    inv_scale = 1.0 / scale

    # start the writeback tile staging IMMEDIATELY (VMEM->VMEM copy of
    # the 8-tile containing pos — dynamic_slice of a value does not
    # lower, so it goes through scratch); the wait is deferred until
    # after the attention math so the copy hides behind compute (the
    # up-front wait cost ~0.05 ms/layer — benchmarks/attn_v3.py)
    tile = pl.multiple_of((pos // 8) * 8, 8)
    row0 = grid_i * block_items
    dk_in = pltpu.make_async_copy(k_ref.at[:, :, pl.ds(tile, 8), :],
                                  kw_ref, sem_k)
    dv_in = pltpu.make_async_copy(v_ref.at[:, :, pl.ds(tile, 8), :],
                                  vw_ref, sem_v)
    dk_in.start()
    dv_in.start()

    # substitute the fresh column into the streamed blocks. The
    # predicate is a [.., P, 1] iota broadcast across lanes (a
    # full-shape iota adds two more VPU passes over cache-sized blocks)
    sel = jax.lax.broadcasted_iota(jnp.int32, (bi, beam, pe, 1), 2) == pos
    kb = jnp.where(sel, knew_ref[:].astype(k_ref.dtype), k_ref[:])
    vb = jnp.where(sel, vnew_ref[:].astype(v_ref.dtype), v_ref[:])

    # merge (slot, position) INSIDE the kernel (the round-2 notes
    # record this reshape as impossible — Mosaic now lowers it) and
    # fold ALL heads into a single QK and a single AV dot per block
    # with block-diagonal masked queries: row (h, j) of q_all carries
    # branch j's query masked to head h's 64 lanes, so contracting the
    # FULL d_model yields exactly head h's energies (other heads'
    # lanes contribute 0). 8x the MACs of the useful computation, but
    # 2 MXU issues per block instead of 16 skinny ones: 0.302
    # (slot-loop) -> 0.270 (per-head flat) -> 0.232 ms/layer
    # (benchmarks/attn_v4.py).
    kb2 = kb.reshape(bi, beam * pe, d_model)
    vb2 = vb.reshape(bi, beam * pe, d_model)
    bias = bias_ref[:]                           # [bi, beam, beam*Pe]

    lane = jax.lax.broadcasted_iota(
        jnp.int32, (bi, n_heads * beam, d_model), 2)
    hrow = jax.lax.broadcasted_iota(
        jnp.int32, (bi, n_heads * beam, d_model), 1) // beam
    qt = jnp.concatenate([q_ref[:]] * n_heads, axis=1)
    q_all = jnp.where(lane // head_dim == hrow, qt, 0).astype(
        q_ref.dtype)

    e = jax.lax.dot_general(
        q_all, kb2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * inv_scale                                # [bi, H*beam, beam*Pe]
    e = e + jnp.concatenate([bias] * n_heads, axis=1)
    attn = jax.nn.softmax(e, axis=-1).astype(vb2.dtype)

    out_all = jax.lax.dot_general(
        attn, vb2,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                            # [bi, H*beam, D]
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        out_ref[:, :, sl] = out_all[
            :, h * beam:(h + 1) * beam, sl].astype(out_ref.dtype)

    # writeback: wait the staged tiles, insert the fresh column, DMA
    # the tiles back in place (caches aliased input->output)
    dk_in.wait()
    dv_in.wait()
    sel8 = jax.lax.broadcasted_iota(jnp.int32, (bi, beam, 8, 1),
                                    2) == pos % 8
    kw_ref[:] = jnp.where(sel8, knew_ref[:].astype(kw_ref.dtype),
                          kw_ref[:])
    vw_ref[:] = jnp.where(sel8, vnew_ref[:].astype(vw_ref.dtype),
                          vw_ref[:])
    dk_out = pltpu.make_async_copy(
        kw_ref, kout_ref.at[pl.ds(row0, bi), :, pl.ds(tile, 8), :],
        sem_k)
    dv_out = pltpu.make_async_copy(
        vw_ref, vout_ref.at[pl.ds(row0, bi), :, pl.ds(tile, 8), :],
        sem_v)
    dk_out.start()
    dv_out.start()
    dk_out.wait()
    dv_out.wait()


@functools.partial(
    jax.jit,
    static_argnames=("beam", "n_heads", "block_items", "interpret",
                     "p_eff"),
)
def ancestry_attention_update(q, cache_k, cache_v, k_new, v_new, bias, pos,
                              *, beam, n_heads, block_items=None,
                              interpret=False, p_eff=None,
                              live_items=None):
    """Fused: write (k_new, v_new) at ``pos``, then ancestry attention.

    Equivalent to ``cache_k[:, pos] = k_new; cache_v[:, pos] = v_new``
    followed by :func:`ancestry_attention`, but the caches are updated IN
    PLACE (aliased, donated) with a 1.1 MB tile write instead of a full
    XLA buffer copy.

    Args:
        q, cache_k/cache_v, bias: as :func:`ancestry_attention`; the
            cache position axis must be a multiple of 8 (init_cache pads).
        k_new/v_new: ``[B*beam, D]`` this position's entries.
        pos: int32 scalar decode position (< p_eff if given).
        live_items: optional traced int32 — number of LIVE items, which
            must occupy a leading prefix of the item axis (the engine's
            early-EOS compaction maintains this). Item blocks past the
            live count skip their compute AND their cache DMA (clamped
            index maps repeat the last live block, which Pallas does not
            re-fetch); their attention output rows are stale garbage that
            the engine's ended-branch masking discards.

    Returns:
        (attention output ``[B*beam, D]``, cache_k, cache_v).
    """
    rows, p, d_model = cache_k.shape
    num_items = rows // beam
    head_dim = d_model // n_heads
    scale = float(head_dim) ** 0.5
    assert p % 8 == 0, p

    pe = p if p_eff is None else min(p_eff, p)
    if not interpret:
        _check_fused_width(d_model, "ancestry_attention_update")
    if block_items is None:
        # double-buffered K/V blocks + tile scratch must fit scoped VMEM
        block_items = 16 if pe <= 16 else 8
    block_items = _pick_block_items(block_items, num_items, beam)
    assert pe % 8 == 0, (pe, p)
    if interpret and pe != p:
        # the interpreter mis-shapes ALIASED buffers whose block (pe) does
        # not divide the array axis (p) — read the full cache instead;
        # results are identical (validity masks the tail), only the
        # partial-read saving is dropped, and interpret mode is tests-only
        pe = p

    qg = q.reshape(num_items, beam, d_model)
    kg = cache_k.reshape(num_items, beam, p, d_model)
    vg = cache_v.reshape(num_items, beam, p, d_model)
    knew = k_new.astype(cache_k.dtype).reshape(num_items, beam, 1, d_model)
    vnew = v_new.astype(cache_v.dtype).reshape(num_items, beam, 1, d_model)
    # the kernel consumes the bias over the FLAT (slot, position) axis; a
    # p_eff restriction re-flattens with the matching stride (tiny tensor,
    # XLA-side, once per step)
    if pe == p:
        bias_flat = bias.reshape(num_items, beam, beam * p)
    else:
        bias_flat = bias.reshape(num_items, beam, beam, p)[
            ..., :pe].reshape(num_items, beam, beam * pe)

    n_blocks = num_items // block_items
    if live_items is None:
        # static grid — identical executable to the no-compaction path
        grid = (n_blocks,)
    else:
        # DYNAMIC grid: only live item blocks iterate. Dead blocks (a
        # compacted suffix) are never fetched or computed; their cache
        # rows stay as-is through the input/output alias and their
        # attention-out rows are stale garbage the engine discards.
        nlive = jnp.clip(
            (jnp.asarray(live_items, jnp.int32) + block_items - 1)
            // block_items, 1, n_blocks)
        grid = (nlive,)

    kernel = functools.partial(
        _kernel_native4d_update, n_heads=n_heads, scale=scale,
        block_items=block_items,
    )
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    if interpret:
        ctx = pltpu.force_tpu_interpret_mode()
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        kc, vc, out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((block_items, beam, d_model),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_items, beam, pe, d_model),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_items, beam, pe, d_model),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_items, beam, 1, d_model),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_items, beam, 1, d_model),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_items, beam, beam * pe),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((block_items, beam, d_model),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(kg.shape, kg.dtype),
                jax.ShapeDtypeStruct(vg.shape, vg.dtype),
                jax.ShapeDtypeStruct((num_items, beam, d_model), q.dtype),
            ),
            input_output_aliases={2: 0, 3: 1},
            scratch_shapes=[
                pltpu.VMEM((block_items, beam, 8, d_model), cache_k.dtype),
                pltpu.VMEM((block_items, beam, 8, d_model), cache_v.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 2 ** 20,
            ),
        )(pos_arr, qg, kg, vg, knew, vnew, bias_flat)
    return (out.reshape(rows, d_model),
            kc.reshape(rows, p, d_model),
            vc.reshape(rows, p, d_model))


def _kernel_native4d_update_canon(pos_ref, q_ref, sk_ref, sv_ref, k_ref,
                                  v_ref, knew_ref, vnew_ref, biassh_ref,
                                  biaswin_ref, kout_ref, vout_ref, out_ref,
                                  kwin_ref, vwin_ref, kw_ref, vw_ref,
                                  sem_k, sem_v, *, n_heads,
                                  scale, block_items, c, w):
    """Shared-ancestor-prefix attention FUSED with the cache column write.

    Beam branches' ancestries coalesce fast under the reference's
    stochastic survivor sampling — measured at the char serving config,
    only ~16-19% of the per-slot cache entries streamed by the full-width
    kernel are reachable by any live branch (~1.2 distinct ancestor slots
    per position). The engine therefore gathers each coalesced item's
    unique ancestor path into a per-item ``shared`` cache at phase
    boundaries (models/caption_models.py _canonicalize_state) and this
    kernel attends over:

      * ``shared[:, :c]``  — ONE row per canonical position (1/beam of
        the full-width bytes), bias = per-item validity (``biassh``,
        [bi, 1, c]); all live branches agree there, so no per-branch
        selection is needed, and
      * the per-slot cache WINDOW ``[c, c+w)`` — the still-diverging
        tip, with the usual flat ancestry bias (``biaswin``,
        [bi, beam, beam*w]).

    The per-slot caches stay in ANY/HBM space (they are input->output
    aliased whole); only the window is DMAd into VMEM scratch — a
    BlockSpec cannot express the ``[c, c+w)`` offset (block offsets are
    multiples of the block size), a manual ``pl.ds(c, w)`` copy can.
    The fresh K/V column lands in the window (c <= pos < c+w); same
    substitute + 8-tile writeback as _kernel_native4d_update. Items
    whose live branches do NOT all agree below ``c`` (stragglers) get
    garbage outputs here (their ``shared`` rows are stale); the engine
    overwrites their rows from the full-width kernel
    (:func:`ancestry_attention_ids`). Softmax runs as an explicit
    two-piece max/denominator pass — a lane-axis concat of the (c) and
    (beam*w) energy tiles would force a Mosaic relayout.
    """
    pos = pos_ref[0]
    grid_i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    bi, beam, d_model = q_ref.shape
    head_dim = d_model // n_heads
    inv_scale = 1.0 / scale
    row0 = grid_i * block_items
    slot = jax.lax.rem(grid_i, 2)
    nxt_slot = jax.lax.rem(grid_i + 1, 2)

    def _win_copy(block, buf_slot):
        r0 = block * block_items
        dk = pltpu.make_async_copy(
            k_ref.at[pl.ds(r0, bi), :, pl.ds(c, w), :],
            kwin_ref.at[buf_slot], sem_k.at[buf_slot])
        dv = pltpu.make_async_copy(
            v_ref.at[pl.ds(r0, bi), :, pl.ds(c, w), :],
            vwin_ref.at[buf_slot], sem_v.at[buf_slot])
        return dk, dv

    # cross-block DOUBLE BUFFERING of the manual window DMA. BlockSpec
    # inputs (shared prefix, biases) pipeline across grid steps
    # automatically; a manual copy does not — started and waited inside
    # one block, it stalls every block on HBM latency (measured ~2x
    # bandwidth loss vs the full-width kernel's streamed reads). Block i
    # therefore starts block i+1's window copy into the other buffer
    # before computing, and waits on the copy block i-1 started for it.
    @pl.when(grid_i == 0)
    def _start_first():
        dk, dv = _win_copy(grid_i, slot)
        dk.start()
        dv.start()

    @pl.when(grid_i + 1 < n_blocks)
    def _prefetch_next():
        dk, dv = _win_copy(grid_i + 1, nxt_slot)
        dk.start()
        dv.start()

    # block-diagonal masked queries (see _kernel_native4d_update)
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (bi, n_heads * beam, d_model), 2)
    hrow = jax.lax.broadcasted_iota(
        jnp.int32, (bi, n_heads * beam, d_model), 1) // beam
    qt = jnp.concatenate([q_ref[:]] * n_heads, axis=1)
    q_all = jnp.where(lane // head_dim == hrow, qt, 0).astype(q_ref.dtype)

    e_sh = jax.lax.dot_general(
        q_all, sk_ref[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * inv_scale + biassh_ref[:]               # [bi, H*beam, c] (+[bi,1,c])

    dk_in, dv_in = _win_copy(grid_i, slot)
    dk_in.wait()
    dv_in.wait()
    kwin = kwin_ref[slot]                        # [bi, beam, w, D]
    vwin = vwin_ref[slot]
    # substitute the fresh column into the (small) window blocks
    sel = jax.lax.broadcasted_iota(jnp.int32, (bi, beam, w, 1), 2) == pos - c
    kb = jnp.where(sel, knew_ref[:].astype(kwin.dtype), kwin)
    vb = jnp.where(sel, vnew_ref[:].astype(vwin.dtype), vwin)
    kb2 = kb.reshape(bi, beam * w, d_model)
    vb2 = vb.reshape(bi, beam * w, d_model)

    e_win = jax.lax.dot_general(
        q_all, kb2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * inv_scale + jnp.concatenate(
        [biaswin_ref[:]] * n_heads, axis=1)      # [bi, H*beam, beam*w]

    # two-piece softmax over the concatenated support
    m = jnp.maximum(jnp.max(e_sh, axis=2, keepdims=True),
                    jnp.max(e_win, axis=2, keepdims=True))
    w_sh = jnp.exp(e_sh - m)
    w_wn = jnp.exp(e_win - m)
    denom = (jnp.sum(w_sh, axis=2, keepdims=True)
             + jnp.sum(w_wn, axis=2, keepdims=True))
    out_all = (
        jax.lax.dot_general(
            w_sh.astype(sv_ref.dtype), sv_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            w_wn.astype(vb2.dtype), vb2,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    ) / denom                                    # [bi, H*beam, D]
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        out_ref[:, :, sl] = out_all[
            :, h * beam:(h + 1) * beam, sl].astype(out_ref.dtype)

    # writeback: substitute the fresh column into the touched 8-tile of
    # the window scratch, DMA it back at its ABSOLUTE position
    tile_abs = pl.multiple_of((pos // 8) * 8, 8)
    tile_win = pl.multiple_of(tile_abs - c, 8)
    sel8 = jax.lax.broadcasted_iota(jnp.int32, (bi, beam, 8, 1),
                                    2) == pos % 8
    # re-read the touched 8-tile from the window SCRATCH REF with a
    # dynamic sublane-aligned pl.ds — a dynamic_slice of the loaded
    # VALUE does not lower on Mosaic TC (hardware-verified
    # NotImplementedError; same constraint the full-width kernel
    # documents for its staging copy)
    kw_ref[:] = jnp.where(
        sel8, knew_ref[:].astype(kw_ref.dtype),
        kwin_ref[slot, :, :, pl.ds(tile_win, 8), :])
    vw_ref[:] = jnp.where(
        sel8, vnew_ref[:].astype(vw_ref.dtype),
        vwin_ref[slot, :, :, pl.ds(tile_win, 8), :])
    # this block's window-input DMAs completed above — their slot's
    # semaphores are free to carry the writeback (sflag channels are a
    # scarce program-wide resource; phases x layers multiply every
    # semaphore this kernel declares); the next block's prefetch rides
    # the OTHER slot's semaphores
    dk_out = pltpu.make_async_copy(
        kw_ref, kout_ref.at[pl.ds(row0, bi), :, pl.ds(tile_abs, 8), :],
        sem_k.at[slot])
    dv_out = pltpu.make_async_copy(
        vw_ref, vout_ref.at[pl.ds(row0, bi), :, pl.ds(tile_abs, 8), :],
        sem_v.at[slot])
    dk_out.start()
    dv_out.start()
    dk_out.wait()
    dv_out.wait()


@functools.partial(
    jax.jit,
    static_argnames=("beam", "n_heads", "c", "p_eff", "block_items",
                     "interpret"),
)
def ancestry_attention_update_canon(q, cache_k, cache_v, shared_k, shared_v,
                                    k_new, v_new, bias_shared, bias_win,
                                    pos, *, beam, n_heads, c, p_eff,
                                    block_items=None, interpret=False,
                                    live_items=None):
    """Fused cache write + shared-prefix attention (canonical items).

    Args:
        q, k_new/v_new: ``[B*beam, D]``.
        cache_k/cache_v: ``[B*beam, P, D]`` per-slot caches (aliased,
            updated in place at ``pos``); only the window ``[c, p_eff)``
            is streamed.
        shared_k/shared_v: ``[B, >=c, D]`` canonical ancestor caches
            (read-only); positions ``[0, c)`` streamed.
        bias_shared: ``[B, 1, c]`` f32 per-item validity bias.
        bias_win: ``[B, beam, beam*(p_eff-c)]`` f32 ancestry+validity
            bias for the window.
        pos: int32 decode position, ``c <= pos < p_eff``.
        c: static canonical length (multiple of 8, >= 8).
        p_eff: static read budget (multiple of 8, > c, <= P).
        live_items: traced int32 — dynamic grid over live item blocks.

    Returns:
        (attention out ``[B*beam, D]``, cache_k, cache_v).
    """
    rows, p, d_model = cache_k.shape
    num_items = rows // beam
    head_dim = d_model // n_heads
    scale = float(head_dim) ** 0.5
    p_eff = min(p_eff, p)
    assert p % 8 == 0 and c % 8 == 0 and p_eff % 8 == 0, (p, c, p_eff)
    assert 8 <= c < p_eff <= p, (c, p_eff, p)
    w = p_eff - c

    if interpret:
        # emulate without aliasing: manual column update + XLA reference
        ck = jax.lax.dynamic_update_slice_in_dim(
            cache_k, k_new.astype(cache_k.dtype)[:, None, :], pos, axis=1)
        cv = jax.lax.dynamic_update_slice_in_dim(
            cache_v, v_new.astype(cache_v.dtype)[:, None, :], pos, axis=1)
        out = _canon_attention_reference(
            q, ck, cv, shared_k, shared_v, bias_shared, bias_win,
            beam=beam, n_heads=n_heads, c=c, p_eff=p_eff)
        return out, ck, cv

    _check_fused_width(d_model, "ancestry_attention_update_canon")
    if block_items is None:
        block_items = 16 if (c + beam * w) <= 16 * 48 else 8
    block_items = _pick_block_items(block_items, num_items, beam)

    qg = q.reshape(num_items, beam, d_model)
    kg = cache_k.reshape(num_items, beam, p, d_model)
    vg = cache_v.reshape(num_items, beam, p, d_model)
    knew = k_new.astype(cache_k.dtype).reshape(num_items, beam, 1, d_model)
    vnew = v_new.astype(cache_v.dtype).reshape(num_items, beam, 1, d_model)

    n_blocks = num_items // block_items
    if live_items is None:
        grid = (n_blocks,)
    else:
        nlive = jnp.clip(
            (jnp.asarray(live_items, jnp.int32) + block_items - 1)
            // block_items, 1, n_blocks)
        grid = (nlive,)

    kernel = functools.partial(
        _kernel_native4d_update_canon, n_heads=n_heads, scale=scale,
        block_items=block_items, c=c, w=w,
    )
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    kc, vc, out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_items, beam, d_model),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_items, c, d_model),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_items, c, d_model),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((block_items, beam, 1, d_model),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_items, beam, 1, d_model),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_items, 1, c),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_items, beam, beam * w),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((block_items, beam, d_model),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(kg.shape, kg.dtype),
            jax.ShapeDtypeStruct(vg.shape, vg.dtype),
            jax.ShapeDtypeStruct((num_items, beam, d_model), q.dtype),
        ),
        input_output_aliases={4: 0, 5: 1},
        scratch_shapes=[
            # window buffers + sems are 2-slot arrays: cross-block
            # double buffering of the manual window DMA (see kernel)
            pltpu.VMEM((2, block_items, beam, w, d_model), cache_k.dtype),
            pltpu.VMEM((2, block_items, beam, w, d_model), cache_v.dtype),
            pltpu.VMEM((block_items, beam, 8, d_model), cache_k.dtype),
            pltpu.VMEM((block_items, beam, 8, d_model), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 2 ** 20,
        ),
    )(pos_arr, qg, shared_k[:, :c], shared_v[:, :c], kg, vg, knew, vnew,
      bias_shared, bias_win)
    return (out.reshape(rows, d_model),
            kc.reshape(rows, p, d_model),
            vc.reshape(rows, p, d_model))


def _canon_attention_reference(q, cache_k, cache_v, shared_k, shared_v,
                               bias_shared, bias_win, *, beam, n_heads, c,
                               p_eff):
    """XLA reference of the canonical kernel's math (tests + interpret)."""
    rows, p, d_model = cache_k.shape
    num_items = rows // beam
    head_dim = d_model // n_heads
    scale = float(head_dim) ** 0.5
    w = p_eff - c

    qh = q.reshape(num_items, beam, n_heads, head_dim)
    sk = shared_k[:, :c].reshape(num_items, c, n_heads, head_dim)
    sv = shared_v[:, :c].reshape(num_items, c, n_heads, head_dim)
    wk = cache_k.reshape(num_items, beam, p, d_model)[:, :, c:p_eff]
    wv = cache_v.reshape(num_items, beam, p, d_model)[:, :, c:p_eff]
    wk = wk.reshape(num_items, beam * w, n_heads, head_dim)
    wv = wv.reshape(num_items, beam * w, n_heads, head_dim)

    e_sh = jnp.einsum("bjhd,bchd->bjhc", qh, sk).astype(jnp.float32)
    e_sh = e_sh / scale + bias_shared[:, :, None, :]
    e_wn = jnp.einsum("bjhd,bwhd->bjhw", qh, wk).astype(jnp.float32)
    e_wn = e_wn / scale + bias_win[:, :, None, :]
    e = jnp.concatenate([e_sh, e_wn], axis=-1)
    attn = jax.nn.softmax(e, axis=-1)
    out = (
        jnp.einsum("bjhc,bchd->bjhd", attn[..., :c].astype(sv.dtype), sv)
        + jnp.einsum("bjhw,bwhd->bjhd", attn[..., c:].astype(wv.dtype), wv)
    )
    return out.reshape(rows, d_model).astype(q.dtype)


def _kernel_native4d_ids(ids_ref, q_ref, k_ref, v_ref, bias_ref, out_ref,
                         e_ref, *, n_heads, scale):
    # scalar-prefetch indirection wrapper: the grid walks a LIST of item
    # ids (the engine's stragglers), every BlockSpec looks its item up in
    # ids_ref, and the body is the plain read-only native4d kernel
    del ids_ref
    _kernel_native4d(q_ref, k_ref, v_ref, bias_ref, out_ref, e_ref,
                     n_heads=n_heads, scale=scale)


@functools.partial(
    jax.jit,
    static_argnames=("beam", "n_heads", "p_eff", "interpret"),
)
def ancestry_attention_ids(q, cache_k, cache_v, bias, item_ids, n_sel, *,
                           beam, n_heads, p_eff=None, interpret=False):
    """Full-width ancestry attention over a SELECTED list of items.

    The canonical-prefix serving path (ancestry_attention_update_canon)
    computes garbage for straggler items (live branches that still
    disagree below ``c``); this kernel recomputes exactly those items
    full-width via scalar-prefetch BlockSpec indirection — one grid step
    per selected item, no permutation of the caches.

    Args:
        q, cache_k/cache_v, bias: as :func:`ancestry_attention` (bias is
            the full flat ``[B, beam, beam*P]`` step bias).
        item_ids: int32 ``[B]`` — item indices to compute; entries past
            ``n_sel`` are ignored (the grid never reaches them).
        n_sel: traced int32 — number of leading ``item_ids`` to run
            (clamped to [1, B]; with 0 stragglers the single wasted
            block computes a correct full-width row the caller's mask
            discards).

    Returns:
        ``[B*beam, D]`` — rows of selected items hold full-width
        attention; all other rows are UNINITIALIZED garbage (the caller
        merges by mask).
    """
    rows, p, d_model = cache_k.shape
    num_items = rows // beam
    head_dim = d_model // n_heads
    scale = float(head_dim) ** 0.5
    pe = p if p_eff is None else min(p_eff, p)
    assert pe == p or pe % 8 == 0, (pe, p)

    if interpret:
        # full compute on every item (ids ignored): the caller's mask
        # selects the same values the indirect kernel would produce
        return ancestry_attention(
            q, cache_k, cache_v, bias, beam=beam, n_heads=n_heads,
            interpret=True, p_eff=p_eff)

    qg = q.reshape(num_items, beam, d_model)
    kg = cache_k.reshape(num_items, beam, p, d_model)
    vg = cache_v.reshape(num_items, beam, p, d_model)
    bias4 = bias.reshape(num_items, beam, beam, p)
    kernel = functools.partial(_kernel_native4d_ids, n_heads=n_heads,
                               scale=scale)
    nsel = jnp.clip(jnp.asarray(n_sel, jnp.int32), 1, num_items)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsel,),
            in_specs=[
                pl.BlockSpec((1, beam, d_model),
                             lambda i, ids: (ids[i], 0, 0)),
                pl.BlockSpec((1, beam, pe, d_model),
                             lambda i, ids: (ids[i], 0, 0, 0)),
                pl.BlockSpec((1, beam, pe, d_model),
                             lambda i, ids: (ids[i], 0, 0, 0)),
                pl.BlockSpec((1, beam, beam, p),
                             lambda i, ids: (ids[i], 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, beam, d_model),
                                   lambda i, ids: (ids[i], 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, beam, beam, pe), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_items, beam, d_model), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
    )(item_ids.astype(jnp.int32), qg, kg, vg, bias4)
    return out.reshape(rows, d_model)


def _kernel_cross(q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                  n_heads, scale):
    # grouped single-step cross-attention: beam rows share their item's
    # encoder K/V (transformer._grouped_attention). Same all-heads
    # block-diagonal-masked-query trick as the self-attention kernel:
    # ONE QK dot and ONE AV dot per block over the full d_model
    # contraction instead of 2 skinny dots per head. Early-EOS
    # compaction: the wrapper sizes the grid to the live block count.
    inv_scale = 1.0 / scale
    _, r, d_model = q_ref.shape
    bi = q_ref.shape[0]
    head_dim = d_model // n_heads

    lane = jax.lax.broadcasted_iota(
        jnp.int32, (bi, n_heads * r, d_model), 2)
    hrow = jax.lax.broadcasted_iota(
        jnp.int32, (bi, n_heads * r, d_model), 1) // r
    qt = jnp.concatenate([q_ref[:]] * n_heads, axis=1)
    q_all = jnp.where(lane // head_dim == hrow, qt, 0).astype(
        q_ref.dtype)

    e = jax.lax.dot_general(
        q_all, k_ref[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * inv_scale + bias_ref[:]               # [bi, H*r, T] (+ [bi,1,T])
    attn = jax.nn.softmax(e, axis=-1).astype(v_ref.dtype)
    out_all = jax.lax.dot_general(
        attn, v_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                         # [bi, H*r, D]
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        out_ref[:, :, sl] = out_all[:, h * r:(h + 1) * r, sl].astype(
            out_ref.dtype)


def _kernel_cross_packed(q_ref, k_ref, v_ref, bias_ref, maskc_ref,
                         out_ref, *, n_heads, scale, ng):
    # Packed variant of _kernel_cross (WORD_PERF lever #5): the batched
    # per-item dots are [H*r, D] x [D, T] stubs whose 40x49 outputs fill
    # ~12% of an MXU tile — the kernel measures ~20% of its byte floor
    # (benchmarks/cross_sweep.py). Here ``ng`` items fuse into ONE
    # block-diagonal dot pair per subgroup: rows = ng*H*r, cols = ng*T
    # (T padded to the 8-sublane tile so the in-kernel (item, T) merge is
    # tile-aligned — the same merge class the native4d kernel lowers).
    # Cross-item energies and the T padding are masked via an ADDITIVE
    # -1e30 constant mask streamed once (a grid-constant block — building
    # it in-kernel from iotas re-ran 4 integer passes over the energy
    # shape every grid step); ng*x the MACs of the useful computation,
    # but the MXU tiles are dense instead of 88% padding.
    inv_scale = 1.0 / scale
    bi, r, d_model = q_ref.shape
    t_pad = k_ref.shape[1]
    bsub = bi // ng
    head_dim = d_model // n_heads
    hr = n_heads * r

    lane = jax.lax.broadcasted_iota(jnp.int32, (bi, hr, d_model), 2)
    hrow = jax.lax.broadcasted_iota(jnp.int32, (bi, hr, d_model), 1) // r
    qt = jnp.concatenate([q_ref[:]] * n_heads, axis=1)
    q_all = jnp.where(lane // head_dim == hrow, qt, 0).astype(q_ref.dtype)

    # tile-aligned merges: hr and t_pad are both multiples of 8
    qp = q_all.reshape(bsub, ng * hr, d_model)
    kp = k_ref[:].reshape(bsub, ng * t_pad, d_model)
    vp = v_ref[:].reshape(bsub, ng * t_pad, d_model)

    e = jax.lax.dot_general(
        qp, kp,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * inv_scale + bias_ref[:] + maskc_ref[:]   # [bsub, ng*hr, ng*t_pad]
    attn = jax.nn.softmax(e, axis=-1).astype(vp.dtype)
    out_all = jax.lax.dot_general(
        attn, vp,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                        # [bsub, ng*hr, D]
    o = out_all.reshape(bi, hr, d_model)
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        out_ref[:, :, sl] = o[:, h * r:(h + 1) * r, sl].astype(
            out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("groups", "n_heads", "block_items", "interpret",
                     "pack_items", "t_real"),
)
def grouped_cross_attention(q, ek, ev, bias, *, groups, n_heads,
                            block_items=16, interpret=False,
                            live_items=None, pack_items=None, t_real=None):
    """Single-query cross-attention of ``G*r`` rows over per-group K/V.

    Args:
        q: ``[G*r, D]`` pre-projected queries (r = rows per group).
        ek/ev: ``[G, T, D]`` per-group encoder keys/values (pre-projected,
            loop-invariant across decode steps).
        bias: ``[G, 1, T]`` f32 additive mask (0 or -1e8), or None.
        live_items: optional traced int32 — live-group count (groups past
            it skip compute and input DMA; see ancestry_attention_update).
        pack_items: fuse this many items into one block-diagonal dot pair
            (``_kernel_cross_packed``); requires ``ek``/``ev`` padded so
            T is a multiple of 8 (``precompute_cross_attention(...,
            pad_to_tile=True)``) and ``(n_heads * r) % 8 == 0``. ``bias``
            must cover the SAME (padded) T as ``ek``/``ev``.
        t_real: with ``pack_items``, the number of VALID encoder
            positions — REQUIRED when ``pack_items`` is set (columns in
            ``[t_real, T)`` are masked in-kernel; without it zero-valued
            pad K columns would silently receive softmax weight).

    Returns:
        ``[G*r, D]`` attention output (pre output-projection).
    """
    rows, d_model = q.shape
    g, t, _ = ek.shape
    r = rows // g
    head_dim = d_model // n_heads
    scale = float(head_dim) ** 0.5

    if pack_items is not None and pack_items > 1:
        if t % 8 or (n_heads * r) % 8:
            raise ValueError(
                f"pack_items needs tile-aligned merges: T={t} and "
                f"n_heads*r={n_heads * r} must be multiples of 8 "
                f"(pad the cross store: precompute_cross_attention(..., "
                f"pad_to_tile=True))")
        if t_real is None:
            raise ValueError(
                "pack_items requires t_real (the count of valid encoder "
                "positions): tile-padded ek/ev carry zero K columns that "
                "would silently receive softmax weight if unmasked")
        return _cross_packed(q, ek, ev, bias, g=g, r=r, t=t,
                             d_model=d_model, n_heads=n_heads, scale=scale,
                             block_items=block_items, ng=pack_items,
                             t_real=t_real,
                             interpret=interpret, live_items=live_items)

    if bias is None:
        bias = jnp.zeros((g, 1, t), jnp.float32)

    block_items = _pick_block_items(block_items, g, r)

    n_blocks = g // block_items
    if live_items is None:
        grid = (n_blocks,)
    else:
        # dynamic grid: dead (compacted-suffix) groups never iterate
        nlive = jnp.clip(
            (jnp.asarray(live_items, jnp.int32) + block_items - 1)
            // block_items, 1, n_blocks)
        grid = (nlive,)

    qg = q.reshape(g, r, d_model)
    kernel = functools.partial(_kernel_cross, n_heads=n_heads, scale=scale)

    if interpret:
        ctx = pltpu.force_tpu_interpret_mode()
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_items, r, d_model), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_items, t, d_model), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_items, t, d_model), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_items, 1, t), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_items, r, d_model),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, r, d_model), q.dtype),
        )(qg, ek, ev, bias)
    return out.reshape(rows, d_model)


def _cross_packed(q, ek, ev, bias, *, g, r, t, d_model, n_heads, scale,
                  block_items, ng, t_real, interpret, live_items):
    # dispatch for grouped_cross_attention(pack_items=ng): grid over item
    # blocks; each block runs block_items/ng fused block-diagonal dots
    if bias is None:
        bias_p = jnp.zeros((g // ng, 1, ng * t), jnp.float32)
    else:
        if bias.shape[-1] != t:
            raise ValueError(
                f"pack_items bias must cover the same (padded) T as "
                f"ek/ev: bias T={bias.shape[-1]} vs ek T={t}. Pad the "
                f"bias columns (any value — pad columns are re-masked "
                f"in-kernel via t_real).")
        # row-major: (G, 1, T) -> (G/ng, 1, ng*T) concatenates each ng
        # consecutive items' bias rows along the last axis — exactly the
        # packed energy's column order
        bias_p = bias.reshape(g // ng, 1, ng * t)

    # grid-constant additive mask: -1e30 on cross-item energies and the
    # T padding, 0 on each row-item's own valid columns (tiny, built in
    # XLA once; the constant index map fetches it a single time)
    hr = n_heads * r
    row_item = jnp.arange(ng * hr, dtype=jnp.int32)[:, None] // hr
    col = jnp.arange(ng * t, dtype=jnp.int32)[None, :]
    ok = jnp.logical_and(row_item == col // t, col % t < t_real)
    maskc = jnp.where(ok, 0.0, -1e30).astype(jnp.float32)[None]

    bi = _pick_packed_block_items(block_items, g, r, ng)
    n_blocks = g // bi
    if live_items is None:
        grid = (n_blocks,)
    else:
        nlive = jnp.clip(
            (jnp.asarray(live_items, jnp.int32) + bi - 1) // bi,
            1, n_blocks)
        grid = (nlive,)

    qg = q.reshape(g, r, d_model)
    kernel = functools.partial(_kernel_cross_packed, n_heads=n_heads,
                               scale=scale, ng=ng)
    if interpret:
        ctx = pltpu.force_tpu_interpret_mode()
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bi, r, d_model), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bi, t, d_model), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bi, t, d_model), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bi // ng, 1, ng * t), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ng * hr, ng * t), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bi, r, d_model), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, r, d_model), q.dtype),
        )(qg, ek, ev, bias_p, maskc)
    return out.reshape(g * r, d_model)


def _kernel_native4d_flash(pos_ref, q_ref, k_ref, v_ref, knew_ref,
                           vnew_ref, bias_ref, kout_ref, vout_ref, out_ref,
                           e_ref, m3_ref, m4_ref, l3_ref, acc_ref, kw_ref,
                           vw_ref, sem_k, sem_v, *, n_heads, scale,
                           block_items):
    """native4d fused-update attention with position-staged tile reads.

    Grid is (item_blocks, position_tiles). The k/v/bias index maps clamp
    the tile index to ``pos // 8`` — Pallas skips the DMA when the block
    index repeats, so cache tiles beyond the current decode position
    NEVER leave HBM (~40% of the K/V traffic averaged over a generation,
    without the lax.switch that breaks aliasing). Softmax accumulates
    across tiles flash-style; tiles past the live prefix skip compute
    under ``pl.when`` (their clamped re-read would double-count).

    Mosaic cannot rank-cast vectors, so the flash max state is kept in
    BOTH 3-D ([bi, beam, heads] for the [bi, beam, hd] accumulator math)
    and 4-D ([bi, beam, 1, heads] for the [bi, beam, beam, 8] energy
    math); the two are updated with identical values.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    pos = pos_ref[0]
    needed = pos // 8
    bi, beam, pt, d_model = k_ref.shape       # pt == 8
    head_dim = d_model // n_heads
    inv_scale = 1.0 / scale

    @pl.when(j == 0)
    def _init():
        m3_ref[:] = jnp.full_like(m3_ref, -1e30)
        m4_ref[:] = jnp.full_like(m4_ref, -1e30)
        l3_ref[:] = jnp.zeros_like(l3_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j <= needed)
    def _update():
        # fresh-column substitute: hits only in the tile containing pos
        sel = jax.lax.broadcasted_iota(
            jnp.int32, (bi, beam, pt, d_model), 2) == pos - j * pt
        kb = jnp.where(sel, knew_ref[:].astype(k_ref.dtype), k_ref[:])
        vb = jnp.where(sel, vnew_ref[:].astype(v_ref.dtype), v_ref[:])

        # write the updated tile back in place (aliased caches)
        @pl.when(j == needed)
        def _writeback():
            grid_i = pl.program_id(0)
            row0 = grid_i * block_items
            tile = pl.multiple_of(needed * pt, pt)
            kw_ref[:] = kb
            vw_ref[:] = vb
            dk = pltpu.make_async_copy(
                kw_ref, kout_ref.at[pl.ds(row0, bi), :, pl.ds(tile, pt), :],
                sem_k)
            dv = pltpu.make_async_copy(
                vw_ref, vout_ref.at[pl.ds(row0, bi), :, pl.ds(tile, pt), :],
                sem_v)
            dk.start()
            dv.start()
            dk.wait()
            dv.wait()

        for h in range(n_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q_h = q_ref[:, :, sl]
            for i in range(beam):
                e = jax.lax.dot_general(
                    q_h, kb[:, i, :, sl],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                                     # [bi, beam, 8]
                e_ref[:, :, i, :] = (e * inv_scale
                                     + bias_ref[:, 0, :, i, :])
            e_all = e_ref[:]                          # [bi, beam, beam, 8]

            # chunk max in both ranks (identical values)
            m_c4 = jnp.max(jnp.max(e_all, axis=3, keepdims=True), axis=2,
                           keepdims=True)             # [bi, beam, 1, 1]
            m_c3 = jnp.max(jnp.max(e_all, axis=3), axis=2,
                           keepdims=True)             # [bi, beam, 1]

            m_o4 = m4_ref[:, :, :, h:h + 1]
            m_o3 = m3_ref[:, :, h:h + 1]
            m_n4 = jnp.maximum(m_o4, m_c4)
            m_n3 = jnp.maximum(m_o3, m_c3)
            alpha3 = jnp.exp(m_o3 - m_n3)             # [bi, beam, 1]

            w = jnp.exp(e_all - m_n4)                 # [bi, beam, beam, 8]
            psum3 = jnp.sum(jnp.sum(w, axis=3), axis=2, keepdims=True)
            l3_ref[:, :, h:h + 1] = l3_ref[:, :, h:h + 1] * alpha3 + psum3
            m4_ref[:, :, :, h:h + 1] = m_n4
            m3_ref[:, :, h:h + 1] = m_n3

            wv = w.astype(vb.dtype)
            part = None
            for i in range(beam):
                pp = jax.lax.dot_general(
                    wv[:, :, i, :], vb[:, i, :, sl],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                                     # [bi, beam, hd]
                part = pp if part is None else part + pp
            acc_ref[:, :, sl] = acc_ref[:, :, sl] * alpha3 + part

    @pl.when(j == nj - 1)
    def _finalize():
        for h in range(n_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            out_ref[:, :, sl] = (
                acc_ref[:, :, sl] / l3_ref[:, :, h:h + 1]
            ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("beam", "n_heads", "block_items", "interpret"),
)
def ancestry_attention_update_flash(q, cache_k, cache_v, k_new, v_new,
                                    bias, pos, *, beam, n_heads,
                                    block_items=16, interpret=False):
    """Position-staged variant of :func:`ancestry_attention_update`.

    Same contract; the cache is read in 8-position tiles with the grid
    clamped to the live prefix, so early decode steps only stream the
    cache they have actually written.

    NEGATIVE RESULT (kept for reference, not on the serving path): the
    per-tile flash bookkeeping multiplies the kernel's dot/reduction
    issue count by the tile count — measured 6.1 ms/step at late decode
    positions vs 2.85 for the single-pass fused kernel, far outweighing
    the early-step DMA savings (2.61 vs 2.85 at pos<8). The engine uses
    :func:`ancestry_attention_update`.
    """
    rows, p, d_model = cache_k.shape
    num_items = rows // beam
    head_dim = d_model // n_heads
    scale = float(head_dim) ** 0.5
    assert p % 8 == 0, p
    n_tiles = p // 8

    if not interpret:
        _check_fused_width(d_model, "ancestry_attention_update_flash")
    block_items = _pick_block_items(block_items, num_items, beam)
    bi = block_items

    qg = q.reshape(num_items, beam, d_model)
    kg = cache_k.reshape(num_items, beam, p, d_model)
    vg = cache_v.reshape(num_items, beam, p, d_model)
    knew = k_new.astype(cache_k.dtype).reshape(num_items, beam, 1, d_model)
    vnew = v_new.astype(cache_v.dtype).reshape(num_items, beam, 1, d_model)
    # tile axis LEADING so each grid step can address one 8-position tile
    # (a trailing tile block would violate the 128-lane block rule)
    bias5 = bias.reshape(num_items, beam, beam, n_tiles, 8).transpose(
        0, 3, 1, 2, 4)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    def clamp(i, j, pos_ref):
        return (i, 0, jnp.minimum(j, pos_ref[0] // 8), 0)

    kernel = functools.partial(
        _kernel_native4d_flash, n_heads=n_heads, scale=scale,
        block_items=bi,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_items // bi, n_tiles),
        in_specs=[
            pl.BlockSpec((bi, beam, d_model), lambda i, j, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, beam, 8, d_model), clamp,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, beam, 8, d_model), clamp,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, beam, 1, d_model),
                         lambda i, j, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, beam, 1, d_model),
                         lambda i, j, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, 1, beam, beam, 8),
                         lambda i, j, s: (
                             i, jnp.minimum(j, s[0] // 8), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bi, beam, d_model), lambda i, j, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bi, beam, beam, 8), jnp.float32),
            pltpu.VMEM((bi, beam, n_heads), jnp.float32),
            pltpu.VMEM((bi, beam, 1, n_heads), jnp.float32),
            pltpu.VMEM((bi, beam, n_heads), jnp.float32),
            pltpu.VMEM((bi, beam, d_model), jnp.float32),
            pltpu.VMEM((bi, beam, 8, d_model), cache_k.dtype),
            pltpu.VMEM((bi, beam, 8, d_model), cache_v.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    if interpret:
        ctx = pltpu.force_tpu_interpret_mode()
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        kc, vc, out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(kg.shape, kg.dtype),
                jax.ShapeDtypeStruct(vg.shape, vg.dtype),
                jax.ShapeDtypeStruct((num_items, beam, d_model), q.dtype),
            ),
            input_output_aliases={2: 0, 3: 1},
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=64 * 2 ** 20,
            ),
        )(pos_arr, qg, kg, vg, knew, vnew, bias5)
    return (out.reshape(rows, d_model),
            kc.reshape(rows, p, d_model),
            vc.reshape(rows, p, d_model))

"""Fused top-k filter + Gumbel-top-k sampling as a Pallas TPU kernel.

The generation engine's per-step hot op is "filter logits to the top-K,
then draw `beam` tokens without replacement from softmax(filtered/T)"
(reference semantics, beam.py:32-48). The XLA path needs a vocab-wide
top-k sort (`lax.top_k` / `approx_max_k`) — the single most expensive op
of the decode step at serving batch sizes.

This kernel exploits that the sampler never needs the *sorted* top-K set,
only the K-th largest VALUE as a threshold:

1. exact K-th-largest per row via a 31-step bitwise threshold search on
   the total-order integer image of f32 (pure VPU compare+sum passes over
   a VMEM-resident block — no sort),
2. ties at the threshold are kept, which is EXACTLY the reference's
   ``logits < kth`` filter (beam.py:33-35) — stricter parity than a
   top-k set,
3. Gumbel noise from the on-core PRNG perturbs the surviving logits
   (UNK masked), and ``beam`` successive masked argmax passes emit the
   sample — distribution-identical to multinomial-without-replacement.

Returns (token ids, their raw logit values) so the engine's score
normalization (log_softmax over the gathered values) stays outside in f32
XLA. Used on the stochastic serving path; greedy/parity paths keep the
exact XLA sort. PRNG: the on-core generator differs from jax.random, so
draws differ sample-by-sample from the XLA path while sampling the same
distribution; a fixed seed is fully deterministic.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_topk_gumbel_sample", "fused_classifier_topk_gumbel_sample"]

import os

# threshold-search warm start (see _sample_body): measured -10% kernel
# runtime but ~5x Mosaic compile time at the word headline shape —
# opt-in only
_WARMSTART = os.environ.get("DH_SAMPLER_WARMSTART", "0") == "1"

# where the standalone sampler gets the drawn ids' raw logits:
# "gather" (default) recomputes them outside via a [rows, V] HBM
# take_along_axis; "kernel" emits them from the kernel (num_draws
# hit+max passes over the VMEM block). Read once at import — it changes
# the traced program.
_SAMPLER_VALS = os.environ.get("DH_SAMPLER_VALS", "gather")

# plain Python literals: jnp scalars at module level would be captured as
# constants by the kernel tracer (pallas requires literals or ref inputs)
_NEG_LARGE = -3.0e38
_INT_MIN = -2147483648


def _order_key(x_f32):
    """Monotone map f32 -> int32: signed-int order == float order."""
    i = pltpu.bitcast(x_f32, jnp.int32)
    return jnp.where(i < 0, i ^ jnp.int32(0x7FFFFFFF), i)


def _kernel(seed_ref, invt_ref, logits_ref, ids_ref, *,
            top_k, num_draws, unk_index, vocab):
    # decorrelate programs; same seed -> same draw
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    # bf16 inputs occupy only the top 16 bits of the f32 order key, so the
    # threshold search below can stop at bit 15 — the dominant cost of the
    # kernel is these count passes over [rows, V], and this halves them
    low_bits = 15 if logits_ref.dtype == jnp.bfloat16 else 0
    logits = logits_ref[:].astype(jnp.float32)  # [rows, V]
    _sample_body(invt_ref, logits, low_bits, ids_ref, top_k=top_k,
                 num_draws=num_draws, unk_index=unk_index, vocab=vocab)


def _kernel_with_vals(seed_ref, invt_ref, logits_ref, ids_ref, vals_ref, *,
                      top_k, num_draws, unk_index, vocab):
    # standalone sampler emitting the drawn ids' raw logits in-kernel
    # (DH_SAMPLER_VALS=kernel): kills the outside [rows, V] HBM gather +
    # its OOB-validation chain, at the cost of num_draws hit+max passes
    # over the VMEM-resident [block, V] logits
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    low_bits = 15 if logits_ref.dtype == jnp.bfloat16 else 0
    logits = logits_ref[:].astype(jnp.float32)
    _sample_body(invt_ref, logits, low_bits, ids_ref, vals_ref,
                 top_k=top_k, num_draws=num_draws, unk_index=unk_index,
                 vocab=vocab)


def _kernel_fused_classifier(seed_ref, invt_ref, x_ref, w_ref, b_ref,
                             ids_ref, vals_ref, *, top_k, num_draws,
                             unk_index, vocab):
    """Classifier matmul + sampler in ONE kernel: the [rows, V] logits
    live only in VMEM, never round-tripping HBM between the decoder and
    the draw (~150 MB/step at serving batch). The fresh logits are
    rounded to bf16 so the draw is numerically identical to the separate
    bf16-classifier + sampler path (and the threshold search keeps its
    16-bit length). Early-EOS compaction: the wrapper sizes the grid to
    the live row-block count; dead blocks never run (their stale output
    rows are discarded by the engine's ended-branch masking)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    logits = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:]
    logits = logits.astype(jnp.bfloat16).astype(jnp.float32)
    _sample_body(invt_ref, logits, 15, ids_ref, vals_ref, top_k=top_k,
                 num_draws=num_draws, unk_index=unk_index, vocab=vocab)


def _sample_body(invt_ref, logits, low_bits, ids_ref, vals_ref=None, *,
                 top_k, num_draws, unk_index, vocab):
    rows = logits.shape[0]
    keys = _order_key(logits)

    # ---- exact K-th largest value per row: bitwise threshold search ----
    # t := max t s.t. count(keys >= t) >= K  (== the K-th largest key)
    cnt_nonneg = jnp.sum((keys >= 0).astype(jnp.int32), axis=1,
                         keepdims=True)
    t = jnp.where(cnt_nonneg >= top_k, 0, _INT_MIN).astype(jnp.int32)

    # WARM START (exact): skip the refine bits both bounds agree on.
    #   L = the K-th largest LANE-CLASS max (m128[l] = max over columns
    #       l, l+128, l+256, ... — 128-aligned lane slices folded with
    #       elementwise max, no cross-lane reshape, one read pass). The
    #       top-K lane-class maxes are K distinct elements >= L, so
    #       count(keys >= L) >= K  =>  L <= T (the true K-th largest).
    #   U = row max  =>  T <= U.
    # Any value in [L, U] shares L/U's common binary prefix, so the
    # refine may START from t0 = that prefix (bit-OR refinement from a
    # correct prefix is idempotent over the prefix bits) at the first
    # differing bit. The per-block trip start is the max over rows —
    # rows with longer shared prefixes re-derive a few of their own bits
    # (harmless). Rows where even the SIGN differs (top-K straddles 0.0)
    # fall back to the cnt_nonneg init and pin the trip start at bit 30.
    # Costs ~1 extra read pass + a [rows, 128]-wide search; saves
    # (shared-prefix bits) full count passes. MEASURED (docs/WORD_PERF
    # lever 3): isolated sampler 4.01 -> 3.61 ms (-10%) at the word
    # headline shape, but Mosaic compile time for the kernel grows ~5x
    # (60 s -> 280 s; the full serving program goes 13 -> 45+ min),
    # which no serving deployment amortizes sanely. Default OFF —
    # opt in with DH_SAMPLER_WARMSTART=1.
    if (_WARMSTART and vocab % 128 == 0 and vocab // 128 >= top_k):
        m128 = keys[:, 0:128]
        for cidx in range(1, vocab // 128):
            m128 = jnp.maximum(m128, keys[:, cidx * 128:(cidx + 1) * 128])
        cnt0 = jnp.sum((m128 >= 0).astype(jnp.int32), axis=1,
                       keepdims=True)
        lt = jnp.where(cnt0 >= top_k, 0, _INT_MIN).astype(jnp.int32)

        def refine_m(bit, lt):
            cand = lt | (jnp.int32(1) << bit)
            c = jnp.sum((m128 >= cand).astype(jnp.int32), axis=1,
                        keepdims=True)
            return jnp.where(c >= top_k, cand, lt)

        lt = jax.lax.fori_loop(0, 31 - low_bits,
                               lambda i, lt: refine_m(30 - i, lt), lt)
        u = jnp.max(m128, axis=1, keepdims=True)
        diff = lt ^ u
        sign_split = diff < 0
        smear = diff
        for s in (1, 2, 4, 8, 16):
            smear = smear | jax.lax.shift_right_logical(smear, s)
        t = jnp.where(sign_split, t, u & ~smear)
        # highest differing bit: smear+1 == 2^(hb+1) exactly (f32-exact
        # for hb <= 30; sign-split rows pin hb = 30, so the +1 overflow
        # case never reaches the exponent extract)
        hb = jnp.where(
            sign_split, 30,
            (pltpu.bitcast((smear + 1).astype(jnp.float32), jnp.int32)
             >> 23) - 128)
        # block trip start = the EARLIEST iteration any row needs: the
        # row with the highest differing bit (largest hb) dictates it
        start = jnp.min(jnp.int32(30) - hb)
    else:
        start = jnp.int32(0)

    def refine(bit, t):
        cand = t | (jnp.int32(1) << bit)
        cnt = jnp.sum((keys >= cand).astype(jnp.int32), axis=1,
                      keepdims=True)
        return jnp.where(cnt >= top_k, cand, t)

    # MSB-first (fori_loop counts up, so iterate bit = 30 - i)
    t = jax.lax.fori_loop(start, 31 - low_bits,
                          lambda i, t: refine(30 - i, t), t)

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, vocab), 1)
    keep = (keys >= t) & (col != unk_index)

    # ---- Gumbel perturb + `num_draws` masked argmax passes ----
    bits = pltpu.bitcast(pltpu.prng_random_bits((rows, vocab)), jnp.uint32)
    # uniform in (0, 1): 24 high bits / 2^24, floored away from 0
    # (uint32 -> f32 casts don't lower on TPU; the >>8 makes the value fit
    # int32, so bitcast + int cast is exact)
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = bits24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    u = jnp.maximum(u, jnp.float32(1e-10))
    gumbel = -jnp.log(-jnp.log(u))

    perturbed = jnp.where(keep, logits * invt_ref[0] + gumbel, _NEG_LARGE)

    # pack (perturbed order key, column) into ONE int32: the top bits
    # carry the key, the low ``col_bits`` the column (flipped so ties at
    # equal truncated keys resolve to the smallest column). argmax of
    # `packed` then yields BOTH the winner and its index in a single max
    # pass, and the winning element is unique by construction (columns
    # differ), so the without-replacement update needs no separate index
    # scan. Truncating the key's low bits can swap candidates whose
    # perturbed scores agree to ~2^-(18-col_bits) relative — a
    # second-order distributional effect (the swapped candidates were
    # near-equiprobable), acceptable on this stochastic serving path
    # (greedy/parity paths use exact XLA top-k upstream).
    col_bits = max(13, int(vocab - 1).bit_length())
    cmask = (1 << col_bits) - 1
    pcol = jnp.int32(cmask) - col
    packed = (_order_key(perturbed) & jnp.int32(~cmask)) | pcol
    # non-kept columns must be UNREACHABLE, not merely improbable: with
    # only _NEG_LARGE scoring they'd win once the kept support is
    # exhausted (fewer kept candidates than draws — possible when
    # beam_size == top_k and UNK sits inside the top-K set), emitting the
    # smallest filtered-out column, which can be UNK itself
    packed = jnp.where(keep, packed, _INT_MIN)

    # num_draws is small and static: unrolled packed-argmax extraction.
    # Packed values are DISTINCT by construction (columns differ), so the
    # j-th draw is simply the j-th largest packed value: max over
    # {packed < m_(j-1)} — the strictly-decreasing max chain folds the
    # without-replacement exclusion into the max pass's compare, so the
    # per-draw masked re-write of ``packed`` is gone entirely.
    # ``vals_ref``: the fused-classifier (small-vocab) path extracts the
    # drawn ids' raw logits in-kernel (the [rows, V] hit+max passes are
    # cheaper than an outside classifier-column gather at small V —
    # measured: char 626 vs 655 capt/s with the gather). The standalone
    # large-vocab path passes vals_ref=None and recomputes vals outside
    # (at V=29k each in-kernel extraction pass costs ~0.6 ms/step).
    m = None
    for j in range(num_draws):
        if m is None:
            m = jnp.max(packed, axis=1, keepdims=True)
        else:
            m = jnp.max(jnp.where(packed < m, packed, _INT_MIN),
                        axis=1, keepdims=True)
        idx = jnp.int32(cmask) - (m & jnp.int32(cmask))
        # degenerate row: fewer kept candidates than draws (possible when
        # beam_size == top_k and UNK sat inside the top-K set) — every
        # remaining packed entry is _INT_MIN and idx would decode to
        # cmask >= vocab. Emit column 0 instead (matches the pre-packing
        # kernel, which argmaxed an all-equal row to its first column).
        idx = jnp.where(m == _INT_MIN, 0, idx)
        ids_ref[:, j] = idx[:, 0]
        if vals_ref is not None:
            hit = col == idx
            val = jnp.max(jnp.where(hit, logits, _NEG_LARGE), axis=1,
                          keepdims=True)
            vals_ref[:, j] = val[:, 0]


def _block_and_pad(x, vocab, block_rows, vmem_budget):
    """Shared row-block sizing + padding: the kernel stages hold ~3 live
    f32 [block, V] arrays, so the row block shrinks for very large
    vocabularies to fit ``vmem_budget``; rows pad to a whole number of
    blocks (padded rows are sliced off the outputs)."""
    rows = x.shape[0]
    max_block = max(8, int(vmem_budget / (12 * vocab)) // 8 * 8)
    block = min(block_rows, max_block, rows)
    if rows % block != 0:
        x = jnp.pad(x, ((0, block - rows % block), (0, 0)))
    return x, block, x.shape[0]


def _row_grid(padded_rows, block, live_rows):
    """1-D row-block grid; with ``live_rows`` the grid is dynamic and
    dead (compacted-suffix) blocks never run."""
    n_blocks = padded_rows // block
    if live_rows is None:
        return (n_blocks,)
    nlive = jnp.clip(
        (jnp.asarray(live_rows, jnp.int32) + block - 1) // block,
        1, n_blocks)
    return (nlive,)


def _interpret_ctx(interpret):
    """TPU-specific primitives (prng_seed etc.) only interpret under the
    TPU interpreter context, not pallas_call(interpret=True)."""
    import contextlib

    return (pltpu.force_tpu_interpret_mode() if interpret
            else contextlib.nullcontext())


@functools.partial(
    jax.jit,
    static_argnames=("top_k", "num_draws", "unk_index", "block_rows",
                     "interpret"),
)
def fused_topk_gumbel_sample(logits, seed, inv_temperature, *, top_k,
                             num_draws, unk_index=1, block_rows=128,
                             interpret=False, live_rows=None):
    """Draws ``num_draws`` tokens/row ~ softmax(top_k_filter(logits)/T).

    Args:
        logits: ``[rows, V]`` (any float dtype; scored in f32).
        seed: int32 scalar — deterministic per value.
        inv_temperature: f32 scalar (traced).
        top_k: filter size (ties at the threshold kept).
        num_draws: tokens per row, without replacement.
        live_rows: optional traced int32 — live-row count; row blocks past
            it (a compacted-dead suffix) never run, returning stale
            garbage the engine masks (same contract as the fused
            classifier variant).

    Returns:
        (ids ``[rows, num_draws]`` int32,
         vals ``[rows, num_draws]`` f32 — raw logits at the drawn ids).
    """
    rows, vocab = logits.shape
    # a block holds ~3 live f32 [block, V] arrays (keys/perturbed/packed
    # stages); shrink the row block for very large vocabularies so they
    # fit the raised VMEM budget below
    max_block = max(8, int(80e6 / (12 * vocab)) // 8 * 8)
    block = min(block_rows, max_block, rows)
    if rows % block != 0:
        # pad rows to a whole number of blocks; extra rows are discarded
        pad = block - rows % block
        logits = jnp.pad(logits, ((0, pad), (0, 0)))
        padded_rows = rows + pad
    else:
        padded_rows = rows

    # output columns padded to the 128-lane tile
    out_cols = 128

    n_blocks = padded_rows // block
    if live_rows is None:
        grid = (n_blocks,)
    else:
        # dynamic grid: dead (compacted-suffix) row blocks never run
        nlive = jnp.clip(
            (jnp.asarray(live_rows, jnp.int32) + block - 1) // block,
            1, n_blocks)
        grid = (nlive,)
    extract_vals = _SAMPLER_VALS == "kernel"
    kernel = functools.partial(
        _kernel_with_vals if extract_vals else _kernel,
        top_k=top_k, num_draws=num_draws, unk_index=unk_index,
        vocab=vocab,
    )
    if interpret:
        # TPU-specific primitives (prng_seed etc.) only interpret under
        # the TPU interpreter context, not pallas_call(interpret=True)
        import contextlib

        ctx = pltpu.force_tpu_interpret_mode()
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        return _call(kernel, grid, block, vocab, out_cols, padded_rows,
                     rows, num_draws, logits, seed, inv_temperature,
                     extract_vals=extract_vals)


@functools.partial(
    jax.jit,
    static_argnames=("top_k", "num_draws", "unk_index", "block_rows",
                     "interpret"),
)
def fused_classifier_topk_gumbel_sample(x, w, b, seed, inv_temperature, *,
                                        top_k, num_draws, unk_index=1,
                                        block_rows=128, interpret=False,
                                        live_rows=None):
    """``fused_topk_gumbel_sample`` of ``x @ w + b`` without materializing
    the logits in HBM.

    Args:
        x: ``[rows, D]`` decoder hidden states (pre-classifier).
        w: ``[D, V]`` classifier weight (stays VMEM-resident across row
            blocks; the index map is constant so Pallas skips its re-DMA).
        b: ``[V]`` classifier bias.
        live_rows: optional traced int32 — live-row count; rows past it
            (a compacted-dead suffix) skip the matmul+draw and their
            hidden-state DMA, returning stale garbage the engine masks.
        Everything else as :func:`fused_topk_gumbel_sample`. The matmul
        accumulates in f32 and rounds to bf16 like an XLA bf16 matmul
        (the separate path adds the bias post-rounding, so individual
        logits may differ by one bf16 ulp — immaterial on this
        stochastic serving path).

    Returns:
        (ids ``[rows, num_draws]`` int32, vals ``[rows, num_draws]`` f32).
    """
    rows, d = x.shape
    vocab = w.shape[1]
    # 60e6 budget: the classifier weight [D, V] stays VMEM-resident on
    # top of the sampler stages
    x, block, padded_rows = _block_and_pad(x, vocab, block_rows, 60e6)
    out_cols = 128
    grid = _row_grid(padded_rows, block, live_rows)

    kernel = functools.partial(
        _kernel_fused_classifier, top_k=top_k, num_draws=num_draws,
        unk_index=unk_index, vocab=vocab,
    )
    with _interpret_ctx(interpret):
        ids, vals = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((block, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, vocab), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, vocab), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block, out_cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, out_cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((padded_rows, out_cols), jnp.int32),
                jax.ShapeDtypeStruct((padded_rows, out_cols), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20,
            ),
        )(
            jnp.asarray(seed, jnp.int32).reshape(1),
            jnp.asarray(inv_temperature, jnp.float32).reshape(1),
            # one dtype for the in-kernel dot (mixed f32 x bf16 operands
            # do not lower); the product is rounded to bf16 regardless
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            b.reshape(1, vocab).astype(jnp.float32),
        )
    return ids[:rows, :num_draws], vals[:rows, :num_draws]


def _call(kernel, grid, block, vocab, out_cols, padded_rows, rows,
          num_draws, logits, seed, inv_temperature, extract_vals=False):
    out_spec = pl.BlockSpec((block, out_cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [out_spec, out_spec] if extract_vals else [out_spec]
    out_shape = [jax.ShapeDtypeStruct((padded_rows, out_cols), jnp.int32)]
    if extract_vals:
        out_shape.append(
            jax.ShapeDtypeStruct((padded_rows, out_cols), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block, vocab), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(inv_temperature, jnp.float32).reshape(1),
        logits,
    )
    if extract_vals:
        ids, vals = out
        return ids[:rows, :num_draws], vals[:rows, :num_draws]
    [ids] = out
    ids = ids[:rows, :num_draws]
    # drawn ids' raw logits recomputed outside (see the fused variant —
    # and DH_SAMPLER_VALS=kernel for the in-kernel alternative)
    vals = jnp.take_along_axis(
        logits[:rows].astype(jnp.float32), ids, axis=1)
    return ids, vals

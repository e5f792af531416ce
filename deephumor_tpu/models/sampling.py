"""Batched beam-search generation engine.

TPU-native replacement for the reference's per-step Python beam loops
(/root/reference/deephumor/models/beam.py, rnn_models.py:48-143,
transformers.py:492-579 and 740-825). The entire token loop runs inside one
jitted ``lax.scan`` with static shapes: no per-step host syncs, no full
re-forward per step (decoders step over KV caches / carried LSTM state), and
the batch axis carries ``num_items * beam_size`` sequences at once.

Semantics reproduced from the reference sampler:

- top-k logit filtering keeping ties, UNK always masked (beam.py:32-37),
- temperature softmax + multinomial WITHOUT replacement for both the
  per-branch candidate draw and the survivor draw (beam.py:39-48; torch
  ``multinomial(p, k)`` defaults to no replacement). Implemented as
  Gumbel-top-k, which samples exactly the same distribution with explicit
  ``jax.random`` keys,
- per-step candidate scores = log_softmax over the k *gathered* logits
  (beam.py:79-80 — normalized over the sampled set, a reference quirk kept),
- ended branches contribute a single pad-token/score-0 continuation
  (beam.py:84-95): expressed statically as a [beam, beam] candidate matrix
  whose ended rows keep only column 0 (extra columns weighted -inf, which
  leaves the softmax unchanged — exact, not approximate),
- final output drawn from the surviving scores (rnn_models.py:140-142).

A deterministic ``greedy`` mode (argmax everywhere, UNK masked) is the
parity surface: on a beam of 1 it reproduces "repeated argmax of the
reference forward" token-for-token.

The engine is model-agnostic: the decoder is a ``step_fn(state, tokens) ->
(logits, state)`` whose state pytree leaves carry the flat
``num_items * beam`` batch on axis 0.
"""

import jax
import jax.numpy as jnp

from deephumor_tpu.data.vocab import EOS_ID, PAD_ID, UNK_ID

__all__ = ["filter_top_k", "gumbel_top_k", "beam_search"]

NEG_INF = -jnp.inf


def filter_top_k(logits, top_k, unk_index=UNK_ID):
    """Keeps logits >= the k-th largest (ties kept), masks UNK.

    Parity: reference beam.py:32-37 (everything below the k-th value and
    the UNK column become -inf).
    """
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    filtered = jnp.where(logits < kth, NEG_INF, logits)
    return filtered.at[..., unk_index].set(NEG_INF)


def gumbel_top_k(key, log_weights, k):
    """Samples k indices without replacement ~ softmax(log_weights).

    Gumbel-top-k: adding iid Gumbel noise and taking the top-k indices
    draws exactly the same joint distribution as sequential multinomial
    sampling without replacement (torch's default). -inf weights are never
    selected (provided k <= #finite entries).
    """
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, log_weights.shape, minval=1e-20, maxval=1.0)
    ))
    perturbed = jnp.where(jnp.isfinite(log_weights),
                          log_weights + gumbel, NEG_INF)
    return jax.lax.top_k(perturbed, k)[1]


def _select_k(key, log_weights, k, greedy):
    """Top-k indices: deterministic (greedy) or Gumbel-sampled."""
    if greedy:
        return jax.lax.top_k(log_weights, k)[1]
    return gumbel_top_k(key, log_weights, k)


def _topk_space_draw(key, logits, top_k, k, inv_t, greedy, unk_index,
                     sampler="exact", classifier=None, live_rows=None,
                     seed=None):
    """One full-vocab top-k selection, then candidate draw + scoring in the
    reduced K-space (the hot-path equivalent of filter_top_k + draw: a
    token outside the top-K has weight exp(-inf) = 0 either way, so
    sampling within the top-K set draws the identical distribution — and
    it costs ONE vocab-wide selection per step, with Gumbel noise over K
    instead of V entries).

    ``sampler``:
      - "exact": lax.top_k sort (the parity path; greedy always uses it),
      - "approx": lax.approx_max_k, recall 0.99 (serving),
      - "pallas": fused threshold-search + on-core-PRNG Gumbel kernel
        (deephumor_tpu/ops/pallas_sampler.py) — exact keep-ties top-k
        filter, fastest serving path; draws the same distribution with a
        different PRNG stream than jax.random.

    Returns (token_ids [..., k], scores [..., k]) where scores are the
    reference's log_softmax-over-the-k-gathered-values numbers
    (raw untempered logits — beam.py:79-80).
    """
    if sampler == "pallas" and not greedy:
        from deephumor_tpu.ops.pallas_sampler import (
            fused_classifier_topk_gumbel_sample, fused_topk_gumbel_sample)

        if seed is None:
            seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
        if classifier is not None and classifier[0].shape[1] > 16384:
            # LARGE vocab: the in-kernel classifier matmul runs at ~1/3
            # of XLA's matmul efficiency (measured 1.06 vs 0.49 ms at
            # V=29k, 4480 rows) — more than the [rows, V] HBM roundtrip
            # it avoids (~0.6 ms). Classify in XLA, sample the bf16
            # logits with the standalone kernel.
            w, b = classifier
            hidden = logits
            shape = hidden.shape[:-1] + (w.shape[1],)
            flat = (
                jax.lax.dot_general(
                    hidden.reshape(-1, hidden.shape[-1]).astype(
                        jnp.bfloat16),
                    w.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + b
            ).astype(jnp.bfloat16)
            tokens, vals = fused_topk_gumbel_sample(
                flat, seed, inv_t, top_k=top_k, num_draws=k,
                unk_index=unk_index, live_rows=live_rows,
            )
        elif classifier is not None:
            # ``logits`` is the pre-classifier hidden state; the matmul
            # runs inside the sampler kernel (logits never touch HBM)
            w, b = classifier
            hidden = logits
            shape = hidden.shape[:-1] + (w.shape[1],)
            tokens, vals = fused_classifier_topk_gumbel_sample(
                hidden.reshape(-1, hidden.shape[-1]), w, b, seed, inv_t,
                top_k=top_k, num_draws=k, unk_index=unk_index,
                live_rows=live_rows,
            )
        else:
            shape = logits.shape
            flat = logits.reshape(-1, shape[-1])
            tokens, vals = fused_topk_gumbel_sample(
                flat, seed, inv_t, top_k=top_k, num_draws=k,
                unk_index=unk_index, live_rows=live_rows,
            )
        scores = vals - jax.nn.logsumexp(vals, axis=-1, keepdims=True)
        out_shape = shape[:-1] + (k,)
        return tokens.reshape(out_shape), scores.reshape(out_shape)

    if classifier is not None:
        w, b = classifier
        logits = logits @ w + b

    if sampler == "approx" and not greedy:
        # TPU PartialReduce-based approximate top-k (recall 0.99) in the
        # decoder's compute dtype; occasionally swaps a boundary candidate
        vals, idx = jax.lax.approx_max_k(logits, top_k, recall_target=0.99)
    else:
        vals, idx = jax.lax.top_k(
            logits.astype(jnp.float32), top_k
        )  # [..., K] each
    vals = vals.astype(jnp.float32)
    vals = jnp.where(idx == unk_index, NEG_INF, vals)
    pick = _select_k(key, vals * inv_t, k, greedy)  # [..., k] in K-space
    picked_vals = jnp.take_along_axis(vals, pick, axis=-1)
    # Exhausted-support guard (the pallas kernel's bug class, fixed there
    # first): with beam_size == top_k and UNK inside the top-K set there
    # are fewer kept candidates than draws, so a draw can land on a
    # filtered (-inf) slot — silently emitting UNK, and producing NaN
    # scores at top_k == 1. Such draws fall back to the best unfiltered
    # candidate. A fully filtered row (top_k == 1 with UNK as argmax)
    # emits token 0 at score 0, matching the kernel's column-0 fallback
    # (the reference raises from torch.multinomial here, beam.py:46).
    best = jnp.argmax(vals, axis=-1, keepdims=True)
    pick = jnp.where(picked_vals == NEG_INF, best, pick)
    picked_vals = jnp.take_along_axis(vals, pick, axis=-1)
    tokens = jnp.take_along_axis(idx, pick, axis=-1)
    row_dead = picked_vals == NEG_INF  # only when EVERY candidate filtered
    tokens = jnp.where(row_dead, 0, tokens)
    picked_vals = jnp.where(row_dead, 0.0, picked_vals)
    scores = picked_vals - jax.nn.logsumexp(picked_vals, axis=-1,
                                            keepdims=True)
    return tokens, scores


def _flat_take(tree, idx):
    """Gathers axis-0 (flat batch) of every state leaf."""
    return jax.tree.map(lambda x: jnp.take(x, idx, axis=0), tree)


def beam_search(
    key,
    step_fn,
    state,
    init_logits,
    *,
    beam_size,
    top_k,
    temperature,
    max_len,
    prefix=None,
    prefix_len=0,
    greedy=False,
    sampler="exact",
    shuffle_fn=None,
    survivor_update_fn=None,
    phases=None,
    classifier=None,
    live_fn=None,
    compactors=None,
    finalize_fn=None,
    eos_index=EOS_ID,
    unk_index=UNK_ID,
    pad_index=PAD_ID,
):
    """Runs batched stochastic/greedy beam search.

    Args:
        key: PRNG key (ignored when ``greedy``).
        step_fn: ``(state, tokens[B*beam]) -> (logits[B*beam, V], state)``;
            state leaves are batched on axis 0 and already tiled to
            ``B * beam`` (every beam starts from the same prefill state).
        state: initial decoder state (post-prefill, tiled).
        init_logits: ``[B, V]`` logits predicting the first generated token
            (output of the prefill over image embedding + optional prefix).
        beam_size, top_k, temperature: sampler hyperparameters
            (``beam_size <= top_k`` as in the reference).
        max_len: total output length including any prefix (static).
        prefix: optional ``[B, prefix_len]`` fixed beginning tokens.
        prefix_len: its static length.
        greedy: deterministic argmax mode (parity surface).
        phases: optional ``[(last_step, step_fn), ...]`` — runs the token
            loop as SEQUENTIAL while_loops, switching step_fn once the
            step counter passes ``last_step`` (the final entry's bound is
            ignored; it covers the rest). Used to grow the decoder's
            static cache-read budget (p_eff) with the position so early
            steps never stream the untouched cache tail: phase boundaries
            are static, so the aliased in-place cache buffers thread
            through without the copies a per-step lax.switch would force.
            Results are IDENTICAL to the single-phase loop.
        classifier: optional ``(w [D, V], b [V])``. When given, step_fn
            returns the PRE-classifier hidden state ``[B*beam, D]`` and
            the classifier matmul runs inside the per-step draw (fused
            into the pallas sampler kernel when ``sampler='pallas'``;
            applied in XLA otherwise). ``init_logits`` stays actual
            logits either way.
        live_fn: optional ``state -> int32`` returning the LIVE-item
            count; forwarded to the fused sampler kernel so compacted-dead
            row blocks skip the draw (the model's step_fn reads the same
            count for its attention kernels).
        survivor_update_fn: optional fused replacement for the whole
            post-draw bookkeeping INCLUDING ``shuffle_fn``:
            ``(dec_state, new_idx, new_val, surv, ended, val, seq, pos)
            -> (dec_state, seq, val, ended, chosen)`` with raw
            (unmasked) sampler candidates — must reproduce the default
            op sequence exactly (ops/pallas_engine.fused_survivor_update
            is the provided implementation; tests pin equality). When
            given, ``shuffle_fn`` is not called.
        compactors: optional list aligned with ``phases[:-1]`` — each
            entry is ``fn(state, seq, val, ended) -> (state, seq, val,
            ended)`` (or None) applied at that phase boundary. Used for
            early-EOS row compaction: permute all-ended items to the
            batch tail so the live count shrinks the kernels' working
            set. Requires ``phases``.
        finalize_fn: optional ``(state, out_dict) -> out_dict`` applied
            to the result — e.g. undoing the compaction permutation so
            outputs land in caller order.

    Returns:
        dict with ``sequences [B, beam, max_len]``, ``scores [B, beam]``,
        ``chosen [B, max_len]`` (the reference's single sampled output),
        ``ended [B, beam]``.
    """
    if beam_size > top_k:
        raise ValueError(
            f"beam_size ({beam_size}) must be <= top_k ({top_k})"
        )
    num_items, vocab = init_logits.shape
    beam = beam_size
    inv_t = 1.0 / temperature
    # full-vocab logits stay in the decoder's compute dtype through top-k
    # selection; all scoring/bookkeeping beyond the selected K is f32
    # (inside _topk_space_draw)

    k_init, k_scan, k_final = jax.random.split(key, 3)

    # --- initial draw: beam tokens from the prefill logits (one branch) ---
    first_idx, first_val = _topk_space_draw(
        k_init, init_logits, top_k, beam, inv_t, greedy, unk_index,
        sampler=sampler,
    )  # [B, beam] each

    seq = jnp.full((num_items, beam, max_len), pad_index, jnp.int32)
    if prefix is not None and prefix_len > 0:
        seq = seq.at[:, :, :prefix_len].set(
            jnp.broadcast_to(prefix[:, None, :], (num_items, beam, prefix_len))
        )
    seq = seq.at[:, :, prefix_len].set(first_idx)
    val = first_val
    ended = first_idx == eos_index

    # candidate bookkeeping for the [beam, beam] static candidate matrix
    col = jnp.arange(beam)

    # token for generated step s sits at seq[:, :, prefix_len + s];
    # the scan iterates s = 1 .. steps-1 (step 0 drawn above)
    steps = max_len - prefix_len

    # per-step keys precomputed OUTSIDE the loop: the in-body chain
    # fold_in(fold_in(k_scan, s), 0/1) is 2-3 threefry op groups per
    # step — measured as a visible slice of the ~81 XLA ops/step of
    # engine glue at the char config. Same key VALUES (fold_in of the
    # same data), so draws are bit-identical; the body just indexes.
    if steps > 1:
        s_range = jnp.arange(1, steps)
        step_keys = jax.vmap(
            lambda s: jax.random.fold_in(k_scan, s))(s_range)
        draw_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, 0))(step_keys)
        surv_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, 1))(step_keys)
        draw_seeds = None
        if sampler == "pallas" and not greedy:
            # the pallas sampler's per-step int32 seed is also a pure
            # function of the draw key — precompute the whole ladder
            draw_seeds = jax.vmap(
                lambda k: jax.random.randint(k, (), 0, 2**31 - 1,
                                             jnp.int32))(draw_keys)
    else:
        draw_keys = surv_keys = draw_seeds = None

    def body(carry, xs, step_fn=step_fn):
        dec_state, seq, val, ended, s = carry

        pos = prefix_len + s - 1
        last = jax.lax.dynamic_index_in_dim(seq, pos, axis=2, keepdims=False)

        logits, dec_state = step_fn(dec_state, last.reshape(-1))

        # per-branch candidate draw: beam tokens per live branch. The draw
        # runs on the decoder's native 2D [rows, V] layout — reshaping the
        # full-vocab logits to [B, beam, V] first forces a tiled-layout
        # copy and slows approx_max_k >2x on TPU (measured).
        live_rows = None
        if live_fn is not None:
            live = live_fn(dec_state)
            if live is not None:
                live_rows = jnp.asarray(live, jnp.int32) * beam
        new_idx, new_val = _topk_space_draw(
            jnp.take(draw_keys, s - 1, axis=0), logits, top_k, beam,
            inv_t, greedy, unk_index, sampler=sampler,
            classifier=classifier, live_rows=live_rows,
            seed=(None if draw_seeds is None
                  else jnp.take(draw_seeds, s - 1)),
        )  # [B*beam, beam] each
        new_idx = new_idx.reshape(num_items, beam, beam)
        new_val = new_val.reshape(num_items, beam, beam)
        raw_idx, raw_val = new_idx, new_val

        # ended branches: single pad/0-score continuation in column 0
        new_idx = jnp.where(ended[..., None], pad_index, new_idx)
        new_val = jnp.where(ended[..., None], 0.0, new_val)
        valid = jnp.where(
            ended[..., None], col[None, None, :] == 0, True
        )  # [B, beam, beam]

        cand_val = val[..., None] + new_val
        cand_weight = jnp.where(valid, cand_val * inv_t, NEG_INF)

        # survivor draw over the flattened candidate set
        flat_weight = cand_weight.reshape(num_items, beam * beam)
        surv = _select_k(
            jnp.take(surv_keys, s - 1, axis=0), flat_weight, beam, greedy
        )  # [B, beam]

        if survivor_update_fn is not None:
            # fused path: one kernel does the masking, chosen/score
            # gathers, sequence append, ended propagation AND the
            # model's state shuffle (ops/pallas_engine)
            dec_state, seq, val, ended, _ = survivor_update_fn(
                dec_state, raw_idx, raw_val, surv, ended, val, seq,
                prefix_len + s)
            return (dec_state, seq, val, ended, s + 1), None

        branch = surv // beam

        flat_idx = new_idx.reshape(num_items, beam * beam)
        flat_val = cand_val.reshape(num_items, beam * beam)
        chosen_tok = jnp.take_along_axis(flat_idx, surv, axis=1)
        val = jnp.take_along_axis(flat_val, surv, axis=1)

        # reorder sequences/flags by surviving branch, append token
        seq = jnp.take_along_axis(seq, branch[..., None], axis=1)
        ended = jnp.take_along_axis(ended, branch, axis=1)
        seq = jax.lax.dynamic_update_index_in_dim(
            seq, chosen_tok, prefix_len + s, axis=2
        )
        ended = ended | (chosen_tok == eos_index)

        # shuffle decoder state to surviving branches. Default: flat batch
        # gather of every leaf; models may pass shuffle_fn to keep big
        # buffers (KV caches) unshuffled via ancestry tables.
        flat_branch = (
            jnp.arange(num_items)[:, None] * beam + branch
        ).reshape(-1)
        if shuffle_fn is not None:
            dec_state = shuffle_fn(dec_state, flat_branch, branch)
        else:
            dec_state = _flat_take(dec_state, flat_branch)

        return (dec_state, seq, val, ended, s + 1), None

    if steps > 1:
        # early-exit loop: the reference breaks when every branch has
        # ended (rnn_models.py:131-132) — here as the while condition, so
        # real workloads stop paying for steps after all beams hit EOS
        # (identical results to running the full length: ended branches
        # only ever append pads at score 0). With ``phases``, one
        # while_loop per phase runs back-to-back; an exhausted workload
        # falls through the remaining phases' conditions immediately.
        if phases is None:
            bounds_fns = [(steps - 1, step_fn)]
        else:
            bounds_fns = [(min(b, steps - 1), f) for b, f in phases[:-1]]
            bounds_fns.append((steps - 1, phases[-1][1]))
        if compactors is None:
            compactors = [None] * len(bounds_fns)
        else:
            compactors = list(compactors) + [None] * (
                len(bounds_fns) - len(compactors))

        carry = (state, seq, val, ended, jnp.int32(1))
        for (last_step, fn), compact in zip(bounds_fns, compactors):
            if not isinstance(last_step, int) or last_step < 1:
                continue

            def cond(carry, last_step=last_step):
                _, _, _, ended, s = carry
                return (s <= last_step) & ~jnp.all(ended)

            def while_body(carry, fn=fn):
                return body(carry, None, step_fn=fn)[0]

            carry = jax.lax.while_loop(cond, while_body, carry)
            if compact is not None:
                c_state, c_seq, c_val, c_ended, s = carry
                c_state, c_seq, c_val, c_ended = compact(
                    c_state, c_seq, c_val, c_ended)
                carry = (c_state, c_seq, c_val, c_ended, s)
        (state, seq, val, ended, _) = carry

    # final pick among surviving branches (rnn_models.py:140-142)
    final_idx = _select_k(k_final, val * inv_t, 1, greedy)[:, 0]
    chosen = jnp.take_along_axis(seq, final_idx[:, None, None], axis=1)[:, 0]

    out = {"sequences": seq, "scores": val, "chosen": chosen, "ended": ended}
    if finalize_fn is not None:
        out = finalize_fn(state, out)
    return out

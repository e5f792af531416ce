"""Fused beam-search survivor bookkeeping (one launch per step).

After the per-branch candidate draw, the engine's survivor update is
~10 small XLA ops per step (candidate masking, chosen-token/score
gathers, sequence gather+append, ended propagation, and the model's
ancestry/validity shuffles) — measured at ~0.33 ms/step of the char
config's 0.39 ms/step engine residual (benchmarks/char_ledger.py), all
launch latency: the data is ~12 MB/step. This kernel performs the whole
update in one ``pallas_call``.

Semantics (must match models/sampling.beam_search's body exactly; the
interpret path below IS that code and the tests pin equality).

Equality scope with the dynamic live grid (``live_items`` set, i.e.
compaction on): the per-step math is identical for every LIVE-PREFIX
item; all-ended items in the dead tail are handled differently but
equivalently. The XLA path keeps running the weighted survivor draw
over a dead item's frozen-score beams (a per-step beam permutation
that consumes PRNG draws batch-wide but leaves the score multiset and
every sequence unchanged), while skipped dead-tail blocks here stay
frozen in their aliased buffers. The final per-item caption draw
samples over the same frozen scores either way, so outputs are
DISTRIBUTIONALLY identical — but for a fixed key an early-dead item's
final ``chosen`` beam can differ between the fused and default
engines. Draw-for-draw equality is therefore guaranteed (and tested)
for live items, and for all items when compaction is off.

  branch[b,j], cand[b,j] = divmod(surv[b,j], beam)
  e               = ended[b, branch]
  chosen[b,j]     = pad_index            if e else new_idx[b, branch, cand]
  val'[b,j]       = val[b, branch]     (+ new_val[b, branch, cand] if not e)
  ended'[b,j]     = e | (chosen == eos_index)
  seq'[b,j,:]     = seq[b, branch, :];  seq'[b,j,pos] = chosen[b,j]
  anc'[b,j,:]     = anc[b, branch, :]                      (optional)
  valid'[b,j,:]   = valid[b, branch, :]                    (optional)

The beam-axis gathers run as beam-unrolled vector selects (beam is 5-10
in practice); the flat [beam*beam] candidate gathers as lane-masked
reductions. Reference counterpart: none (the reference's beam loop is
per-step Python — beam.py:59-108).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_survivor_update"]


def _reference_update(new_idx, new_val, surv, ended, val, seq, anc, valid,
                      pos, *, beam, eos_index, pad_index):
    """Pure-XLA form (the engine's original op sequence)."""
    num_items = surv.shape[0]
    new_idx_m = jnp.where(ended[..., None], pad_index, new_idx)
    cand_val = val[..., None] + jnp.where(ended[..., None], 0.0, new_val)
    branch = surv // beam
    flat_idx = new_idx_m.reshape(num_items, beam * beam)
    flat_val = cand_val.reshape(num_items, beam * beam)
    chosen = jnp.take_along_axis(flat_idx, surv, axis=1)
    val_out = jnp.take_along_axis(flat_val, surv, axis=1)
    seq_out = jnp.take_along_axis(seq, branch[..., None], axis=1)
    seq_out = jax.lax.dynamic_update_index_in_dim(
        seq_out, chosen, pos, axis=2)
    ended_out = jnp.take_along_axis(ended, branch, axis=1)
    ended_out = ended_out | (chosen == eos_index)
    anc_out = (None if anc is None else
               jnp.take_along_axis(anc, branch[..., None], axis=1))
    valid_out = (None if valid is None else
                 jnp.take_along_axis(valid, branch[..., None], axis=1))
    return chosen, val_out, ended_out, seq_out, anc_out, valid_out


def _kernel(pos_ref, idx_ref, nval_ref, surv_ref, ended_ref, val_ref,
            seq_ref, anc_ref, valid_ref, chosen_ref, valout_ref,
            endout_ref, seqout_ref, ancout_ref, validout_ref, *, beam,
            eos_index, pad_index):
    pos = pos_ref[0]
    bi = surv_ref.shape[0]

    surv = surv_ref[:]                                   # [bi, beam] i32
    branch = surv // beam
    cand = surv - branch * beam
    # bool selects lower through an unsupported i8->i1 truncation on
    # this Mosaic — all boolean logic runs in int32; stores go through
    # comparisons (cmpi emits i1 natively)
    ended = ended_ref[:].astype(jnp.int32)               # [bi, beam]
    idx_all = idx_ref[:]                                 # [bi, beam, beam]
    nval_all = nval_ref[:]
    val_all = val_ref[:]

    # candidate selection as a static (branch, cand) double loop on 2D
    # planes — Mosaic cannot shape-cast [bi, beam, beam] -> [bi, beam²],
    # and (branch, cand) pairs are unique per element so where-overwrite
    # accumulation is exact
    chosen = jnp.zeros((bi, beam), jnp.int32)
    val_out = jnp.zeros((bi, beam), jnp.float32)
    e_out = jnp.zeros((bi, beam), jnp.int32)
    for i in range(beam):
        e_i = ended[:, i:i + 1] != 0                     # [bi, 1]
        v_i = val_all[:, i:i + 1]
        e_val = ended[:, i:i + 1]
        for c in range(beam):
            m = (branch == i) & (cand == c)              # [bi, beam]
            idx_ic = jnp.where(e_i, pad_index, idx_all[:, i, c:c + 1])
            val_ic = v_i + jnp.where(e_i, 0.0, nval_all[:, i, c:c + 1])
            chosen = jnp.where(m, idx_ic, chosen)
            val_out = jnp.where(m, val_ic, val_out)
            e_out = jnp.where(m, e_val, e_out)
    chosen_ref[:] = chosen
    valout_ref[:] = val_out
    endout_ref[:] = (e_out != 0) | (chosen == eos_index)

    # beam-axis gathers, beam-unrolled selects (bool arrays routed
    # through int32 — see above)
    def gather_write(src_ref, dst_ref, is_bool):
        width = src_ref.shape[2]
        src = src_ref[:]
        if is_bool:
            src = src.astype(jnp.int32)
        for j in range(beam):
            m_col = branch[:, j:j + 1]                   # [bi, 1]
            acc = jnp.zeros((bi, width), jnp.int32 if is_bool
                            else src.dtype)
            for i in range(beam):
                acc = jnp.where(m_col == i, src[:, i, :], acc)
            dst_ref[:, j, :] = (acc != 0) if is_bool else acc

    gather_write(anc_ref, ancout_ref, False)
    gather_write(valid_ref, validout_ref, True)

    seq_w = seq_ref.shape[2]
    # preload BEFORE writing: seqout is aliased onto seq, so in-loop ref
    # reads would see rows already overwritten by earlier j iterations
    seq_all = seq_ref[:]
    lane_seq = jax.lax.broadcasted_iota(jnp.int32, (bi, seq_w), 1)
    for j in range(beam):
        m_col = branch[:, j:j + 1]
        acc = jnp.zeros((bi, seq_w), jnp.int32)
        for i in range(beam):
            acc = jnp.where(m_col == i, seq_all[:, i, :], acc)
        # append this step's token at pos
        acc = jnp.where(lane_seq == pos, chosen[:, j:j + 1], acc)
        seqout_ref[:, j, :] = acc


@functools.partial(
    jax.jit,
    static_argnames=("beam", "eos_index", "pad_index", "block_items",
                     "interpret"),
)
def fused_survivor_update(new_idx, new_val, surv, ended, val, seq, anc,
                          valid, pos, *, beam, eos_index, pad_index,
                          block_items=None, interpret=False,
                          live_items=None):
    """One-launch survivor update (see module docstring).

    Args:
        new_idx/new_val: ``[B, beam, beam]`` raw sampler candidates
            (ended-row masking happens in-kernel).
        surv: ``[B, beam]`` int32 flat candidate picks from the survivor
            draw.
        ended/val: ``[B, beam]`` bool / f32 (pre-update).
        seq: ``[B, beam, L]`` int32; ``pos`` indexes the write column.
        anc: ``[B, beam, P]`` int32 ancestry table.
        valid: ``[B, beam, P]`` bool (the engine's flat ``[B*beam, P]``
            reshaped by the caller).
        live_items: optional traced int32 — dead trailing item blocks
            are skipped (grid sized to the live prefix).

    Returns:
        (chosen ``[B, beam]`` i32, val', ended', seq', anc', valid').
    """
    num_items = surv.shape[0]
    val = val.astype(jnp.float32)
    new_val = new_val.astype(jnp.float32)

    if interpret:
        return _reference_update(
            new_idx, new_val, surv, ended, val, seq, anc, valid, pos,
            beam=beam, eos_index=eos_index, pad_index=pad_index)

    if block_items is None:
        block_items = 16
    from deephumor_tpu.ops.pallas_attention import _pick_block_items

    block_items = _pick_block_items(block_items, num_items, beam)
    n_blocks = num_items // block_items
    if live_items is None:
        grid = (n_blocks,)
    else:
        nlive = jnp.clip(
            (jnp.asarray(live_items, jnp.int32) + block_items - 1)
            // block_items, 1, n_blocks)
        grid = (nlive,)

    kernel = functools.partial(
        _kernel, beam=beam, eos_index=int(eos_index),
        pad_index=int(pad_index))
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    def bspec(*shape):
        return pl.BlockSpec((block_items,) + shape,
                            lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    seq_w, anc_w = seq.shape[2], anc.shape[2]
    chosen, val_o, ended_o, seq_o, anc_o, valid_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec(beam, beam), bspec(beam, beam), bspec(beam),
            bspec(beam), bspec(beam), bspec(beam, seq_w),
            bspec(beam, anc_w), bspec(beam, anc_w),
        ],
        out_specs=(bspec(beam), bspec(beam), bspec(beam),
                   bspec(beam, seq_w), bspec(beam, anc_w),
                   bspec(beam, anc_w)),
        out_shape=(
            jax.ShapeDtypeStruct((num_items, beam), jnp.int32),
            jax.ShapeDtypeStruct((num_items, beam), jnp.float32),
            jax.ShapeDtypeStruct((num_items, beam), jnp.bool_),
            jax.ShapeDtypeStruct((num_items, beam, seq_w), jnp.int32),
            jax.ShapeDtypeStruct((num_items, beam, anc_w), jnp.int32),
            jax.ShapeDtypeStruct((num_items, beam, anc_w), jnp.bool_),
        ),
        # in->out aliasing: with the dynamic live grid, SKIPPED (dead)
        # item blocks must keep their prior state — aliased buffers stay
        # frozen, which is exactly what the XLA path's writes produce
        # for all-ended items (pads at score 0, ended stays True).
        # ``chosen`` has no alias; dead rows are garbage and unread (the
        # next step's token comes from seq, not chosen).
        input_output_aliases={5: 1, 4: 2, 6: 3, 7: 4, 8: 5},
        interpret=False,
    )(pos_arr, new_idx, new_val, surv, ended, val, seq, anc, valid)
    return chosen, val_o, ended_o, seq_o, anc_o, valid_o

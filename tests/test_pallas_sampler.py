"""Fused Pallas top-k/Gumbel sampler — interpret-mode tests (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deephumor_tpu.ops.pallas_sampler import fused_topk_gumbel_sample

R, V, K, D = 16, 512, 16, 4


@pytest.fixture(scope="module")
def logits():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(R, V)).astype(np.float32))


def _sample(logits, seed=7, inv_t=1.0, top_k=K, num_draws=D, **kw):
    return fused_topk_gumbel_sample(
        logits, seed, inv_t, top_k=top_k, num_draws=num_draws,
        interpret=True, **kw,
    )


def test_draws_within_exact_topk(logits):
    ids, vals = _sample(logits)
    ids, vals = np.asarray(ids), np.asarray(vals)
    ref = np.asarray(logits)
    kth = np.sort(ref, axis=1)[:, -K]
    for r in range(R):
        for j in range(D):
            assert ref[r, ids[r, j]] >= kth[r] - 1e-6
            assert abs(vals[r, j] - ref[r, ids[r, j]]) < 1e-6


def test_no_replacement_and_unk_masked(logits):
    # force unk into the top-k set
    boosted = logits.at[:, 1].set(100.0)
    ids, _ = _sample(boosted)
    ids = np.asarray(ids)
    for r in range(R):
        assert len(set(ids[r].tolist())) == D
        assert 1 not in ids[r]


def test_deterministic(logits):
    # NOTE: the interpret-mode TPU PRNG is a stub that ignores the seed,
    # so seed-sensitivity and draw-distribution properties can only be
    # asserted on real hardware (validated on-chip; see bench/verify).
    a, _ = _sample(logits, seed=3)
    b, _ = _sample(logits, seed=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keep_ties_at_threshold():
    # 20 tied values at the top with top_k=16: only ties are eligible
    # (the reference's `logits < kth` filter semantics, beam.py:33-35)
    base = np.full((8, V), -5.0, np.float32)
    tie_cols = np.arange(40, 60)
    base[:, tie_cols] = 2.0
    ids, _ = _sample(jnp.asarray(base), seed=0, num_draws=8)
    seen = set(np.asarray(ids).reshape(-1).tolist())
    assert seen <= set(tie_cols.tolist())


def test_draws_only_from_filter_support():
    # everything outside top_k=3 must be unreachable
    row = np.full((8, V), -10.0, np.float32)
    row[:, :3] = [2.0, 1.0, 0.0]
    ids, _ = _sample(jnp.asarray(row), seed=0, top_k=3, num_draws=3)
    assert set(np.asarray(ids).reshape(-1).tolist()) <= {0, 1, 2}


def test_exhausted_support_stays_in_vocab():
    # beam_size == top_k with UNK inside the top-K: only top_k-1 kept
    # candidates exist, so the last draw's support is exhausted. The
    # packed argmax must emit an in-vocab id (column 0), not the decoded
    # column mask (>= vocab) — ADVICE r1 regression.
    row = np.full((8, V), -10.0, np.float32)
    row[:, :3] = [3.0, 2.0, 1.0]
    row[:, 1] = 4.0  # UNK on top, inside the top_k=3 set
    ids, _ = _sample(jnp.asarray(row), seed=0, top_k=3, num_draws=3)
    ids = np.asarray(ids)
    assert (ids >= 0).all() and (ids < V).all()
    assert not (ids == 1).any()
    # the two real candidates appear; the exhausted draw falls back to 0
    for r in range(ids.shape[0]):
        assert {0, 2} <= set(ids[r].tolist())


def test_row_padding():
    # rows not divisible by block_rows pad internally and slice back
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(5, V)).astype(np.float32))
    ids, vals = fused_topk_gumbel_sample(
        x, 0, 1.0, top_k=8, num_draws=2, block_rows=4, interpret=True
    )
    assert ids.shape == (5, 2) and vals.shape == (5, 2)


def test_fused_classifier_matches_separate_path():
    # x @ w + b computed in-kernel must draw from the same top-k support
    # (and report the same bf16-rounded logit values) as classifying
    # first and sampling the materialized logits
    from deephumor_tpu.ops.pallas_sampler import (
        fused_classifier_topk_gumbel_sample,
    )

    rng = np.random.default_rng(3)
    d = 32
    x = jnp.asarray(rng.normal(size=(R, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d, V)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))

    ids, vals = fused_classifier_topk_gumbel_sample(
        x, w, b, 5, 1.0, top_k=K, num_draws=D, interpret=True,
    )
    ids, vals = np.asarray(ids), np.asarray(vals)

    logits = np.asarray(
        (x.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16)
         + b.astype(jnp.float32)).astype(jnp.bfloat16).astype(jnp.float32)
    )
    kth = np.sort(logits, axis=1)[:, -K]
    for r in range(R):
        assert len(set(ids[r].tolist())) == D
        assert 1 not in ids[r]
        for j in range(D):
            # drawn ids live in the top-k set of the reference logits
            # (one bf16 ulp of slack at the threshold for the different
            # bias-add rounding)
            assert logits[r, ids[r, j]] >= kth[r] - 0.15
            assert abs(vals[r, j] - logits[r, ids[r, j]]) < 0.15


def test_live_rows_skips_dead_suffix_standalone():
    # the standalone kernel's dynamic grid: live-prefix rows draw exactly
    # as without live_rows; the dead suffix's content is unspecified
    # (engine masks it) but must not perturb live rows
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(16, V)).astype(np.float32))
    ids_full, vals_full = fused_topk_gumbel_sample(
        x, 9, 1.0, top_k=K, num_draws=D, block_rows=4, interpret=True)
    ids_live, vals_live = fused_topk_gumbel_sample(
        x, 9, 1.0, top_k=K, num_draws=D, block_rows=4, interpret=True,
        live_rows=jnp.int32(6))
    # 6 live rows -> ceil(6/4)=2 blocks -> first 8 rows computed
    np.testing.assert_array_equal(np.asarray(ids_full)[:8],
                                  np.asarray(ids_live)[:8])
    np.testing.assert_array_equal(np.asarray(vals_full)[:8],
                                  np.asarray(vals_live)[:8])


def test_warm_start_branch_exact_topk(monkeypatch):
    """The lane-class-max warm start (opt-in DH_SAMPLER_WARMSTART=1,
    vocab//128 >= top_k) must keep the draw support EXACTLY the
    reference top-k-with-ties set, including when the top-k straddles
    0.0 (sign-split fallback rows) and when ties sit at the threshold.

    The flag is read at trace time; the V=2048 shape below is unique to
    this test, so the jit cache cannot serve a stale no-warm-start
    trace."""
    import deephumor_tpu.ops.pallas_sampler as ps

    monkeypatch.setattr(ps, "_WARMSTART", True)
    rng = np.random.default_rng(3)
    V2, K2 = 2048, 8

    def support_ok(row, ids):
        kth = np.sort(row)[-K2]
        keep = set(np.flatnonzero((row >= kth) & (np.arange(V2) != 1)))
        assert set(ids) <= keep, (sorted(set(ids) - keep), kth)

    # (a) generic: all-positive top-k (long shared prefix)
    a = rng.normal(size=(8, V2)).astype(np.float32) + 10.0
    # (b) sign-split: top-k straddles zero per row
    b = rng.normal(size=(8, V2)).astype(np.float32) * 1e-3
    # (c) ties at the threshold
    c = rng.normal(size=(8, V2)).astype(np.float32)
    c[:, 100:120] = 5.0  # 20 tied values with top_k=8: all 20 eligible
    for mat in (a, b, c):
        ids, vals = fused_topk_gumbel_sample(
            jnp.asarray(mat), 11, 1.0, top_k=K2, num_draws=4,
            interpret=True)
        ids = np.asarray(ids)
        for r in range(mat.shape[0]):
            support_ok(mat[r], ids[r])
            # distinct draws (without replacement)
            assert len(set(ids[r])) == 4


def test_kernel_vals_match_gather(monkeypatch):
    """DH_SAMPLER_VALS=kernel: the in-kernel drawn-value extraction must
    produce the same (ids, vals) as the default outside gather. The flag
    is read at trace time; V=1027 below is unique to this test so the
    jit cache cannot serve a stale trace."""
    import deephumor_tpu.ops.pallas_sampler as ps

    rng = np.random.default_rng(11)
    logits = rng.normal(size=(24, 1027)).astype(np.float32)

    outs = {}
    for mode in ("gather", "kernel"):
        monkeypatch.setattr(ps, "_SAMPLER_VALS", mode)
        ids, vals = ps.fused_topk_gumbel_sample(
            jnp.asarray(logits), 7, 1.0, top_k=16, num_draws=5,
            block_rows=8, interpret=True)
        outs[mode] = (np.asarray(ids), np.asarray(vals))
        ps.fused_topk_gumbel_sample.clear_cache()

    np.testing.assert_array_equal(outs["gather"][0], outs["kernel"][0])
    np.testing.assert_allclose(outs["gather"][1], outs["kernel"][1],
                               atol=1e-6)

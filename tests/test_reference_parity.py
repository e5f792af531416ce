"""Parity against the REFERENCE'S OWN SOURCE (not transliterated oracles).

Loads the actual modules from /root/reference/deephumor — everything that
imports without torchvision: models/{beam,rnn_models,transformers}.py,
data/{vocab,tokenizers,utils}.py, experiments/{inference,metrics}.py — and
asserts this framework reproduces them:

(a) teacher-forced logits of LSTMDecoder / TransformerDecoder /
    SelfAttentionTransformerDecoder against converted state_dicts,
(b) ``BeamSearchHelper.process_logits`` step-for-step against the engine's
    candidate math (``_topk_space_draw`` + the [beam, beam] candidate
    matrix), with ``torch.multinomial`` patched to deterministic top-k so
    both sides draw identically,
(c) end-to-end generate token equality (greedy beam) for all three decoder
    families, driving the reference's own ``generate`` loops,
(d) tokenizer / vocab / clean_text / check_text / text_to_seq /
    seq_to_text / split_caption byte-equality on a corpus sample, and
    ``perplexity`` numeric parity.

The torch_oracles.py transliterations remain for the torchvision-dependent
ImageEncoder; for every other module the parity claim now rests on the
reference's own code (round-2 VERDICT item #1).

Loading notes: the reference modules do absolute imports
(``from deephumor.models.beam import BeamSearchHelper``,
``from deephumor.data import SPECIAL_TOKENS``) that our compat shim maps to
THIS framework's modules — so during exec the test temporarily seeds
sys.modules with the reference's own modules and restores the shim after.
``langdetect`` (imported at module level by data/utils.py) is stubbed when
absent; clean_text/check_text don't use it.
"""

import importlib.util
import re
import sys
import types
from contextlib import contextmanager

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deephumor_tpu.convert.torch_import import (
    _convert_lstm,
    _convert_transformer_decoder,
    _embedding,
    _linear,
)
from deephumor_tpu.data import tokenizers as our_tokenizers
from deephumor_tpu.data import utils as our_data_utils
from deephumor_tpu.data import vocab as our_vocab
from deephumor_tpu.experiments import inference as our_inference
from deephumor_tpu.experiments import metrics as our_metrics
from deephumor_tpu.models import (
    CaptioningLSTM,
    CaptioningTransformer,
    CaptioningTransformerBase,
)
from deephumor_tpu.models import lstm as our_lstm
from deephumor_tpu.models import transformer as our_tfm
from deephumor_tpu.models.sampling import NEG_INF, _topk_space_draw

REF = "/root/reference/deephumor"

UNK, EOS = 1, 3


# ---------------------------------------------------------------------------
# Reference-source loading
# ---------------------------------------------------------------------------

@contextmanager
def _seeded_modules(mapping):
    """Temporarily places ``mapping`` into sys.modules (restoring previous
    entries after) so the reference's absolute imports resolve to the
    reference's own modules rather than our compat shim."""
    saved = {}
    for name, mod in mapping.items():
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    try:
        yield
    finally:
        for name, prev in saved.items():
            if prev is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = prev


# sha256 pins for every reference file executed below (ADVICE r3: the
# reference tree is untrusted public content and exec_module runs with
# full test privileges — refuse to execute anything that drifted from
# the audited bytes).
_REF_SHA256 = {
    "data/vocab.py":
        "366549e4c30e9e138b57456dc65958c985a4154d03943810c106c6ed0c265ab2",
    "data/tokenizers.py":
        "5a67ec0e4b1f16130cf2c4c18b2fd8ab54f1a7e1dee2dbc8ab46756be39836b6",
    "data/utils.py":
        "41a1d2f8198dbf006974b302f5a3d7d2c73cd0397584dad48bb5bf4bb855e39f",
    "models/beam.py":
        "dadf1e77a51b5d4ebedf3f87fdc739c581551852f4761ed4743146b36269e94f",
    "models/rnn_models.py":
        "873b0b3520c9e9d42d6587288f64792d8646e34877e7436756f23a98637c1c71",
    "models/transformers.py":
        "87407fff650616cba40bd0abfd936109227b6580ece3754a0ffc2f035ef9082d",
    "experiments/metrics.py":
        "09bb71db347f56e9ce6cbb0b9171a7c18c216e8ab14611ecee1545c552642240",
    "experiments/inference.py":
        "ab10a0bfb998db69c5f42d496c7b0c466f005b25850c44ceee71d61410e7e467",
}


def _exec_file(alias, path, deps=None):
    import hashlib

    rel = path[len(REF) + 1:]
    want = _REF_SHA256[rel]  # KeyError = unaudited file; add a pin first
    got = hashlib.sha256(open(path, "rb").read()).hexdigest()
    assert got == want, (
        f"reference file {rel} drifted from its audited pin "
        f"({got} != {want}); re-audit before executing it in-process")
    spec = importlib.util.spec_from_file_location(alias, path)
    mod = importlib.util.module_from_spec(spec)
    with _seeded_modules(deps or {}):
        sys.modules[alias] = mod
        try:
            spec.loader.exec_module(mod)
        finally:
            sys.modules.pop(alias, None)
    return mod


_REF_CACHE = {}


def load_reference():
    """Loads the reference's torchvision-free modules once per process."""
    if _REF_CACHE:
        return _REF_CACHE
    r = _REF_CACHE
    r["vocab"] = _exec_file("_ref_vocab", f"{REF}/data/vocab.py")
    r["tokenizers"] = _exec_file("_ref_tokenizers", f"{REF}/data/tokenizers.py")

    deps = {}
    if importlib.util.find_spec("langdetect") is None:
        stub = types.ModuleType("langdetect")
        stub.detect_langs = lambda text: (_ for _ in ()).throw(
            RuntimeError("langdetect stubbed in tests"))
        deps["langdetect"] = stub
    r["data_utils"] = _exec_file("_ref_data_utils", f"{REF}/data/utils.py",
                                 deps)

    r["beam"] = _exec_file("_ref_beam", f"{REF}/models/beam.py")
    beam_pkg = {"deephumor.models.beam": r["beam"]}
    r["rnn"] = _exec_file("_ref_rnn", f"{REF}/models/rnn_models.py", beam_pkg)
    r["tfm"] = _exec_file("_ref_tfm", f"{REF}/models/transformers.py",
                          beam_pkg)

    fake_data = types.ModuleType("deephumor.data")
    fake_data.SPECIAL_TOKENS = r["vocab"].SPECIAL_TOKENS
    r["inference"] = _exec_file("_ref_inference",
                                f"{REF}/experiments/inference.py",
                                {"deephumor.data": fake_data})
    r["metrics"] = _exec_file("_ref_metrics", f"{REF}/experiments/metrics.py")
    return r


@contextmanager
def _greedy_multinomial():
    """Patches torch.multinomial with deterministic top-k-by-probability.

    Makes the reference's stochastic beam a deterministic beam: every
    ``sample_k_indices`` call picks the k most probable entries in
    probability order — exactly what the engine's greedy mode
    (``_select_k`` via lax.top_k over tempered log-weights) picks, since
    softmax is monotone. Both sides then walk identical beams.
    """
    orig = torch.multinomial

    def topk_pick(input, num_samples, *args, **kwargs):
        return torch.topk(input, num_samples, dim=-1).indices

    torch.multinomial = topk_pick
    try:
        yield
    finally:
        torch.multinomial = orig


CORPUS = [
    "WHEN YOU SEE IT <sep> you'll know",
    "one does not simply <sep> walk into mordor",
    "y u no <emp> respond?!",
    "i don't always test my code... but when i do, i do it in prod",
    "<bos> leading special <eos>",
    "multiple   spaces\tand\ttabs",
    "punct!!!! runs????? $$$$# mixed.!?",
    "UPPER lower MiXeD 123 42nd",
    "quotes \"inside\" and 'apostrophes' can't won't",
    "hyphen-ated co-op re-entry",
    "trailing sep <sep>",
    "<sep> leading sep",
    "a <sep> b <sep> c <sep> d",
    "parens (like this) [and this] {and this}",
    "emoji \U0001f602 unicode café naïve",
    "|pipes| and <angle> brackets\\ backslash",
    "dots... two.. one. none",
    "semi;colons:and/slashes@at#hash",
    "   leading and trailing whitespace   ",
    "short",
    "",
    "repeated repeated repeated words words",
    "numbers 1 22 333 4444 55555",
]


# ---------------------------------------------------------------------------
# (d) text stack byte-parity
# ---------------------------------------------------------------------------

def test_tokenizers_match_reference_source():
    ref = load_reference()
    rw, rc = ref["tokenizers"].WordPunctTokenizer(), ref["tokenizers"].CharTokenizer()
    ow, oc = our_tokenizers.WordPunctTokenizer(), our_tokenizers.CharTokenizer()
    for text in CORPUS:
        assert ow.tokenize(text) == rw.tokenize(text), text
        assert oc.tokenize(text) == rc.tokenize(text), text
        low = text.lower()
        assert ow.tokenize(low) == rw.tokenize(low), low
        assert oc.tokenize(low) == rc.tokenize(low), low


def test_vocab_matches_reference_source():
    ref = load_reference()
    assert our_vocab.SPECIAL_TOKENS == ref["vocab"].SPECIAL_TOKENS

    for tok_cls in ("WordPunctTokenizer", "CharTokenizer"):
        for min_df in (1, 2, 3):
            rv = ref["vocab"].build_vocab(
                CORPUS, getattr(ref["tokenizers"], tok_cls)(), min_df=min_df)
            ov = our_vocab.build_vocab(
                CORPUS, getattr(our_tokenizers, tok_cls)(), min_df=min_df)
            assert list(ov.tokens) == list(rv.tokens), (tok_cls, min_df)
            assert dict(ov.stoi) == dict(rv.stoi)
            assert dict(ov.itos) == dict(rv.itos)

    # direct Vocab construction ordering (specials first, rest sorted).
    # Unique tokens only: on duplicates the reference keeps both copies
    # (inconsistent stoi/itos, vocab.py:18-22) while ours dedups — a
    # documented divergence; build_vocab always feeds unique tokens.
    tokens = ["zeta", "alpha", "<eos>", "mm", "<pad>", "b"]
    assert list(our_vocab.Vocab(tokens).tokens) == list(
        ref["vocab"].Vocab(tokens).tokens)


def test_vocab_file_roundtrip_matches_reference_source(tmp_path):
    ref = load_reference()
    tsv = tmp_path / "captions_train.txt"
    with open(tsv, "w") as f:
        for i, text in enumerate(CORPUS):
            if text.strip() and "\t" not in text:  # captions are TSV fields
                f.write(f"label{i % 3}\t{i * 7}\t{text}\n")
    rv = ref["vocab"].build_vocab_from_file(
        str(tsv), ref["tokenizers"].WordPunctTokenizer(), min_df=2)
    ov = our_vocab.build_vocab_from_file(
        str(tsv), our_tokenizers.WordPunctTokenizer(), min_df=2)
    assert list(ov.tokens) == list(rv.tokens)

    # save format is one-token-per-line, identical
    rp, op = tmp_path / "ref.txt", tmp_path / "ours.txt"
    rv.save(str(rp))
    ov.save(str(op))
    assert rp.read_text() == op.read_text()
    assert list(our_vocab.Vocab.load(str(op)).tokens) == list(
        ref["vocab"].Vocab.load(str(rp)).tokens)


def test_clean_check_text_match_reference_source():
    ref = load_reference()
    extra = [
        "a!!!!!!!! b???????",
        "keep -- dashes -- and ,, commas ,,",
        "<<<>>>|||\\\\ stripped classes",
        "____underscores____ and ####hashes####",
        "ok text of reasonable length here",
        "x" * 120,
        "small",
    ]
    for text in CORPUS + extra:
        assert our_data_utils.clean_text(text) == ref["data_utils"].clean_text(
            text), text
        for kw in ({}, {"min_len": 5, "max_len": 50, "max_tokens": 8}):
            assert our_data_utils.check_text(text, **kw) == ref[
                "data_utils"].check_text(text, **kw), (text, kw)


def test_inference_text_utils_match_reference_source():
    ref = load_reference()
    rv = ref["vocab"].build_vocab(
        CORPUS, ref["tokenizers"].WordPunctTokenizer(), min_df=1)
    ov = our_vocab.build_vocab(
        CORPUS, our_tokenizers.WordPunctTokenizer(), min_df=1)
    rtok, otok = (ref["tokenizers"].WordPunctTokenizer(),
                  our_tokenizers.WordPunctTokenizer())

    for text in CORPUS:
        if not text.strip():
            continue
        r_seq = ref["inference"].text_to_seq(text, rv, rtok)
        o_seq = our_inference.text_to_seq(text, ov, otok)
        assert np.asarray(o_seq).reshape(-1).tolist() == \
            r_seq.reshape(-1).tolist(), text

        # seq_to_text truncates at the first EOS
        ids = r_seq.reshape(-1).tolist() + [EOS, 7, 9]
        r_text = ref["inference"].seq_to_text(torch.tensor(ids), rv)
        o_text = our_inference.seq_to_text(ids, ov)
        assert o_text == r_text, text

        for num_blocks in (None, 1, 2, 3):
            assert our_inference.split_caption(text, num_blocks) == \
                ref["inference"].split_caption(text, num_blocks), \
                (text, num_blocks)


def test_perplexity_matches_reference_source():
    ref = load_reference()
    g = torch.Generator().manual_seed(5)
    bs, t, v = 4, 9, 23
    logits = torch.randn(bs, t, v, generator=g)
    targets = torch.randint(0, v, (bs, t), generator=g)
    targets[0, 6:] = 0
    targets[2, 3:] = 0
    lengths = (targets != 0).sum(-1)

    r = ref["metrics"].perplexity(logits, targets, lengths, pad_index=0)
    o = our_metrics.perplexity(
        jnp.asarray(logits.numpy()), jnp.asarray(targets.numpy()),
        jnp.asarray(lengths.numpy()), pad_index=0)
    assert np.allclose(float(o), float(r), rtol=1e-5), (float(o), float(r))


# ---------------------------------------------------------------------------
# (a) teacher-forced logits vs converted reference decoders
# ---------------------------------------------------------------------------

def _prefixed_sd(module, prefix="decoder"):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


def test_lstm_decoder_forward_matches_reference_source():
    ref = load_reference()
    torch.manual_seed(10)
    V, E, H, LAYERS, BS, T = 41, 16, 24, 2, 3, 7
    dec = ref["rnn"].LSTMDecoder(V, emb_dim=E, hidden_size=H,
                                 num_layers=LAYERS, dropout=0.0).eval()

    g = torch.Generator().manual_seed(11)
    image_emb = torch.randn(BS, E, generator=g)
    captions = torch.randint(0, V, (BS, T), generator=g)
    with torch.no_grad():
        ref_logits = dec(image_emb, captions)

    sd = dec.state_dict()
    params = {
        "embedding": _embedding(sd, "embedding.weight"),
        "lstm": _convert_lstm(sd, "lstm"),
        "classifier": _linear(sd, "classifier"),
    }
    ours = our_lstm.lstm_decoder_forward(
        params, jnp.asarray(image_emb.numpy()),
        jnp.asarray(captions.numpy()))
    np.testing.assert_allclose(
        np.asarray(ours), ref_logits.numpy(), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("variant", ["cross", "self"])
def test_transformer_decoder_forward_matches_reference_source(variant):
    ref = load_reference()
    torch.manual_seed(20)
    V, D, L, H, PF, BS, T, T_ENC, MAXLEN = 37, 32, 2, 4, 48, 3, 6, 10, 24
    if variant == "cross":
        dec = ref["tfm"].TransformerDecoder(
            V, hid_dim=D, n_layers=L, n_heads=H, pf_dim=PF, dropout=0.0,
            pad_index=0, max_len=MAXLEN).eval()
    else:
        dec = ref["tfm"].SelfAttentionTransformerDecoder(
            V, hid_dim=D, n_layers=L, n_heads=H, pf_dim=PF, dropout=0.0,
            pad_index=0, max_len=MAXLEN).eval()

    g = torch.Generator().manual_seed(21)
    tokens = torch.randint(6, V, (BS, T), generator=g)
    tokens[0, 4:] = 0  # pad tail exercises the pad mask
    tokens[2, 5:] = 0
    start_emb = torch.randn(BS, D, generator=g)

    sd = _prefixed_sd(dec)
    params = _convert_transformer_decoder(sd, "decoder")

    with torch.no_grad():
        if variant == "cross":
            enc_out = torch.randn(BS, T_ENC, D, generator=g)
            enc_out[1, 7:] = 0.0  # all-zero rows drive the enc mask
            ref_logits = dec(tokens, enc_out, start_emb)
            ours = our_tfm.transformer_decoder_forward(
                params, jnp.asarray(tokens.numpy()),
                jnp.asarray(enc_out.numpy()),
                jnp.asarray(start_emb.numpy()), n_heads=H, pad_index=0)
        else:
            ref_logits = dec(tokens, start_emb)
            ours = our_tfm.self_attn_decoder_forward(
                params, jnp.asarray(tokens.numpy()),
                jnp.asarray(start_emb.numpy()), n_heads=H, pad_index=0)

    np.testing.assert_allclose(
        np.asarray(ours), ref_logits.numpy(), atol=3e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# (b) BeamSearchHelper.process_logits step-for-step
# ---------------------------------------------------------------------------

def test_process_logits_matches_engine_candidate_math():
    """One beam step, identical inputs, both sides deterministic:

    reference: filter_top_k -> patched-multinomial draw -> gathered
    log_softmax scores -> ended-branch repeat_interleave bookkeeping
    (beam.py:55-108). engine: ``_topk_space_draw`` (greedy) + the
    [beam, beam] candidate matrix with ended rows pinned to a single
    (pad, 0) column (sampling.py body). The flattened candidate lists
    must agree element-for-element, as must the survivor pick.
    """
    ref = load_reference()
    beam, V, top_k, temp = 5, 43, 12, 1.3
    g = torch.Generator().manual_seed(30)
    logits_t = torch.randn(beam, V, generator=g)
    prev_seq = torch.randint(6, V, (beam, 4), generator=g)
    prev_val = torch.randn(beam, generator=g).abs() * -1.0
    ended = torch.tensor([False, True, False, True, False])

    helper = ref["beam"].BeamSearchHelper(
        temperature=temp, beam_size=beam, top_k=top_k,
        unk_index=UNK, eos_index=EOS, device="cpu")
    helper.has_ended = ended.clone()
    with _greedy_multinomial(), torch.no_grad():
        (r_prev_seqs, r_prev_vals), (r_new_ind, r_new_val) = \
            helper.process_logits(logits_t.clone(), prev_seq, prev_val)
        r_cand_val = r_prev_vals.flatten() + r_new_val
        # reference survivor pick over the candidate list
        r_surv = torch.topk(
            torch.softmax(r_cand_val / temp, -1), beam).indices

    # engine side: per-branch draw in K-space (greedy = top-k by tempered
    # value = the patched multinomial's pick order), then the candidate
    # matrix exactly as sampling.py's scan body builds it
    o_idx, o_val = _topk_space_draw(
        jax.random.PRNGKey(0), jnp.asarray(logits_t.numpy()), top_k, beam,
        jnp.float32(1.0 / temp), True, UNK)
    ended_j = jnp.asarray(ended.numpy())
    col = jnp.arange(beam)
    o_idx = jnp.where(ended_j[:, None], 0, o_idx)
    o_val = jnp.where(ended_j[:, None], 0.0, o_val)
    valid = jnp.where(ended_j[:, None], col[None, :] == 0, True)
    cand_val = jnp.asarray(prev_val.numpy())[:, None] + o_val
    cand_weight = jnp.where(valid, cand_val / temp, NEG_INF)

    # flatten the engine's candidate matrix through the valid mask: this
    # is exactly the reference's variable-length candidate list (live
    # branch -> beam entries in draw order, ended branch -> one entry)
    valid_np = np.asarray(valid).reshape(-1)
    flat_idx = np.asarray(o_idx).reshape(-1)[valid_np]
    flat_val = np.asarray(cand_val).reshape(-1)[valid_np]
    flat_new_val = np.asarray(o_val).reshape(-1)[valid_np]

    assert flat_idx.tolist() == r_new_ind.tolist()
    np.testing.assert_allclose(flat_new_val, r_new_val.numpy(), atol=1e-5)
    np.testing.assert_allclose(flat_val, r_cand_val.numpy(), atol=1e-5)

    # the reference expands prev seqs/vals by repeat_interleave; engine
    # candidates inherit row-wise — same expansion through the valid mask
    rows = np.repeat(np.arange(beam), beam)[valid_np]
    assert prev_seq.numpy()[rows].tolist() == r_prev_seqs.tolist()
    np.testing.assert_allclose(prev_val.numpy()[rows],
                               r_prev_vals.flatten().numpy(), atol=0)

    # ended-flag expansion: candidate-level ended = parent ended | new EOS
    exp_ended = (ended.numpy()[rows] | (flat_idx == EOS))
    assert exp_ended.tolist() == (
        helper.has_ended | (r_new_ind == EOS)).tolist() or \
        helper.has_ended.tolist() == exp_ended.tolist()

    # survivor pick: engine top-k over the masked flat weights maps to the
    # same candidates the reference picks from its packed list
    o_surv_flat = np.asarray(
        jax.lax.top_k(cand_weight.reshape(-1), beam)[1])
    flat_to_packed = np.full(beam * beam, -1)
    flat_to_packed[np.nonzero(valid_np)[0]] = np.arange(valid_np.sum())
    assert flat_to_packed[o_surv_flat].tolist() == r_surv.tolist()


# ---------------------------------------------------------------------------
# (c) end-to-end generate token equality (deterministic beam)
# ---------------------------------------------------------------------------

def _compare_generate(ref_out, ours_chosen, context):
    ref_ids = [int(t) for t in np.asarray(ref_out).reshape(-1)]
    ours_ids = [int(t) for t in np.asarray(ours_chosen).reshape(-1)]
    assert ours_ids[: len(ref_ids)] == ref_ids, (
        f"{context}: ref={ref_ids} ours={ours_ids[:len(ref_ids)]}"
    )


def test_lstm_generate_matches_reference_source():
    ref = load_reference()
    torch.manual_seed(40)
    V, E, H, LAYERS = 41, 16, 24, 2
    BEAM, TOP_K, TEMP, MAX_LEN = 4, 12, 1.1, 12
    dec = ref["rnn"].LSTMDecoder(V, emb_dim=E, hidden_size=H,
                                 num_layers=LAYERS, dropout=0.0).eval()

    g = torch.Generator().manual_seed(41)
    image_emb = torch.randn(1, 1, E, generator=g)

    sd = dec.state_dict()
    model = CaptioningLSTM(num_tokens=V, emb_dim=E, hidden_size=H,
                           num_layers=LAYERS)
    params = {"decoder": {
        "embedding": _embedding(sd, "embedding.weight"),
        "lstm": _convert_lstm(sd, "lstm"),
        "classifier": _linear(sd, "classifier"),
    }}

    for caption in (None, torch.tensor([[7, 9, 12]])):
        with _greedy_multinomial(), torch.no_grad():
            ref_out = dec.generate(
                image_emb, caption=caption, max_len=MAX_LEN,
                temperature=TEMP, beam_size=BEAM, top_k=TOP_K,
                eos_index=EOS)
        res = model.generate_from_emb(
            params, jnp.asarray(image_emb[:, 0].numpy()),
            caption=None if caption is None else jnp.asarray(
                caption.numpy()),
            max_len=MAX_LEN, temperature=TEMP, beam_size=BEAM,
            top_k=TOP_K, greedy=True)
        _compare_generate(ref_out, res["chosen"][0],
                          f"lstm caption={caption}")


@pytest.mark.parametrize("variant", ["self", "cross"])
def test_transformer_generate_matches_reference_source(variant):
    """Reference transformer loops run one EXTRA scoring step whose token
    write lands in an empty slice (transformers.py:562, silently dropped)
    but whose survivor resampling still reshuffles the beams — so the
    engine runs with max_len+1 and the comparison covers the reference's
    returned columns ([:i], transformers.py:578)."""
    ref = load_reference()
    torch.manual_seed(50 if variant == "self" else 51)
    V, D, L, H, PF, MAXTAB = 37, 32, 2, 4, 48, 40
    BEAM, TOP_K, TEMP, MAX_LEN = 4, 12, 1.1, 10

    g = torch.Generator().manual_seed(52)
    start_emb = torch.randn(1, D, generator=g)

    if variant == "self":
        dec = ref["tfm"].SelfAttentionTransformerDecoder(
            V, hid_dim=D, n_layers=L, n_heads=H, pf_dim=PF, dropout=0.0,
            pad_index=0, max_len=MAXTAB).eval()
        model = CaptioningTransformerBase(
            num_tokens=V, hid_dim=D, n_layers=L, n_heads=H, pf_dim=PF,
            max_len=MAXTAB)
        enc = jnp.asarray(start_emb.numpy())
        ref_kwargs = {}
    else:
        dec = ref["tfm"].TransformerDecoder(
            V, hid_dim=D, n_layers=L, n_heads=H, pf_dim=PF, dropout=0.0,
            pad_index=0, max_len=MAXTAB).eval()
        model = CaptioningTransformer(
            num_tokens=V, hid_dim=D, n_layers=L, n_heads=H, pf_dim=PF,
            max_len=MAXTAB)
        enc_out = torch.randn(1, 8, D, generator=g)
        enc = (jnp.asarray(start_emb.numpy()), jnp.asarray(enc_out.numpy()))
        ref_kwargs = {"enc_out": enc_out}

    params = {"decoder": _convert_transformer_decoder(
        _prefixed_sd(dec), "decoder")}

    for caption in (None, torch.tensor([[7, 9]])):
        with _greedy_multinomial(), torch.no_grad():
            if variant == "cross":
                ref_out = dec.generate(
                    start_emb, ref_kwargs["enc_out"], caption=caption,
                    max_len=MAX_LEN, temperature=TEMP, beam_size=BEAM,
                    top_k=TOP_K, eos_index=EOS)
            else:
                ref_out = dec.generate(
                    start_emb, caption=caption, max_len=MAX_LEN,
                    temperature=TEMP, beam_size=BEAM, top_k=TOP_K,
                    eos_index=EOS)
        res = model.generate_from_emb(
            params, enc,
            caption=None if caption is None else jnp.asarray(
                caption.numpy()),
            max_len=MAX_LEN + 1, temperature=TEMP, beam_size=BEAM,
            top_k=TOP_K, greedy=True)
        _compare_generate(ref_out, res["chosen"][0],
                          f"{variant} caption={caption}")

"""Native C++ text core: exactness vs the Python regex tokenizers."""

import random
import string
import time

import numpy as np
import pytest

from deephumor_tpu.data import CharTokenizer, Vocab, WordPunctTokenizer
from deephumor_tpu.native import (
    MODE_CHAR,
    MODE_WORD,
    NativeVocabEncoder,
    available,
    encode_batch,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="native library not built and no compiler"
)

CORPUS = [
    "when you ship it <sep> and it works",
    "don't stop... me now!!",
    "a<sep>b<emp> <unk> <bos>",
    "punct-run: ?!?!?! (nice)   spaced\tout",
    "<notaspecial <sep> x>y<z>",
    "'' '' ''' _under_score_ 123abc",
    "<>",
    "",
    "\nnew\nlines\n",
    "x" * 200,
]


def _chars_and_words():
    rng = random.Random(0)
    alphabet = string.ascii_lowercase + string.digits + "_<>' .,!?-#$%&/:;"
    for _ in range(300):
        yield "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 60))
        )


@pytest.mark.parametrize("mode,tok_cls", [
    (MODE_WORD, WordPunctTokenizer),
    (MODE_CHAR, CharTokenizer),
])
def test_tokenizer_exactness_fuzz(mode, tok_cls):
    tok = tok_cls()
    texts = CORPUS + list(_chars_and_words())
    texts = [t.lower() for t in texts]
    # vocab from all python tokens so ids are comparable
    all_tokens = sorted({t for s in texts for t in tok.tokenize(s)})
    vocab = Vocab(all_tokens)
    enc = NativeVocabEncoder(vocab.tokens)

    max_len = 256
    ids, lens = enc.encode(texts, mode, max_len, append_eos=False)
    for i, text in enumerate(texts):
        ref = [vocab.stoi.get(t, 1) for t in tok.tokenize(text)][:max_len]
        got = ids[i, : lens[i]].tolist()
        assert got == ref, f"mismatch on {text!r}: {got} != {ref}"


def test_encode_batch_matches_dataset_preprocessing():
    # encode_batch must equal MemeDataset._preprocess_text (+EOS) semantics
    from deephumor_tpu.data.vocab import SPECIAL_TOKENS

    vocab = Vocab(["hello", "world", "!"])
    texts = ["Hello zzz world!", "HELLO <sep> WORLD"]
    ids, lens = encode_batch(texts, vocab, "word", max_len=10)

    tok = WordPunctTokenizer()
    for i, text in enumerate(texts):
        toks = [
            t if t in vocab.stoi else SPECIAL_TOKENS["UNK"]
            for t in tok.tokenize(text.lower())
        ]
        toks.append(SPECIAL_TOKENS["EOS"])
        ref = [vocab.stoi[t] for t in toks]
        assert ids[i, : lens[i]].tolist() == ref


def test_encode_batch_nonascii_falls_back():
    vocab = Vocab(["hello"])
    ids, lens = encode_batch(["héllo wörld"], vocab, "word", max_len=8)
    assert lens[0] > 0  # python path handled it


def test_truncation_and_eos():
    vocab = Vocab(["a"])
    a = vocab.stoi["a"]
    ids, lens = encode_batch(["a " * 20], vocab, "word", max_len=5)
    assert lens[0] == 5
    assert ids[0].tolist() == [a] * 5  # no room for EOS
    ids, lens = encode_batch(["a a"], vocab, "word", max_len=5)
    assert ids[0, :3].tolist() == [a, a, 3]


def test_native_speedup_vs_python():
    vocab = Vocab([f"tok{i}" for i in range(1000)])
    texts = [
        " ".join(f"tok{i % 997}" for i in range(j, j + 20))
        for j in range(2000)
    ]
    from deephumor_tpu.native import _python_encode

    tok = WordPunctTokenizer()
    # warm both paths (first encode_batch call may build/load the .so;
    # vocab dict interning warms caches), then take best-of-3 each to
    # keep scheduler noise from flipping the comparison
    encode_batch(texts[:50], vocab, "word", max_len=32)
    _python_encode(texts[:50], vocab, tok, 32, 1, 3, True, 0)

    native_t = min(
        _timed(lambda: encode_batch(texts, vocab, "word", max_len=32))
        for _ in range(3))
    python_t = min(
        _timed(lambda: _python_encode(texts, vocab, tok, 32, 1, 3, True, 0))
        for _ in range(3))
    # informative, not strict: native should be clearly faster
    assert native_t < python_t, (native_t, python_t)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0

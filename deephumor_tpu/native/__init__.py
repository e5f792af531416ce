"""ctypes bindings for the native (C++) text core.

Loads ``libdh_text.so`` (built from /native/dh_text.cpp via ``make -C
native`` or :func:`build`); every entry point has a pure-Python fallback so
the framework works without a compiler. Non-ASCII inputs always take the
Python path — the native scanners implement the ASCII restriction of the
reference regexes, and Python ``\\w`` is unicode-aware.
"""

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "build", "NativeVocabEncoder", "encode_batch"]

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libdh_text.so")
_lib = None

# tokenizer modes (must match dh_text.cpp)
MODE_WORD = 0
MODE_CHAR = 1


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dh_vocab_create.restype = ctypes.c_void_p
    lib.dh_vocab_create.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.dh_vocab_free.argtypes = [ctypes.c_void_p]
    lib.dh_vocab_lookup.restype = ctypes.c_int32
    lib.dh_vocab_lookup.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.dh_encode_batch.restype = ctypes.c_int64
    lib.dh_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int, ctypes.c_int32, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def build(force=False):
    """Compiles the shared library with g++ (no-op if present)."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "native", "dh_text.cpp",
    )
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o",
             _LIB_PATH, src],
            check=True, capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        return False
    global _lib
    _lib = None
    return _load() is not None


def available(autobuild=True):
    """True when the native library is loadable (building it on first use
    when a compiler is around)."""
    if _load() is not None:
        return True
    if autobuild and build():
        return True
    return False


def _pack(texts):
    """Concatenated utf-8 blob + int64 offsets for a list of strings."""
    encoded = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(encoded) + 1, np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    return b"".join(encoded), offsets


class NativeVocabEncoder:
    """Holds a native vocab handle; encodes text batches to id matrices."""

    def __init__(self, vocab_tokens):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not available")
        self._lib = lib
        blob, offsets = _pack(list(vocab_tokens))
        self._blob = blob  # keep alive during create
        self._handle = lib.dh_vocab_create(
            blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(vocab_tokens),
        )

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.dh_vocab_free(handle)
            self._handle = None

    def encode(self, texts, mode, max_len, unk_id=1, eos_id=3,
               append_eos=True, pad_id=0):
        """Returns (ids [n, max_len] int32 padded, lengths [n] int32).

        Texts must be pre-lowercased ASCII (the caller routes non-ASCII to
        the Python path).
        """
        blob, offsets = _pack(texts)
        n = len(texts)
        out_ids = np.full((n, max_len), pad_id, np.int32)
        out_lens = np.zeros(n, np.int32)
        self._lib.dh_encode_batch(
            self._handle, mode, unk_id, eos_id, int(append_eos), pad_id,
            blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, max_len,
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out_ids, out_lens


def _python_encode(texts, vocab, tokenizer, max_len, unk_id, eos_id,
                   append_eos, pad_id):
    from deephumor_tpu.data.vocab import SPECIAL_TOKENS

    unk = SPECIAL_TOKENS["UNK"]
    n = len(texts)
    out_ids = np.full((n, max_len), pad_id, np.int32)
    out_lens = np.zeros(n, np.int32)
    for i, text in enumerate(texts):
        tokens = tokenizer.tokenize(text)
        ids = [
            vocab.stoi.get(tok, unk_id) if tok in vocab.stoi else unk_id
            for tok in tokens
        ][:max_len]
        if append_eos and len(ids) < max_len:
            ids.append(eos_id)
        out_ids[i, : len(ids)] = ids
        out_lens[i] = len(ids)
    return out_ids, out_lens


_ENCODER_CACHE = {}


def encode_batch(texts, vocab, tokenizer_mode="word", max_len=32,
                 append_eos=True, lowercase=True, pad_id=0, unk_id=1,
                 eos_id=3):
    """Batch text -> padded int32 ids, native-accelerated when possible.

    Matches the dataset preprocessing contract (lowercase -> tokenize ->
    UNK-replace -> optional EOS -> ids, reference datasets.py:71-84) with
    truncation to ``max_len``.
    """
    from deephumor_tpu.data.tokenizers import CharTokenizer, WordPunctTokenizer

    if lowercase:
        texts = [t.lower() for t in texts]
    mode = MODE_WORD if tokenizer_mode == "word" else MODE_CHAR
    tokenizer = (
        WordPunctTokenizer() if tokenizer_mode == "word" else CharTokenizer()
    )

    if available():
        ascii_mask = [t.isascii() for t in texts]
        if all(ascii_mask):
            key = id(vocab)
            encoder = _ENCODER_CACHE.get(key)
            if encoder is None or encoder[0] is not vocab:
                encoder = (vocab, NativeVocabEncoder(vocab.tokens))
                _ENCODER_CACHE[key] = encoder
            return encoder[1].encode(
                texts, mode, max_len, unk_id, eos_id, append_eos, pad_id
            )

    return _python_encode(
        texts, vocab, tokenizer, max_len, unk_id, eos_id, append_eos, pad_id
    )

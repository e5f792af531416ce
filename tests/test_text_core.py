"""Golden tests for tokenizers, vocab, and inference text utilities.

The expected values encode the reference's observable behavior
(/root/reference/deephumor/data/tokenizers.py, vocab.py,
experiments/inference.py) as golden data.
"""

import numpy as np
import pytest

from deephumor_tpu.data import (
    CharTokenizer,
    SPECIAL_TOKENS,
    Vocab,
    WordPunctTokenizer,
    build_vocab,
    build_vocab_from_file,
    PAD_ID,
    UNK_ID,
    BOS_ID,
    EOS_ID,
    SEP_ID,
    EMP_ID,
)
from deephumor_tpu.data.utils import clean_text, check_text
from deephumor_tpu.experiments import seq_to_text, split_caption, text_to_seq


class TestWordPunctTokenizer:
    def test_basic(self):
        tok = WordPunctTokenizer()
        assert tok.tokenize("hello, world!") == ["hello", ",", "world", "!"]

    def test_specials_kept_whole(self):
        tok = WordPunctTokenizer()
        assert tok.tokenize("one <sep> two <emp>") == [
            "one",
            "<sep>",
            "two",
            "<emp>",
        ]

    def test_apostrophe_in_word(self):
        tok = WordPunctTokenizer()
        assert tok.tokenize("don't stop") == ["don't", "stop"]

    def test_punct_runs(self):
        tok = WordPunctTokenizer()
        assert tok.tokenize("wait... what?!") == ["wait", "...", "what", "?!"]


class TestCharTokenizer:
    def test_chars(self):
        tok = CharTokenizer()
        assert tok.tokenize("ab c") == ["a", "b", " ", "c"]

    def test_specials_kept_whole(self):
        tok = CharTokenizer()
        assert tok.tokenize("a<sep>b") == ["a", "<sep>", "b"]


class TestVocab:
    def test_special_token_ids(self):
        v = Vocab([])
        assert v.stoi["<pad>"] == PAD_ID == 0
        assert v.stoi["<unk>"] == UNK_ID == 1
        assert v.stoi["<bos>"] == BOS_ID == 2
        assert v.stoi["<eos>"] == EOS_ID == 3
        assert v.stoi["<sep>"] == SEP_ID == 4
        assert v.stoi["<emp>"] == EMP_ID == 5

    def test_sorted_and_deduped(self):
        v = Vocab(["b", "a", "b", "<pad>"])
        assert v.tokens[6:] == ["a", "b"]
        assert len(v) == 8

    def test_save_load_roundtrip(self, tmp_path):
        v = Vocab(["meme", "lord"])
        path = tmp_path / "vocab.txt"
        v.save(path)
        v2 = Vocab.load(path)
        assert v2.tokens == v.tokens
        assert v2.stoi == v.stoi

    def test_build_vocab_min_df(self):
        docs = ["a b", "a c", "a d"]
        v = build_vocab(docs, WordPunctTokenizer(), min_df=2)
        # only 'a' appears in >= 2 documents
        assert v.tokens[6:] == ["a"]

    def test_build_vocab_set_semantics(self):
        # repeated token within one doc counts once
        docs = ["a a a", "b"]
        v = build_vocab(docs, WordPunctTokenizer(), min_df=2)
        assert v.tokens[6:] == []

    def test_build_vocab_from_file(self, tmp_path):
        path = tmp_path / "captions_train.txt"
        path.write_text(
            "tmpl\t10\thello world\n"
            "tmpl\t5\thello there\n"
        )
        v = build_vocab_from_file(path, WordPunctTokenizer(), min_df=2)
        assert v.tokens[6:] == ["hello"]


class TestInferenceUtils:
    @pytest.fixture
    def vocab(self):
        return Vocab(["hello", "world", "!"])

    def test_text_to_seq(self, vocab):
        seq = text_to_seq("hello zzz world", vocab, WordPunctTokenizer())
        assert seq.shape == (1, 3)
        assert seq[0].tolist() == [
            vocab.stoi["hello"],
            UNK_ID,
            vocab.stoi["world"],
        ]

    def test_text_to_seq_no_eos(self, vocab):
        seq = text_to_seq("hello", vocab, WordPunctTokenizer())
        assert EOS_ID not in seq[0].tolist()

    def test_seq_to_text_truncates_at_eos(self, vocab):
        ids = [vocab.stoi["hello"], EOS_ID, vocab.stoi["world"]]
        assert seq_to_text(np.array(ids), vocab) == "hello"

    def test_seq_to_text_no_eos(self, vocab):
        ids = [vocab.stoi["hello"], vocab.stoi["world"]]
        assert seq_to_text(np.array(ids), vocab) == "hello world"

    def test_split_caption_basic(self):
        blocks = split_caption("top text <sep> bottom text")
        assert blocks == ["top text", "bottom text"]

    def test_split_caption_cleans_specials_and_punct_space(self):
        blocks = split_caption("<emp> <sep> hello , world !")
        assert blocks == ["", "hello, world!"]

    def test_split_caption_pads_blocks(self):
        blocks = split_caption("only top", num_blocks=2)
        assert blocks == ["only top", ""]

    def test_split_caption_truncates_blocks(self):
        blocks = split_caption("a <sep> b <sep> c", num_blocks=2)
        assert blocks == ["a", "b"]


class TestCleanCheckText:
    def test_clean_drops_angle_pipe(self):
        assert clean_text("a <<>> b || c") == "a b c"

    def test_clean_squashes_punct(self):
        assert clean_text("what,,,, no") == "what, no"

    def test_clean_triples_repeats(self):
        assert clean_text("what!!!!!!") == "what!!!"
        assert clean_text("hm..") == "hm.."

    def test_check_ascii(self):
        assert not check_text("привет мир как дела")
        assert check_text("hello world ok")

    def test_check_length(self):
        assert not check_text("short")
        assert not check_text("x" * 101)

    def test_check_tokens(self):
        assert not check_text("a " * 40, max_tokens=32)

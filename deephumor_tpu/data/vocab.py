"""Token vocabulary.

Behavioral contract matches the reference vocabulary stack
(/root/reference/deephumor/data/vocab.py): the fixed special-token ordering
fixes the ids pad=0, unk=1, bos=2, eos=3, sep=4, emp=5 (vocab.py:5-22), and
non-special tokens are lexicographically sorted so vocabularies are
deterministic given a token set.
"""

from collections import Counter

__all__ = [
    "SPECIAL_TOKENS",
    "PAD_ID",
    "UNK_ID",
    "BOS_ID",
    "EOS_ID",
    "SEP_ID",
    "EMP_ID",
    "Vocab",
    "build_vocab",
    "build_vocab_from_file",
]

# Fixed special token set; insertion order defines ids 0..5 (vocab.py:5-12).
SPECIAL_TOKENS = {
    "PAD": "<pad>",
    "UNK": "<unk>",
    "BOS": "<bos>",
    "EOS": "<eos>",
    "SEP": "<sep>",
    "EMPTY": "<emp>",
}

PAD_ID, UNK_ID, BOS_ID, EOS_ID, SEP_ID, EMP_ID = range(6)


class Vocab:
    """Deterministic token vocabulary.

    Special tokens come first in their fixed order, the remaining tokens are
    deduplicated and sorted (reference vocab.py:18-22).
    """

    def __init__(self, tokens, special_tokens=tuple(SPECIAL_TOKENS.values())):
        special_set = set(special_tokens)
        rest = sorted(set(tok for tok in tokens if tok not in special_set))
        self.tokens = list(special_tokens) + rest
        self.stoi = {tok: idx for idx, tok in enumerate(self.tokens)}
        self.itos = {idx: tok for idx, tok in enumerate(self.tokens)}

    def __iter__(self):
        return iter(self.tokens)

    def __len__(self):
        return len(self.tokens)

    def __contains__(self, token):
        return token in self.stoi

    def save(self, filepath):
        """Writes one token per line (reference vocab.py:30-34)."""
        with open(filepath, "w") as f:
            for token in self.tokens:
                f.write(f"{token}\n")

    @staticmethod
    def load(filepath):
        """Loads a one-token-per-line vocabulary file (vocab.py:36-42)."""
        with open(filepath, "r") as f:
            tokens = [line.strip("\n") for line in f]
        return Vocab(tokens)


def build_vocab(documents, tokenizer, min_df=7):
    """Builds a vocabulary by document frequency.

    Each document contributes its *set* of lowercase tokens once; tokens kept
    iff their document frequency >= ``min_df`` (reference vocab.py:45-69).

    Args:
        documents: iterable of strings.
        tokenizer: a :class:`Tokenizer`.
        min_df: minimum document frequency.

    Returns:
        Vocab
    """
    doc_freq = Counter()
    for text in documents:
        doc_freq.update(set(tokenizer.tokenize(text.lower())))
    kept = [tok for tok, df in doc_freq.items() if df >= min_df]
    return Vocab(kept)


def build_vocab_from_file(captions_file, tokenizer, min_df=7):
    """Builds a vocabulary from a ``label\\tscore\\tcaption`` TSV file.

    Parity: reference vocab.py:72-90.
    """
    captions = []
    with open(captions_file) as f:
        for line in f:
            _, _, caption = line.strip().split("\t")
            captions.append(caption)
    return build_vocab(captions, tokenizer, min_df=min_df)

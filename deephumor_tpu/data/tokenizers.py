"""Text tokenizers.

Behavioral contract matches the reference tokenizers
(/root/reference/deephumor/data/tokenizers.py:14-29): the two regexes below
ARE the public behavior — word-punct tokens keep ``<special>`` markers whole,
char tokens split to single characters but keep ``<special>`` markers whole.
"""

import abc
import re

__all__ = ["Tokenizer", "WordPunctTokenizer", "CharTokenizer"]


class Tokenizer(abc.ABC):
    """Abstract tokenizer interface."""

    @abc.abstractmethod
    def tokenize(self, text):
        """Splits ``text`` into a list of string tokens."""
        raise NotImplementedError


class WordPunctTokenizer(Tokenizer):
    """Word + punctuation tokenizer preserving ``<special>`` tokens.

    Parity: reference ``WordPunctTokenizer.token_pattern``
    (tokenizers.py:17).
    """

    token_pattern = re.compile(r"[<\w'>]+|[^\w\s]+")

    def tokenize(self, text):
        return self.token_pattern.findall(text)


class CharTokenizer(Tokenizer):
    """Character-level tokenizer preserving ``<special>`` tokens.

    Parity: reference ``CharTokenizer.token_pattern`` (tokenizers.py:26).
    """

    token_pattern = re.compile(r"<\w+>|.")

    def tokenize(self, text):
        return self.token_pattern.findall(text)

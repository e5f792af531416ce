"""Text cleaning/filtering utilities.

Behavioral contract matches the reference filters
(/root/reference/deephumor/data/utils.py): punctuation-repetition squashing,
ASCII/length/token-count checks, and an English-probability gate. The
``langdetect`` dependency is optional here; :func:`english_prob` raises a
clear error if it is unavailable rather than failing at import time.
"""

import re

__all__ = ["clean_text", "check_text", "english_prob"]

# Same observable filtering behavior as reference utils.py:5-8.
TOKEN_PATTERN = re.compile(r"[<\w'>]+|[!#$%&\()*+,\-./:;=?@\\^{|}~]+")
_PUNCT_DROP = re.compile(r"([<>|\\])+")
_PUNCT_SQUASH = re.compile(r"([%&\()*+,\-/:;=@^{}~\"])+")
_PUNCT_TRIPLE = re.compile(r"([\.?!$#_]){4,}")


def clean_text(text):
    """Squashes unnecessary punctuation repetitions (utils.py:11-20).

    ``<>|\\`` runs are dropped, runs of most punctuation collapse to one
    character, and runs of ``.?!$#_`` longer than 3 collapse to exactly 3.
    Whitespace is normalized to single spaces.
    """
    text = text or ""
    if text:
        text = _PUNCT_DROP.sub("", text)
        text = _PUNCT_SQUASH.sub(r"\g<1>", text)
        text = _PUNCT_TRIPLE.sub(r"\g<1>\g<1>\g<1>", text)
    return " ".join(text.split())


def check_text(text, min_len=10, max_len=100, max_tokens=32):
    """ASCII / length / token-count filter (utils.py:23-39)."""
    try:
        text.encode("ascii")
    except UnicodeEncodeError:
        return False
    if len(text) < min_len or len(text) > max_len:
        return False
    if len(TOKEN_PATTERN.findall(text)) > max_tokens:
        return False
    return True


def english_prob(text):
    """Probability that ``text`` is English (utils.py:42-48).

    Requires the optional ``langdetect`` package.
    """
    try:
        from langdetect import detect_langs
    except ImportError as e:  # pragma: no cover - env without langdetect
        raise ImportError(
            "english_prob requires the optional `langdetect` package"
        ) from e
    for lang in detect_langs(text):
        if lang.lang == "en":
            return lang.prob
    return 0.0

"""Imaging layer: meme caption rendering.

Public surface mirrors the reference ``deephumor.imaging`` package
(/root/reference/deephumor/imaging/__init__.py:1-5).
"""

from deephumor_tpu.imaging.caption import (
    memeify_image,
    get_maximal_font,
    split_to_lines,
    caption_image,
    default_font_path,
)

__all__ = [
    "memeify_image",
    "get_maximal_font",
    "split_to_lines",
    "caption_image",
    "default_font_path",
]

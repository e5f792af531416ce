"""Acquisition layer: memegenerator.net crawler.

Public surface mirrors the reference ``deephumor.crawlers`` package
(/root/reference/deephumor/crawlers/__init__.py:1-5).
"""

from deephumor_tpu.crawlers.crawlers import (
    MemeGeneratorCrawler,
    crawl_template_page,
    crawl_templates,
)
from deephumor_tpu.crawlers.parsers import (
    parse_template_captions_page,
    parse_templates_page,
)
from deephumor_tpu.crawlers.utils import load_image, time_to_str

__all__ = [
    "MemeGeneratorCrawler",
    "crawl_templates",
    "crawl_template_page",
    "parse_templates_page",
    "parse_template_captions_page",
    "load_image",
    "time_to_str",
]

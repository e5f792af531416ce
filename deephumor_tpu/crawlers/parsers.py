"""Pure HTML parsers for memegenerator.net pages.

Split out from the fetch/orchestration layer so they are testable with
canned HTML fixtures (SURVEY.md §4 — no live HTTP in CI). Observable
behavior matches the reference scrapers
(/root/reference/deephumor/crawlers/crawlers.py:16-89): the template grid
and caption tiles live in ``div.char-img`` nodes; caption scores are
comma-grouped integers; top/bottom texts sit in
``optimized-instance-text0/1`` divs.
"""

import re

__all__ = ["parse_templates_page", "parse_template_captions_page"]

# leading digit required: a bare comma run would int("") (reference
# pattern r"(-?\d+(,\d*)?)" had the same guarantee)
_SCORE_PATTERN = re.compile(r"(-?\d[\d,]*)")


def parse_templates_page(content):
    """Parses the all-time-popular template grid.

    Args:
        content: HTML bytes/str.

    Returns:
        list of dicts ``{label, link, src}``.
    """
    from lxml import html

    tree = html.fromstring(content)
    templates = []
    for anchor in tree.xpath('//div[@class="char-img"]/a'):
        img = anchor.find("img")
        if img is None:
            continue
        templates.append(
            {
                "label": img.get("alt"),
                "link": anchor.get("href"),
                "src": img.get("src"),
            }
        )
    return templates


def parse_template_captions_page(content):
    """Parses one captions page of a template.

    Returns:
        (label, [(score, top_text, bottom_text), ...])
    """
    from lxml import html

    tree = html.fromstring(content)
    labels = tree.xpath("//h1/a/text()")
    label = labels[0] if labels else None

    memes = []
    for div in tree.xpath('//div[@class="char-img"]'):
        score_texts = div.xpath('.//div[contains(@class, "score")]/text()')
        if not score_texts:
            continue
        match = _SCORE_PATTERN.search(score_texts[0])
        if match is None:
            continue
        score = int(match.group(1).replace(",", ""))
        top = div.xpath('a//div[@class="optimized-instance-text0"]/text()')
        bottom = div.xpath('a//div[@class="optimized-instance-text1"]/text()')
        memes.append(
            (score, top[0] if top else "", bottom[0] if bottom else "")
        )
    return label, memes

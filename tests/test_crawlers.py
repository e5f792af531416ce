"""Crawler tests with canned HTML fixtures — no live HTTP (SURVEY.md §4)."""

import os

import numpy as np
import pytest

from deephumor_tpu.crawlers import (
    MemeGeneratorCrawler,
    crawl_template_page,
    crawl_templates,
    parse_template_captions_page,
    parse_templates_page,
    time_to_str,
)

TEMPLATES_HTML = b"""
<html><body>
<div class="char-img"><a href="/Grumpy-Cat">
  <img alt="Grumpy Cat" src="https://cdn.example/images/cat.jpg"/></a></div>
<div class="char-img"><a href="/One-Does-Not-Simply">
  <img alt="One Does Not Simply"
       src="https://cdn.example/images/simply.jpg"/></a></div>
<div class="other"><a href="/nope"><img alt="x" src="y"/></a></div>
</body></html>
"""

CAPTIONS_HTML = b"""
<html><body>
<h1><a href="/Grumpy-Cat">Grumpy Cat</a></h1>
<div class="char-img"><a href="/instance/1">
  <div class="optimized-instance-text0">I had fun once</div>
  <div class="optimized-instance-text1">It was awful</div></a>
  <div class="score large">1,234 points</div></div>
<div class="char-img"><a href="/instance/2">
  <div class="optimized-instance-text0">Good morning world</div>
  <div class="optimized-instance-text1"></div></a>
  <div class="score">-5</div></div>
<div class="char-img"><a href="/instance/3">
  <div class="optimized-instance-text1">only bottom text here</div></a>
  <div class="score">42</div></div>
</body></html>
"""


class TestParsers:
    def test_parse_templates(self):
        templates = parse_templates_page(TEMPLATES_HTML)
        assert templates == [
            {"label": "Grumpy Cat", "link": "/Grumpy-Cat",
             "src": "https://cdn.example/images/cat.jpg"},
            {"label": "One Does Not Simply", "link": "/One-Does-Not-Simply",
             "src": "https://cdn.example/images/simply.jpg"},
        ]

    def test_parse_captions(self):
        label, memes = parse_template_captions_page(CAPTIONS_HTML)
        assert label == "Grumpy Cat"
        assert memes == [
            (1234, "I had fun once", "It was awful"),
            (-5, "Good morning world", ""),
            (42, "", "only bottom text here"),
        ]


def make_fetch(pages_with_captions=3):
    """Offline fetch covering the template grid + caption pages."""

    def fetch(url, **kw):
        if "/memes/popular/alltime/" in url:
            page = int(url.rsplit("/", 1)[-1])
            return TEMPLATES_HTML if page == 1 else b"<html></html>"
        page = int(url.rsplit("/", 1)[-1])
        if page <= pages_with_captions:
            return CAPTIONS_HTML
        return b"<html><body><h1><a>Empty</a></h1></body></html>"

    return fetch


class TestCrawlerPipeline:
    def test_crawl_functions_with_injected_fetch(self):
        templates = crawl_templates(1, fetch=make_fetch())
        assert len(templates) == 2
        label, memes, link = crawl_template_page(
            "/Grumpy-Cat", 1, fetch=make_fetch()
        )
        assert label == "Grumpy Cat" and len(memes) == 3

    def test_crawl_dataset_writes_reference_format(self, tmp_path):
        crawler = MemeGeneratorCrawler(
            poolsize=2, min_len=5, fetch=make_fetch()
        )
        # avoid the image download thread hitting the network
        crawler_dir = str(tmp_path)
        n_t, n_c = crawler.crawl_dataset(
            num_templates=1, num_captions=4, save_dir=crawler_dir
        )
        assert n_t == 1 and n_c == 4

        captions = open(os.path.join(crawler_dir, "captions.txt")).read()
        lines = captions.strip().split("\n")
        assert len(lines) == 4
        label, score, text = lines[0].split("\t")
        assert label == "Grumpy Cat"
        # captions are sorted by score descending
        scores = [int(l.split("\t")[1]) for l in lines]
        assert scores == sorted(scores, reverse=True)
        # top <sep> bottom with <emp> for empty halves
        assert "<sep>" in text
        assert any("<emp>" in l for l in lines)

        templates = open(os.path.join(crawler_dir, "templates.txt")).read()
        assert templates.startswith("Grumpy Cat\t/Grumpy-Cat\t")

    def test_dedup(self):
        caps = [
            (10, "hello world today", ""),
            (9, "hello world today!", ""),  # near-duplicate
            (8, "something entirely different", ""),
        ]
        seen = []
        unique = MemeGeneratorCrawler._dedup(caps, seen)
        assert len(unique) == 2
        assert unique[0][0] == 10 and unique[1][0] == 8


class TestSplitData:
    def test_split_captions_deterministic(self, tmp_path):
        from split_data import split_captions

        with open(tmp_path / "captions.txt", "w") as f:
            for t in ("a", "b"):
                for i in range(10):
                    f.write(f"{t}\t{i}\tcaption {t} {i}\n")

        split_captions(str(tmp_path), splits=(6, 2, 2), random_state=0)
        train = open(tmp_path / "captions_train.txt").read().strip().split("\n")
        val = open(tmp_path / "captions_val.txt").read().strip().split("\n")
        test = open(tmp_path / "captions_test.txt").read().strip().split("\n")
        assert len(train) == 12 and len(val) == 4 and len(test) == 4
        # no overlap
        assert not (set(train) & set(val)) and not (set(val) & set(test))

        # honoring random_state (reference bug fixed): different seed,
        # different split
        split_captions(str(tmp_path), splits=(6, 2, 2), random_state=7)
        train2 = open(tmp_path / "captions_train.txt").read().strip().split("\n")
        assert set(train2) != set(train) or train2 != train

    def test_time_to_str(self):
        assert time_to_str(61.5) == "  1:01.50"


def test_malformed_pages_do_not_abort_crawl(tmp_path):
    """One empty/garbage caption page must be skipped, not abort the
    crawl (regression: a bare fut.result() re-raised lxml ParserError)."""
    base = make_fetch()

    def flaky_fetch(url):
        if "/images/popular/alltime/page/2" in url:
            return b""  # empty body -> lxml ParserError in the parser
        return base(url)

    crawler = MemeGeneratorCrawler(poolsize=2, min_len=5,
                                   fetch=flaky_fetch, batch_sleep=0,
                                   grid_sleep=0)
    n_t, n_c = crawler.crawl_dataset(
        num_templates=1, num_captions=4, save_dir=str(tmp_path))
    assert n_t == 1 and n_c == 4


def test_score_pattern_requires_digit():
    """A comma-only score run must not reach int('') (regression)."""
    from deephumor_tpu.crawlers.parsers import _SCORE_PATTERN

    assert _SCORE_PATTERN.search(", points") is None or \
        _SCORE_PATTERN.search(", points").group(1).strip(",") != ""
    m = _SCORE_PATTERN.search("1,234 points")
    assert m and int(m.group(1).replace(",", "")) == 1234
    m = _SCORE_PATTERN.search("-12 points")
    assert m and int(m.group(1).replace(",", "")) == -12

"""memegenerator.net dataset crawler.

Behavioral rebuild of the reference crawler
(/root/reference/deephumor/crawlers/crawlers.py:92-308): crawls the
all-time-popular template grid, pulls caption pages per template, cleans
and filters texts, optionally gates non-English templates and deduplicates
near-identical captions, keeps the top-``num_captions`` by score, and
appends ``templates.txt`` / ``captions.txt`` in the reference's TSV format
(caption text = ``top <sep> bottom`` with ``<emp>`` for empty halves,
crawlers.py:273-277).

Architectural differences from the reference (documented, not quirks):

- HTTP-bound work runs on a ``ThreadPoolExecutor`` instead of a
  ``multiprocessing.Pool`` with callback-mutated shared dicts and
  busy-wait polling (crawlers.py:113-145, 196-199) — futures are joined
  directly, so there is no ad-hoc synchronization to race on,
- page fetches retry with exponential backoff rather than a tight
  retry-until-200 loop (crawlers.py:57-67),
- the fetch layer is injectable (``fetch=``) so the whole pipeline is
  testable offline with canned HTML (SURVEY.md §4).
"""

import os
import time
from concurrent.futures import ThreadPoolExecutor

from deephumor_tpu.crawlers.parsers import (
    parse_template_captions_page,
    parse_templates_page,
)
from deephumor_tpu.crawlers.utils import load_image, time_to_str
from deephumor_tpu.data.utils import check_text, clean_text
from deephumor_tpu.data.vocab import SPECIAL_TOKENS

__all__ = [
    "MemeGeneratorCrawler",
    "crawl_templates",
    "crawl_template_page",
    "default_fetch",
]

BASE_URL = "https://memegenerator.net"


def default_fetch(url, num_retries=10, backoff=0.5):
    """GET with retries; returns content bytes or None."""
    import requests

    for attempt in range(num_retries):
        try:
            r = requests.get(url, timeout=30)
            if r.status_code == 200:
                return r.content
        except requests.RequestException:
            pass
        if attempt + 1 < num_retries:  # no backoff after the last attempt
            time.sleep(backoff * (2 ** min(attempt, 4)))
    print(f"Failed to load {url}")
    return None


def crawl_templates(page=1, fetch=default_fetch):
    """Fetches + parses one page of the all-time template grid
    (parity: crawlers.py:16-42)."""
    content = fetch(f"{BASE_URL}/memes/popular/alltime/page/{page}")
    return [] if content is None else parse_templates_page(content)


def crawl_template_page(template_link, page=1, fetch=default_fetch):
    """Fetches + parses one captions page of a template
    (parity: crawlers.py:45-89)."""
    url = f"{BASE_URL}{template_link}/images/popular/alltime/page/{page}"
    content = fetch(url)
    if content is None:
        return None, None, template_link
    label, memes = parse_template_captions_page(content)
    return label, memes, template_link


class MemeGeneratorCrawler:
    """Crawls the memes900k-format dataset.

    Args:
        poolsize: concurrent HTTP fetches.
        min_len/max_len/max_tokens: caption text filters
            (reference crawl_data.py defaults 10/96/31).
        detect_english: drop templates whose combined text is not
            majority-English (requires langdetect).
        detect_duplicates: Levenshtein-dedup captions (ratio > 0.9 is a
            duplicate), topping up pages until ``num_captions`` unique.
    """

    TEMPLATES_PER_PAGE = 15
    CAPTIONS_PER_PAGE = 15

    def __init__(self, poolsize=8, min_len=10, max_len=96, max_tokens=31,
                 detect_english=False, detect_duplicates=False,
                 fetch=default_fetch, batch_sleep=0.3, grid_sleep=0.5):
        self.poolsize = poolsize
        self.min_len = min_len
        self.max_len = max_len
        self.max_tokens = max_tokens
        self.detect_english = detect_english
        self.detect_duplicates = detect_duplicates
        self.fetch = fetch
        # the reference's politeness throttles (crawlers.py:188,303):
        # pause between caption-page batches and between grid pages so a
        # wide pool doesn't hammer the site; tests pass 0
        self.batch_sleep = batch_sleep
        self.grid_sleep = grid_sleep

    # -- per-template pipeline ---------------------------------------------
    def _clean_filter(self, memes):
        """clean_text + check_text over raw (score, top, bottom) triples
        (parity: crawlers.py:128-142)."""
        kept = []
        for score, top, bottom in memes:
            top, bottom = clean_text(top), clean_text(bottom)
            text = f"{top} {bottom}".lower()
            if check_text(text, self.min_len, self.max_len, self.max_tokens):
                kept.append((score, top, bottom))
        return kept

    def _fetch_caption_pages(self, executor, link, pages):
        """Fetches caption pages concurrently, returning filtered triples."""
        if self.batch_sleep:
            time.sleep(self.batch_sleep)
        futures = [
            executor.submit(crawl_template_page, link, p, self.fetch)
            for p in pages
        ]
        captions = []
        for fut in futures:
            try:
                _, memes, _ = fut.result()
            except Exception as e:  # noqa: BLE001 — one malformed page
                # (empty body -> lxml ParserError, odd score text, ...)
                # must not abort a multi-hour crawl; the reference's pool
                # callbacks silently skipped such pages
                print(f"    caption page failed: {e!r}")
                continue
            if memes:
                captions += self._clean_filter(memes)
        return captions

    def _is_english(self, captions):
        from deephumor_tpu.data.utils import english_prob

        import numpy as np

        text = " ".join(f"{t} {b}".lower() for _, t, b in captions)
        if not text.strip():
            return False, 0.0
        prob = float(np.mean([english_prob(text) for _ in range(5)]))
        return prob >= 0.9, prob

    @staticmethod
    def _dedup(captions, seen):
        """Keeps captions whose text is not >0.9-similar to any kept one
        (parity: crawlers.py:224-242)."""
        from Levenshtein import ratio as sim_ratio

        unique = []
        for score, top, bottom in captions:
            text = f"{top} {bottom}".lower()
            if all(sim_ratio(text, other) <= 0.9 for other in seen):
                unique.append((score, top, bottom))
                seen.append(text)
        return unique

    def collect_template_captions(self, executor, link, num_captions,
                                  max_extra_rounds=20):
        """Gathers (and optionally dedups) captions for one template.

        Returns ``(captions, eng)`` where ``eng`` is ``None`` when the
        English gate is off, else ``(ok, prob)``. The gate runs on the
        INITIAL page batch, BEFORE the duplicate top-up loop (reference
        crawlers.py:202-207 order) — a non-English template must not pay
        up to ~180 extra page fetches and the O(n^2) dedup first."""
        num_pages = max(1, num_captions // self.CAPTIONS_PER_PAGE)
        num_pages += 10 - num_pages % 10  # reference page-count rounding
        captions = self._fetch_caption_pages(
            executor, link, range(1, num_pages + 1)
        )

        eng = None
        if self.detect_english:
            eng = self._is_english(captions)
            if not eng[0]:
                return captions, eng

        if not self.detect_duplicates:
            return captions, eng

        seen = []
        unique = self._dedup(captions, seen)
        page = num_pages
        rounds = 0
        while len(unique) < num_captions and rounds < max_extra_rounds:
            more = self._fetch_caption_pages(
                executor, link, range(page + 1, page + 10)
            )
            if not more:
                break
            unique += self._dedup(more, seen)
            page += 9
            rounds += 1
        return unique, eng

    # -- dataset loop --------------------------------------------------------
    def crawl_dataset(self, num_templates=300, num_captions=3000,
                      save_dir="memes"):
        """Crawls until ``num_templates`` templates have ``num_captions``
        captions each; writes templates.txt / captions.txt / images/."""
        images_dir = os.path.join(save_dir, "images")
        os.makedirs(images_dir, exist_ok=True)
        start = time.time()
        total_templates = total_captions = 0
        temp_page = 1

        def progress():
            pct = 100.0 * total_captions / (num_templates * num_captions)
            return f"{time_to_str(time.time() - start)}, {pct:5.2f}%"

        with open(os.path.join(save_dir, "templates.txt"), "a") as tf, \
                open(os.path.join(save_dir, "captions.txt"), "a") as cf, \
                ThreadPoolExecutor(self.poolsize) as executor:
            while total_templates < num_templates:
                if temp_page > 1 and self.grid_sleep:
                    time.sleep(self.grid_sleep)
                templates = crawl_templates(temp_page, self.fetch)
                if not templates:
                    break
                print(f"{progress()}: Crawling page {temp_page} "
                      f"with {len(templates)} templates")

                for temp in templates:
                    label, link, src = (
                        temp["label"], temp["link"], temp["src"]
                    )
                    captions, eng = self.collect_template_captions(
                        executor, link, num_captions
                    )

                    if eng is not None and not eng[0]:
                        print(f"{progress()}:    NON_ENGLISH {label} - "
                              f"{len(captions)} captions "
                              f"(eng:{eng[1]:.3f})")
                        continue

                    if len(captions) < num_captions:
                        print(f"{progress()}:    NOT_ENOUGH {label} - "
                              f"{len(captions)} captions")
                        continue

                    captions = sorted(captions, key=lambda x: -x[0])
                    captions = captions[:num_captions]

                    tf.write(f"{label}\t{link}\t{src}\n")
                    executor.submit(load_image, src, images_dir)

                    emp = SPECIAL_TOKENS["EMPTY"]
                    sep = SPECIAL_TOKENS["SEP"]
                    for score, top, bottom in captions:
                        text = f"{top or emp} {sep} {bottom or emp}"
                        cf.write(f"{label}\t{score}\t{text}\n")

                    total_templates += 1
                    total_captions += len(captions)
                    print(f"{progress()}:    {label} - "
                          f"{len(captions)} captions ({total_captions})")
                    if total_templates == num_templates:
                        break

                temp_page += 1

        print(f"{time_to_str(time.time() - start)}: Finished: crawled "
              f"{total_templates} templates and {total_captions} captions")
        return total_templates, total_captions

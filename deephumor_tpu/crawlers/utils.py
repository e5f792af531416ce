"""Crawler support utilities (parity:
/root/reference/deephumor/crawlers/utils.py)."""

import os
import shutil

__all__ = ["time_to_str", "load_image"]


def time_to_str(seconds):
    """``MM:SS.ss`` formatting for progress lines (utils.py:7-9)."""
    return f"{int(seconds / 60.0):3d}:{(seconds % 60.0):05.2f}"


def load_image(image_url, save_dir=".", session=None):
    """Downloads an image; the filename is the URL tail (utils.py:12-29)."""
    import requests

    get = (session or requests).get
    # timeout: a stalled image host must not hang a worker thread forever
    # (crawl_dataset joins the pool on exit)
    r = get(image_url, stream=True, timeout=30)
    file_name = image_url.split("/")[-1]
    with open(os.path.join(save_dir, file_name), "wb") as out:
        shutil.copyfileobj(r.raw, out)
    return file_name

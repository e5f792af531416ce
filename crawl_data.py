"""Meme dataset crawler CLI (reference entry-point parity,
/root/reference/crawl_data.py). Logic lives in deephumor_tpu.cli."""

from deephumor_tpu.cli import crawl_main as main

if __name__ == "__main__":
    main()

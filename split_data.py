"""Dataset splitter CLI (reference entry-point parity,
/root/reference/split_data.py). Logic lives in deephumor_tpu.cli /
deephumor_tpu.data.splits."""

from deephumor_tpu.cli import split_main as main
from deephumor_tpu.data.splits import split_captions  # noqa: F401 (re-export)

if __name__ == "__main__":
    main()

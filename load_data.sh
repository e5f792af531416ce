#!/usr/bin/env bash
# Downloads the prepared memes900k dataset archive (parity with the
# reference load_data.sh Google Drive fetch) and unpacks it.
# The Drive file id is the reference's published dataset bundle.
set -euo pipefail

FILE_ID="1j6YG3skamxA1-mdogC1kRjugFuOkHt_A"
OUT="memes.zip"

CONFIRM=$(wget --quiet --save-cookies /tmp/gd_cookies.txt \
  --keep-session-cookies --no-check-certificate \
  "https://docs.google.com/uc?export=download&id=${FILE_ID}" -O- \
  | sed -rn 's/.*confirm=([0-9A-Za-z_]+).*/\1\n/p')

wget --load-cookies /tmp/gd_cookies.txt \
  "https://docs.google.com/uc?export=download&confirm=${CONFIRM}&id=${FILE_ID}" \
  -O "${OUT}"
rm -f /tmp/gd_cookies.txt

unzip -q "${OUT}"
echo "dataset unpacked"

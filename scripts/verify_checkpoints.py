#!/usr/bin/env python
"""Verify the converter against the 8 PUBLISHED reference checkpoints.

One command stands between this repo and the BASELINE parity claim:

    python scripts/verify_checkpoints.py [--work-dir /tmp/dh_ckpts]

Needs NETWORK (Google Drive). For each published checkpoint
(reference deephumor_demo.ipynb cell 13 ``FILE_TO_CLASS``; ids resolved
through the notebook's ``file_ids.txt`` manifest, cell 2):

  1. download the ``.pth`` payload ``{'model': state_dict, 'hp': dict}``,
  2. load it into the layout-exact torch oracle
     (tests/torch_oracles.py — reproduces the reference math AND
     state_dict key layout; the checkpoints carry the frozen ResNet
     weights, so torchvision is not needed),
  3. convert with ``Model.from_torch`` (deephumor_tpu/convert/torch_import.py),
  4. greedy-decode a fixed synthetic template image with both, and
  5. assert exact token-for-token parity; print a parity table.

Offline (CI) this exits 0 with a SKIP notice. The download helper mirrors
the notebook's cookie dance (cell 0 ``download_from_gdrive``).
"""

import argparse
import os
import re
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# notebook cell 2: manifest of {file name -> gdrive id}
MANIFEST_GDRIVE_ID = "1S4QwcuznRxLlxkIT0Lb6vIuqDTib41B3"

# notebook cell 13 FILE_TO_CLASS: file name -> (model_type, tokenizer)
CHECKPOINTS = {
    "LSTMDecoderWords.best.pth": ("captioning_lstm", "word"),
    "LSTMDecoderChars.best.pth": ("captioning_lstm", "char"),
    "LSTMDecoderWithLabelsWords.best.pth": ("captioning_lstm_labels", "word"),
    "LSTMDecoderWithLabelsChars.best.pth": ("captioning_lstm_labels", "char"),
    "TransformerDecoderBaseWords.best.pth":
        ("captioning_transformer_base", "word"),
    "TransformerDecoderBaseChars.best.pth":
        ("captioning_transformer_base", "char"),
    "TransformerDecoderWords.best.pth": ("captioning_transformer", "word"),
    "TransformerDecoderChars.best.pth": ("captioning_transformer", "char"),
}


def gdrive_download(file_id, dest, timeout=120):
    """Google Drive public-file download incl. the large-file confirm
    token (the notebook's wget cookie dance, cell 0)."""
    url = f"https://docs.google.com/uc?export=download&id={file_id}"
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor())
    with opener.open(url, timeout=timeout) as r:
        data = r.read()
    if data[:15].lstrip()[:1] == b"<":  # interstitial confirm page
        m = re.search(rb"confirm=([0-9A-Za-z_]+)", data)
        token = m.group(1).decode() if m else "t"
        with opener.open(f"{url}&confirm={token}", timeout=timeout) as r:
            data = r.read()
    with open(dest, "wb") as f:
        f.write(data)
    return dest


def build_oracle(model_type, hp):
    import torch_oracles as O

    if model_type == "captioning_lstm":
        m = O.OracleCaptioningLSTM(
            num_tokens=hp["num_tokens"], emb_dim=hp.get("emb_dim", 256),
            hidden_size=hp.get("hidden_size", 512),
            num_layers=hp.get("num_layers", 3))
    elif model_type == "captioning_lstm_labels":
        m = O.OracleCaptioningLSTMWithLabels(
            num_tokens=hp["num_tokens"], emb_dim=hp.get("emb_dim", 256),
            hidden_size=hp.get("hidden_size", 512),
            num_layers=hp.get("num_layers", 3))
    elif model_type == "captioning_transformer_base":
        m = O.OracleCaptioningTransformerBase(
            num_tokens=hp["num_tokens"], hid_dim=hp.get("hid_dim", 512),
            n_layers=hp.get("n_layers", 6), n_heads=hp.get("n_heads", 8),
            pf_dim=hp.get("pf_dim", 2048), max_len=hp.get("max_len", 128))
    else:
        m = O.OracleCaptioningTransformer(
            num_tokens=hp["num_tokens"], hid_dim=hp.get("hid_dim", 512),
            n_layers=hp.get("n_layers", 6), n_heads=hp.get("n_heads", 8),
            pf_dim=hp.get("pf_dim", 2048), max_len=hp.get("max_len", 128))
    return m


def verify_one(name, path, model_type, max_len=16):
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp
    from deephumor_tpu.models import MODEL_REGISTRY

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd, hp = payload["model"], dict(payload["hp"])

    oracle = build_oracle(model_type, hp)
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    if [k for k in missing if "num_batches_tracked" not in k]:
        return f"LOAD-MISMATCH missing={missing[:3]}"

    model, params = MODEL_REGISTRY[model_type].from_torch(path)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    img_t = torch.tensor(img).permute(0, 3, 1, 2)

    oracle.eval()
    with torch.no_grad():
        kwargs = {}
        if model_type == "captioning_lstm_labels":
            kwargs["labels"] = torch.tensor([[6, 7, 8]])
        want = oracle.greedy_decode(img_t, max_len=max_len, **kwargs)
    want = np.asarray(want).reshape(-1)

    x = jnp.asarray(img)
    if model_type == "captioning_lstm_labels":
        out = model.generate(params, x, labels=jnp.asarray([[6, 7, 8]]),
                             max_len=max_len, beam_size=1, top_k=1,
                             greedy=True)
    else:
        out = model.generate(params, x, max_len=max_len, beam_size=1,
                             top_k=1, greedy=True)
    got = np.asarray(out["chosen"]).reshape(-1)

    n = min(len(want), len(got))
    # both sides truncate at EOS; compare up to and including it
    if (want[:n] == got[:n]).all():
        return f"PARITY OK ({n} tokens)"
    first = int(np.argmax(want[:n] != got[:n]))
    return (f"MISMATCH at token {first}: torch={want[:n].tolist()} "
            f"jax={got[:n].tolist()}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work-dir", default="/tmp/dh_ckpts")
    ap.add_argument("--only", help="substring filter on checkpoint names")
    args = ap.parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    manifest_path = os.path.join(args.work_dir, "file_ids.txt")
    try:
        if not os.path.exists(manifest_path):
            gdrive_download(MANIFEST_GDRIVE_ID, manifest_path)
    except OSError as e:
        print(f"SKIP: no network ({e}); this script verifies the real "
              "published checkpoints and needs Google Drive access.")
        return 0

    file_ids = {}
    with open(manifest_path) as f:
        for line in f:
            if "\t" in line:
                k, v = line.strip().split("\t")
                file_ids[k] = v

    results = {}
    for name, (model_type, tok) in CHECKPOINTS.items():
        if args.only and args.only not in name:
            continue
        if name not in file_ids:
            results[name] = "NO-ID in manifest"
            continue
        path = os.path.join(args.work_dir, name)
        try:
            if not os.path.exists(path):
                gdrive_download(file_ids[name], path)
            results[name] = verify_one(name, path, model_type)
        except Exception as e:  # noqa: BLE001 - report per checkpoint
            results[name] = f"ERROR {type(e).__name__}: {e}"

    width = max(len(n) for n in results) if results else 0
    print("\n== checkpoint parity table ==")
    ok = True
    for name, res in results.items():
        print(f"{name:<{width}}  {res}")
        ok &= res.startswith("PARITY OK")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

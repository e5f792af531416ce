"""Minimal HTTP meme-caption server over the dynamic batcher.

Concurrent requests coalesce into padded TPU batches
(deephumor_tpu.serving.DynamicBatcher) so the endpoint rides the decode
engine's large-batch throughput while bounding added latency to
``--max-wait-ms``.

    # synthetic smoke mode (random tiny model, 3 random templates):
    python examples/serve.py --synthetic --port 8080

    # real checkpoint:
    python examples/serve.py --ckpt runs/word.best --vocab vocab.txt \
        --templates data/memes900k --port 8080

    GET /caption?template=<id>            -> text/plain caption
    GET /meme?template=<id>               -> image/png rendered meme
    GET /healthz                          -> ok + batcher counters

Reference counterpart: none (the reference serves from a notebook,
deephumor_demo.ipynb cell 35); this is new serving surface.
"""

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

import jax


def build_synthetic():
    from PIL import Image

    from deephumor_tpu.data import Vocab
    from deephumor_tpu.models import CaptioningTransformerBase
    from deephumor_tpu.pipeline import MemeGenerationPipeline

    vocab = Vocab([f"word{i}" for i in range(120)])
    model = CaptioningTransformerBase(
        num_tokens=len(vocab), hid_dim=32, n_layers=2, n_heads=2,
        pf_dim=64, max_len=18, enc_dropout=0.0, dec_dropout=0.0)
    params = model.init(jax.random.PRNGKey(0))
    pipe = MemeGenerationPipeline(model, params, vocab)
    rng = np.random.default_rng(0)
    ids = ["one", "two", "three"]
    images = rng.normal(size=(3, 224, 224, 3)).astype(np.float32)
    pils = [Image.fromarray(
        rng.integers(0, 255, (300, 400, 3), dtype=np.uint8))
        for _ in ids]
    pipe.add_templates(ids, images, pil_images=pils)
    return pipe, dict(max_len=12, beam_size=3, top_k=32)


def build_real(ckpt, vocab_path, data_dir, num_templates):
    from PIL import Image

    from deephumor_tpu.data import Vocab, WordPunctTokenizer
    from deephumor_tpu.data.datasets import MemeDataset
    from deephumor_tpu.models import MODEL_REGISTRY
    from deephumor_tpu.pipeline import MemeGenerationPipeline
    from deephumor_tpu.utils.pytree import load_params

    _, hp = load_params(ckpt)
    model_type = hp.get("model_type", "captioning_transformer")
    model, params = MODEL_REGISTRY[model_type].from_pretrained(ckpt)
    vocab = Vocab.load(vocab_path)
    ds = MemeDataset(data_dir, vocab, WordPunctTokenizer(),
                     split="train", num_classes=num_templates)
    pipe = MemeGenerationPipeline(model, params, vocab)
    ids = list(ds.images)
    pils = [Image.open(ds.templates[t]) for t in ids]
    pipe.add_templates(ids, np.stack([ds.images[t] for t in ids]),
                       pil_images=pils)
    return pipe, dict(max_len=32, beam_size=5, top_k=64)


def make_handler(caption_srv, meme_srv):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _send(self, code, body, ctype="text/plain"):
            data = body if isinstance(body, bytes) else body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)
            tid = (q.get("template") or [None])[0]
            try:
                if url.path == "/healthz":
                    self._send(200, json.dumps({
                        "ok": True,
                        "batches": caption_srv.batches_dispatched
                        + meme_srv.batches_dispatched,
                        "requests": caption_srv.requests_served
                        + meme_srv.requests_served,
                    }), "application/json")
                elif url.path == "/caption" and tid:
                    self._send(200, caption_srv.submit(tid).result(120))
                elif url.path == "/captions" and q.get("template"):
                    # batch route: repeated ?template= params, one queue
                    # hop total (serving.submit_many; per-id failures
                    # surface in the JSON instead of failing the batch)
                    futs = caption_srv.submit_many(q["template"])
                    out = []
                    for t, f in zip(q["template"], futs):
                        try:
                            out.append({"template": t,
                                        "caption": f.result(120)})
                        except KeyError:
                            out.append({"template": t,
                                        "error": "unknown template"})
                    self._send(200, json.dumps(out), "application/json")
                elif url.path == "/meme" and tid:
                    text, img = meme_srv.submit(tid).result(120)
                    buf = io.BytesIO()
                    img.save(buf, "PNG")
                    self._send(200, buf.getvalue(), "image/png")
                else:
                    self._send(404, "unknown route or missing ?template=")
            except KeyError:
                self._send(404, f"unknown template {tid!r}")
            except Exception as e:  # noqa: BLE001 — per-request isolation
                self._send(500, f"{type(e).__name__}: {e}")

    return Handler


def main(argv=None, ready_event=None):
    from deephumor_tpu.serving import DynamicBatcher

    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--ckpt")
    ap.add_argument("--vocab")
    ap.add_argument("--templates", help="memes900k-style data dir")
    ap.add_argument("--num-templates", type=int, default=300)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=256)
    ap.add_argument("--max-wait-ms", type=float, default=8.0)
    ap.add_argument("--buckets", default="auto",
                    help='"auto" (default), "none" (always pad to '
                         "max-batch), or comma-separated sizes, e.g. "
                         '"32,128"')
    args = ap.parse_args(argv)
    if args.buckets == "none":
        buckets = None
    elif args.buckets == "auto":
        buckets = "auto"
    else:
        try:
            buckets = [int(x) for x in args.buckets.split(",")]
        except ValueError:
            ap.error(f"--buckets {args.buckets!r}: expected 'auto', "
                     "'none', or comma-separated ints like '32,128'")

    if args.synthetic:
        pipe, gen = build_synthetic()
    else:
        if not (args.ckpt and args.vocab and args.templates):
            ap.error("--ckpt/--vocab/--templates required without "
                     "--synthetic")
        pipe, gen = build_real(args.ckpt, args.vocab, args.templates,
                               args.num_templates)

    caption_srv = DynamicBatcher(pipe, max_batch=args.max_batch,
                                 max_wait_ms=args.max_wait_ms,
                                 buckets=buckets, **gen)
    meme_srv = DynamicBatcher(pipe, max_batch=args.max_batch,
                              max_wait_ms=args.max_wait_ms, render=True,
                              buckets=buckets, key=jax.random.PRNGKey(1),
                              **gen)
    # compile every bucket executable so the first requests are hot
    caption_srv.warmup()

    httpd = ThreadingHTTPServer(("127.0.0.1", args.port),
                                make_handler(caption_srv, meme_srv))
    print(f"serving on http://127.0.0.1:{httpd.server_address[1]} "
          f"(templates: {len(pipe._images)})", flush=True)
    if ready_event is not None:
        ready_event.httpd = httpd
        ready_event.set()
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        caption_srv.close()
        meme_srv.close()


if __name__ == "__main__":
    main()

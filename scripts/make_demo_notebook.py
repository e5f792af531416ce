"""Builds examples/deephumor_demo_tpu.ipynb — the interactive-demo
equivalent of the reference's ``deephumor_demo.ipynb`` (its only inference
entry point; reference cells 9-49).

The notebook is generated from this script so it stays reviewable in git
and regenerable; run ``python scripts/make_demo_notebook.py`` after
editing. ``tests/test_demo_notebook.py`` executes the committed notebook
headlessly in synthetic mode on CPU.
"""

import nbformat as nbf

nb = nbf.v4.new_notebook()
cells = []


def md(text):
    cells.append(nbf.v4.new_markdown_cell(text))


def code(src):
    cells.append(nbf.v4.new_code_cell(src))


md("""\
# DeepHumor-TPU — interactive demo

TPU-native rebuild of the [deephumor](https://github.com/ilya16/deephumor)
meme-caption generator. This notebook mirrors the reference's
`deephumor_demo.ipynb` (its only inference entry point): load a
vocabulary + tokenizer, build or load each of the four caption model
architectures, generate captions for a template image with the
stochastic top-k/temperature beam search, and render the final meme.

Two ways to run it:

- **With the published checkpoints** (the reference notebook's flow):
  download the 8 `.pth` files + vocabs with
  `python scripts/verify_checkpoints.py --download-dir /tmp/dh_ckpts`
  (needs network) and set `CKPT_DIR` below.
- **Synthetic mode** (default, fully offline): random weights and a toy
  vocabulary — exercises the identical code path end to end.

On a TPU host JAX picks the chip up automatically; everything here also
runs on CPU (set `JAX_PLATFORMS=cpu` to force it).
""")

code("""\
import os

# offline/synthetic by default — point at converted checkpoints to use
# the published models (reference notebook cell 13 FILE_TO_CLASS)
CKPT_DIR = os.environ.get("DEMO_CKPT_DIR", "")
SYNTHETIC = not CKPT_DIR

import numpy as np
from PIL import Image

import jax

if os.environ.get("DEMO_FORCE_CPU"):
    # headless-CI escape hatch: hosts whose site hooks pin an
    # accelerator platform need the config override, not just the
    # JAX_PLATFORMS env var (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

print(jax.devices())""")

md("""\
## Template image

The reference demo picks a memegenerator.net template (cell 34). Use any
image; without one we draw noise so the notebook runs anywhere.
""")

code("""\
from deephumor_tpu.ops.image_ops import preprocess_pil

IMAGE_PATH = os.environ.get("DEMO_IMAGE", "")
if IMAGE_PATH:
    pil = Image.open(IMAGE_PATH).convert("RGB")
else:
    rng = np.random.default_rng(0)
    pil = Image.fromarray(
        rng.integers(0, 255, (300, 400, 3), dtype=np.uint8), "RGB")

# ResNet-50 preprocessing: 224x224 resize + ImageNet normalize
img = jnp.asarray(preprocess_pil(pil))[None]
pil""")

md("""\
## Vocabulary + tokenizer

Word-level here (`WordPunctTokenizer`, the reference's default); flip
`TOKENIZER` to `"char"` for the char models. Special-token ids are
pinned: pad=0, unk=1, bos=2, eos=3, sep=4, emp=5.
""")

code("""\
from deephumor_tpu.data import Vocab, WordPunctTokenizer, CharTokenizer

TOKENIZER = "word"  # or "char"

tokenizer = WordPunctTokenizer() if TOKENIZER == "word" else CharTokenizer()
if SYNTHETIC:
    vocab = (Vocab([f"w{i}" for i in range(500)]) if TOKENIZER == "word"
             else Vocab(list("abcdefghijklmnopqrstuvwxyz '!?.")))
else:
    vocab = Vocab.load(os.path.join(
        CKPT_DIR, "vocab_words.txt" if TOKENIZER == "word"
        else "vocab_chars.txt"))
len(vocab), vocab.tokens[:8]""")

md("""\
## The four architectures

Reference notebook cell 13 (`FILE_TO_CLASS`): LSTM, LSTM+labels,
decoder-only Transformer, and the flagship Transformer with
cross-attention over 49 spatial ResNet features. Generation settings are
the notebook's (cells 35, 42-49): word `max_len=32, beam=10, top_k=70`;
char `max_len=128, beam=7, top_k=50, T=1.1`.

Generation runs the TPU-native engine: the whole beam-search token loop
is one jitted `lax.while_loop` over KV caches — no per-token host sync.
""")

code("""\
from deephumor_tpu.models import MODEL_REGISTRY

GEN = (dict(max_len=32, beam_size=10, top_k=70, temperature=1.0)
       if TOKENIZER == "word"
       else dict(max_len=128, beam_size=7, top_k=50, temperature=1.1))
GEN["top_k"] = min(GEN["top_k"], len(vocab))
GEN["beam_size"] = min(GEN["beam_size"], GEN["top_k"])

suffix = "Words" if TOKENIZER == "word" else "Chars"
ARCHS = [  # checkpoint file -> registry key (reference cell 13)
    (f"LSTMDecoder{suffix}.best.pth", "captioning_lstm"),
    (f"LSTMDecoderWithLabels{suffix}.best.pth", "captioning_lstm_labels"),
    (f"TransformerDecoderBase{suffix}.best.pth",
     "captioning_transformer_base"),
    (f"TransformerDecoder{suffix}.best.pth", "captioning_transformer"),
]


def build(fname, model_type):
    cls = MODEL_REGISTRY[model_type]
    if SYNTHETIC:
        if "transformer" in model_type:
            model = cls(num_tokens=len(vocab), hid_dim=64, n_layers=2,
                        n_heads=4, pf_dim=128, max_len=GEN["max_len"] + 2)
        else:
            model = cls(num_tokens=len(vocab), emb_dim=32, hidden_size=64,
                        num_layers=2)
        return model, model.init(jax.random.PRNGKey(hash(fname) % 2**31))
    return cls.from_torch(os.path.join(CKPT_DIR, fname))

models = {mt: build(f, mt) for f, mt in ARCHS}
list(models)""")

md("""\
## Generate + render

`seq_to_text` truncates at the first EOS; `split_caption` splits on
`<sep>` into top/bottom halves; `memeify_image` renders Impact-style
text with the packaged font (drop a `fonts/impact.ttf` into
`deephumor_tpu/imaging/fonts/` to use the original).
""")

code("""\
from deephumor_tpu.experiments.inference import (
    seq_to_text, split_caption, text_to_seq)
from deephumor_tpu.imaging import memeify_image

LABEL = "grumpy cat"  # template label, used by the labels model
memes = {}
for fname, model_type in ARCHS:
    model, params = models[model_type]
    kwargs = dict(GEN)
    if model.with_labels:
        ids = jnp.asarray(text_to_seq(LABEL, vocab, tokenizer))
        out = model.generate(params, img, labels=ids,
                             key=jax.random.PRNGKey(1), **kwargs)
    else:
        out = model.generate(params, img, key=jax.random.PRNGKey(1),
                             **kwargs)
    text = seq_to_text(np.asarray(out["chosen"])[0], vocab,
                       delimiter=" " if TOKENIZER == "word" else "")
    top, bottom = split_caption(text, num_blocks=2)
    memes[model_type] = memeify_image(pil, top=top, bottom=bottom)
    print(f"{model_type:32s} {text!r}")""")

code("""\
# show the flagship's meme (last cell output renders inline)
memes["captioning_transformer"]""")

md("""\
## Batched serving (the TPU path)

The notebook's one-meme-at-a-time flow above is the parity surface; the
throughput surface is `MemeGenerationPipeline`: encode each template's
ResNet features ONCE, generate thousands of captions batched over
(memes × beams), render on host threads overlapped with device work.
See `examples/sweep_300.py` for the full 300-template sweep and
`bench.py` for the measured numbers.
""")

code("""\
from deephumor_tpu.pipeline import MemeGenerationPipeline

model, params = models["captioning_transformer"]
pipe = MemeGenerationPipeline(model, params, vocab)
pipe.add_templates(["demo"], np.asarray(img), pil_images=[pil])
caps = pipe.generate_captions(["demo"] * 8, key=jax.random.PRNGKey(2),
                              **GEN)
for c in caps[:4]:
    print(repr(c))""")

nb["cells"] = cells
nb["metadata"]["kernelspec"] = {
    "display_name": "Python 3", "language": "python", "name": "python3"}

import os
dest = os.path.join(os.path.dirname(__file__), "..", "examples",
                    "deephumor_demo_tpu.ipynb")
with open(os.path.abspath(dest), "w") as f:
    nbf.write(nb, f)
print("wrote", os.path.abspath(dest))

"""End-to-end checkpoint parity: reference .pth -> from_torch -> greedy
decode equality vs the torch oracle (BASELINE.json parity configs 1-4)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from deephumor_tpu.data.vocab import EOS_ID
from deephumor_tpu.models import MODEL_REGISTRY

from torch_oracles import (
    OracleCaptioningLSTM,
    OracleCaptioningLSTMWithLabels,
    OracleCaptioningTransformer,
    OracleCaptioningTransformerBase,
    randomize_bn_stats,
)

VOCAB = 30
MAX_LEN = 10

ORACLES = {
    "captioning_lstm": OracleCaptioningLSTM,
    "captioning_lstm_labels": OracleCaptioningLSTMWithLabels,
    "captioning_transformer_base": OracleCaptioningTransformerBase,
    "captioning_transformer": OracleCaptioningTransformer,
}


def _save_ckpt(oracle, path):
    torch.save({"model": oracle.state_dict(), "hp": oracle.hp}, path)


def _trim(seq):
    seq = [int(t) for t in np.asarray(seq).reshape(-1)]
    if EOS_ID in seq:
        return seq[: seq.index(EOS_ID) + 1]
    return seq


@pytest.mark.parametrize("layout", ["word", "char"])
@pytest.mark.parametrize("model_type", list(ORACLES))
def test_torch_checkpoint_greedy_parity(model_type, layout, tmp_path):
    """All 8 published checkpoint layouts: word/char x 4 architectures
    (notebook cell 13 FILE_TO_CLASS). Word/char differ in vocab size and
    max_len; both shapes must convert and decode with token parity."""
    torch.manual_seed(hash(model_type + layout) % (2**31))
    if layout == "char":
        kw = ({"max_len": 40} if "transformer" in model_type else {})
        oracle = ORACLES[model_type](VOCAB + 34, **kw).eval()
    else:
        oracle = ORACLES[model_type](VOCAB).eval()
    randomize_bn_stats(oracle, torch.Generator().manual_seed(11))
    ckpt = tmp_path / "model.pth"
    _save_ckpt(oracle, ckpt)

    model_cls = MODEL_REGISTRY[model_type]
    model, params = model_cls.from_torch(str(ckpt))
    assert model.num_tokens == oracle.hp["num_tokens"]

    g = torch.Generator().manual_seed(12)
    image = torch.randn(1, 3, 64, 64, generator=g)
    image_nhwc = jnp.asarray(image.numpy().transpose(0, 2, 3, 1))

    with torch.no_grad():
        if model_type == "captioning_lstm_labels":
            labels = torch.randint(6, oracle.hp["num_tokens"], (1, 3),
                                   generator=g)
            ref = oracle.greedy_decode(image, labels, MAX_LEN)
            res = model.generate(
                params, image_nhwc, labels=jnp.asarray(labels.numpy()),
                max_len=MAX_LEN, beam_size=1, top_k=VOCAB, greedy=True,
            )
        else:
            ref = oracle.greedy_decode(image, MAX_LEN)
            res = model.generate(
                params, image_nhwc, max_len=MAX_LEN, beam_size=1,
                top_k=VOCAB, greedy=True,
            )

    assert _trim(res["chosen"][0]) == _trim(ref), (
        f"{model_type}: {_trim(res['chosen'][0])} != {_trim(ref)}"
    )


def test_npz_roundtrip(tmp_path):
    # framework-native save / from_pretrained roundtrip
    import jax

    model = MODEL_REGISTRY["captioning_transformer_base"](
        num_tokens=VOCAB, hid_dim=16, n_layers=2, n_heads=4, pf_dim=24,
        max_len=16,
    )
    params = model.init(jax.random.PRNGKey(0))
    model.save(params, str(tmp_path / "m"))
    model2, params2 = MODEL_REGISTRY["captioning_transformer_base"].from_pretrained(
        str(tmp_path / "m")
    )
    assert model2 == model
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

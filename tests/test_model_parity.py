"""Numeric parity tests: converted torch weights -> identical outputs.

Each test builds a torch oracle (tests/torch_oracles.py) with random weights,
converts its state_dict through deephumor_tpu.convert.torch_import, and
compares eval-mode forward outputs elementwise (SURVEY.md §4 parity-test
strategy).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from deephumor_tpu.convert import torch_import as ti
from deephumor_tpu.models import lstm as lstm_mod
from deephumor_tpu.models import transformer as tfm
from deephumor_tpu.models.encoders import (
    image_encoder_apply,
    image_label_encoder_apply,
    label_encoder_apply,
)

from torch_oracles import (
    OracleImageEncoder,
    OracleImageLabelEncoder,
    OracleLabelEncoder,
    OracleLSTMDecoder,
    OracleMHA,
    OracleTransformerDecoder,
    randomize_bn_stats,
)

torch.manual_seed(0)


def to_nhwc(x_nchw):
    return jnp.asarray(x_nchw.numpy().transpose(0, 2, 3, 1))


@pytest.fixture(scope="module")
def images():
    g = torch.Generator().manual_seed(1)
    return torch.randn(2, 3, 64, 64, generator=g)


class TestImageEncoderParity:
    @pytest.fixture(scope="class")
    def oracle(self):
        torch.manual_seed(2)
        m = OracleImageEncoder(emb_dim=32, spatial_features=True).eval()
        randomize_bn_stats(m, torch.Generator().manual_seed(3))
        return m

    @pytest.fixture(scope="class")
    def params(self, oracle):
        sd = oracle.state_dict()
        return {
            "resnet": ti.convert_resnet(sd, "resnet"),
            "linear": ti._linear(sd, "linear"),
            "bn": ti._bn(sd, "bn"),
        }

    def test_global_and_spatial(self, oracle, params, images):
        with torch.no_grad():
            ref_emb, ref_spatial = oracle(images)
        emb, spatial = image_encoder_apply(
            params, to_nhwc(images), spatial_features=True
        )
        np.testing.assert_allclose(
            np.asarray(emb), ref_emb.numpy(), rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(spatial), ref_spatial.numpy(), rtol=1e-3, atol=1e-3
        )

    def test_spatial_grid_order(self, oracle, params, images):
        # grid flattening must be row-major h*W+w in both frameworks
        with torch.no_grad():
            feats = oracle.resnet(images)  # [bs, C, H, W]
        ref_grid = feats.reshape(2, 2048, -1).transpose(2, 1).numpy()
        from deephumor_tpu.models.resnet import resnet50_features

        mine = np.asarray(
            resnet50_features(params["resnet"], to_nhwc(images))
        ).reshape(2, -1, 2048)
        np.testing.assert_allclose(mine, ref_grid, rtol=1e-3, atol=1e-3)


class TestLabelEncoderParity:
    def test_label_encoder(self):
        torch.manual_seed(4)
        oracle = OracleLabelEncoder(num_tokens=50, emb_dim=16).eval()
        sd = oracle.state_dict()
        params = {"embedding": ti._embedding(sd, "embedding.weight")}
        labels = torch.randint(0, 50, (3, 5))
        with torch.no_grad():
            ref = oracle(labels)
        out = label_encoder_apply(params, jnp.asarray(labels.numpy()))
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), rtol=1e-5, atol=1e-5
        )

    def test_image_label_encoder(self, images):
        torch.manual_seed(5)
        oracle = OracleImageLabelEncoder(num_tokens=50, emb_dim=32).eval()
        randomize_bn_stats(oracle, torch.Generator().manual_seed(6))
        sd = oracle.state_dict()
        params = {
            "image_encoder": ti._convert_image_encoder(sd, "image_encoder"),
            "label_encoder": {
                "embedding": ti._embedding(sd, "label_encoder.embedding.weight")
            },
            "linear": ti._linear(sd, "linear"),
        }
        labels = torch.randint(0, 50, (2, 4))
        with torch.no_grad():
            ref = oracle(images, labels)
        out = image_label_encoder_apply(
            params, to_nhwc(images), jnp.asarray(labels.numpy())
        )
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), rtol=1e-3, atol=1e-3
        )


class TestLSTMParity:
    def test_decoder_forward(self):
        torch.manual_seed(7)
        oracle = OracleLSTMDecoder(
            num_tokens=40, emb_dim=16, hidden_size=24, num_layers=3
        ).eval()
        sd = oracle.state_dict()
        params = {
            "embedding": ti._embedding(sd, "embedding.weight"),
            "lstm": ti._convert_lstm(sd, "lstm"),
            "classifier": ti._linear(sd, "classifier"),
        }
        captions = torch.randint(0, 40, (3, 7))
        image_emb = torch.randn(3, 16)
        with torch.no_grad():
            ref = oracle(image_emb, captions)
        out = lstm_mod.lstm_decoder_forward(
            params,
            jnp.asarray(image_emb.numpy()),
            jnp.asarray(captions.numpy()),
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_step_matches_forward(self):
        # incremental stepping must reproduce the full scan outputs
        import jax

        params = lstm_mod.lstm_init(jax.random.PRNGKey(0), 8, 12, 2)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
        outs, (h, c) = lstm_mod.lstm_forward(params, x)
        h_s = jnp.zeros((2, 2, 12))
        c_s = jnp.zeros((2, 2, 12))
        step_outs = []
        for t in range(5):
            o, (h_s, c_s) = lstm_mod.lstm_step(params, x[:, t], h_s, c_s)
            step_outs.append(o)
        np.testing.assert_allclose(
            np.stack(step_outs, 1), np.asarray(outs), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_s), rtol=1e-5, atol=1e-6)


class TestMHAParity:
    def test_masked_attention(self):
        torch.manual_seed(8)
        oracle = OracleMHA(hid_dim=32, n_heads=4).eval()
        params = ti._convert_mha(
            {f"m.{k}": v for k, v in oracle.state_dict().items()}, "m"
        )
        x = torch.randn(2, 6, 32)
        mask = torch.zeros(2, 6, 6, dtype=torch.bool)
        mask[:, :, -2:] = True
        with torch.no_grad():
            ref = oracle(x, x, x, mask=mask)
        out = tfm.mha_apply(
            params,
            jnp.asarray(x.numpy()),
            jnp.asarray(x.numpy()),
            jnp.asarray(x.numpy()),
            n_heads=4,
            mask=jnp.asarray(mask.numpy()),
        )
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5
        )


class TestTransformerDecoderParity:
    @pytest.mark.parametrize("cross", [True, False])
    @pytest.mark.parametrize("seq_len", [5, 20])
    def test_forward(self, cross, seq_len):
        # seq_len=5 exercises dec < enc padding; 20 exercises dec > enc
        torch.manual_seed(9)
        enc_len = 9
        oracle = OracleTransformerDecoder(
            num_tokens=40, hid_dim=32, n_layers=2, n_heads=4, pf_dim=48,
            max_len=32, pad_index=0, cross=cross,
        ).eval()
        sd = {f"decoder.{k}": v for k, v in oracle.state_dict().items()}
        params = ti._convert_transformer_decoder(sd, "decoder")

        tokens = torch.randint(1, 40, (2, seq_len))
        tokens[0, -2:] = 0  # trailing pads in one sequence
        start_emb = torch.randn(2, 32)
        enc_out = torch.randn(2, enc_len, 32)

        with torch.no_grad():
            if cross:
                ref = oracle(tokens, enc_out, start_emb)
            else:
                ref = oracle(tokens, start_emb=start_emb)

        if cross:
            out = tfm.transformer_decoder_forward(
                params,
                jnp.asarray(tokens.numpy()),
                jnp.asarray(enc_out.numpy()),
                jnp.asarray(start_emb.numpy()),
                n_heads=4,
            )
        else:
            out = tfm.self_attn_decoder_forward(
                params,
                jnp.asarray(tokens.numpy()),
                jnp.asarray(start_emb.numpy()),
                n_heads=4,
            )
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-4
        )


def test_rectangular_forward_matches_padded():
    # divergence #13: the Trainer's rectangular forward must equal the
    # reference-shaped padded forward at every real position (eval mode)
    import jax
    import jax.numpy as jnp

    from deephumor_tpu.models import CaptioningTransformer

    model = CaptioningTransformer(
        num_tokens=128, hid_dim=32, n_layers=2, n_heads=2, pf_dim=64,
        max_len=60,
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    for t in (5, 20):  # dec shorter and longer than nothing special; enc=4
        caps = jnp.asarray(rng.integers(6, 128, size=(2, t)), jnp.int32)
        padded = np.asarray(model.forward(params, imgs, caps))
        rect = np.asarray(
            model.forward(params, imgs, caps, rectangular=True))
        assert rect.shape == (2, t + 1, 128)
        np.testing.assert_allclose(rect, padded[:, : t + 1], atol=1e-5)


def test_self_attn_decoder_pos_table_bound_check():
    # the decoder-only forward must fail loudly (not silently clamp the
    # positional gather) when the sequence outgrows the table — same
    # contract as the cross-attention forward
    import jax

    from deephumor_tpu.models import CaptioningTransformerBase

    model = CaptioningTransformerBase(
        num_tokens=32, hid_dim=16, n_layers=1, n_heads=2, pf_dim=24,
        max_len=8,
    )
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    # 10 tokens + the prepended image embedding = 11 positions > 8 rows
    toks = jnp.asarray(rng.integers(6, 32, size=(2, 10)), jnp.int32)
    with pytest.raises(ValueError, match="positional table"):
        tfm.self_attn_decoder_forward(
            params["decoder"]["transformer"]
            if "transformer" in params.get("decoder", {})
            else params["decoder"], toks, img, n_heads=2)

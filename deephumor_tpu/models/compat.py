"""Reference-name handles onto the functional layer implementations.

The reference exports layer CLASSES from ``deephumor.models``
(/root/reference/deephumor/models/__init__.py:17-25: ImageEncoder,
ImageLabelEncoder, LSTMDecoder, TransformerEncoder, TransformerDecoder,
plus the caption models). This framework's layers are pure functions over
parameter pytrees; these namespace classes carry the same names so code
importing the reference surface finds working equivalents:

    from deephumor.models import ImageEncoder
    params = ImageEncoder.init(key, emb_dim=256)
    emb = ImageEncoder.apply(params, images)

Each attribute is the functional implementation itself (documented in its
own module); nothing here adds behavior.
"""

from deephumor_tpu.models import encoders as _enc
from deephumor_tpu.models import lstm as _lstm
from deephumor_tpu.models import transformer as _tfm

__all__ = [
    "ImageEncoder",
    "LabelEncoder",
    "ImageLabelEncoder",
    "LSTMDecoder",
    "TransformerEncoder",
    "TransformerDecoder",
    "SelfAttentionTransformerDecoder",
]


class ImageEncoder:
    """Frozen ResNet-50 + projection head (reference encoders.py:7-70)."""

    init = staticmethod(_enc.image_encoder_init)
    apply = staticmethod(_enc.image_encoder_apply)
    trunk = staticmethod(_enc.image_encoder_trunk)


class LabelEncoder:
    """Mean-pooled label embedding (reference encoders.py:73-106)."""

    init = staticmethod(_enc.label_encoder_init)
    apply = staticmethod(_enc.label_encoder_apply)


class ImageLabelEncoder:
    """Image + label fusion encoder (reference encoders.py:109-144)."""

    init = staticmethod(_enc.image_label_encoder_init)
    apply = staticmethod(_enc.image_label_encoder_apply)


class LSTMDecoder:
    """Embedding -> stacked LSTM -> classifier (reference
    rnn_models.py:8-143)."""

    init = staticmethod(_lstm.lstm_decoder_init)
    forward = staticmethod(_lstm.lstm_decoder_forward)
    step = staticmethod(_lstm.lstm_step)


class TransformerEncoder:
    """Post-LN encoder stack (reference transformers.py:168-306; the
    reference's forward is broken — this one works, divergence #5)."""

    init = staticmethod(_tfm.transformer_encoder_init)
    forward = staticmethod(_tfm.transformer_encoder_forward)


class TransformerDecoder:
    """Cross-attention decoder (reference transformers.py:309-579)."""

    init = staticmethod(_tfm.transformer_decoder_init)
    forward = staticmethod(_tfm.transformer_decoder_forward)
    decode_step = staticmethod(_tfm.decode_step)


class SelfAttentionTransformerDecoder:
    """Decoder-only variant (reference transformers.py:582-825)."""

    init = staticmethod(_tfm.self_attn_decoder_init)
    forward = staticmethod(_tfm.self_attn_decoder_forward)
    decode_step = staticmethod(_tfm.decode_step)

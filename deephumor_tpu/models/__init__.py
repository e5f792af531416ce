"""Models layer.

Public surface mirrors the reference ``deephumor.models`` package
(/root/reference/deephumor/models/__init__.py:17-25) with the framework's
functional API.
"""

from deephumor_tpu.models.caption_models import (
    MODEL_REGISTRY,
    CaptioningLSTM,
    CaptioningLSTMWithLabels,
    CaptioningTransformer,
    CaptioningTransformerBase,
)
from deephumor_tpu.models.encoders import (
    image_encoder_apply,
    image_encoder_init,
    image_label_encoder_apply,
    image_label_encoder_init,
    label_encoder_apply,
    label_encoder_init,
)
from deephumor_tpu.models.sampling import beam_search, filter_top_k
from deephumor_tpu.models.compat import (
    ImageEncoder,
    LabelEncoder,
    ImageLabelEncoder,
    LSTMDecoder,
    TransformerEncoder,
    TransformerDecoder,
    SelfAttentionTransformerDecoder,
)

__all__ = [
    # reference-name layer handles (models/compat.py)
    "ImageEncoder",
    "LabelEncoder",
    "ImageLabelEncoder",
    "LSTMDecoder",
    "TransformerEncoder",
    "TransformerDecoder",
    "SelfAttentionTransformerDecoder",
    "MODEL_REGISTRY",
    "CaptioningLSTM",
    "CaptioningLSTMWithLabels",
    "CaptioningTransformer",
    "CaptioningTransformerBase",
    "image_encoder_init",
    "image_encoder_apply",
    "label_encoder_init",
    "label_encoder_apply",
    "image_label_encoder_init",
    "image_label_encoder_apply",
    "beam_search",
    "filter_top_k",
]

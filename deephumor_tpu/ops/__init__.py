"""Compute ops: image preprocessing, Pallas kernels."""

from deephumor_tpu.ops.image_ops import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    preprocess_batch,
    preprocess_pil,
)

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "preprocess_pil",
    "preprocess_batch",
]

"""Image preprocessing ops.

The reference pipeline (demo notebook cell 11) is torchvision
``Resize((224, 224))`` (PIL bilinear) -> ToTensor -> ImageNet Normalize.
Two paths are provided:

- :func:`preprocess_pil`: host-side PIL resize — bit-compatible with the
  reference's interpolation, used for parity and dataset preload.
- :func:`preprocess_batch`: fully jitted device path (jax.image bilinear +
  fused normalize) for high-throughput serving where exact PIL resize
  equality is not required.
"""

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "preprocess_pil",
    "preprocess_batch",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_pil(img, size=(224, 224)):
    """PIL.Image -> normalized float32 NHWC array ``[H, W, 3]``.

    Matches torchvision Resize+ToTensor+Normalize (PIL bilinear).
    """
    from PIL import Image

    img = img.convert("RGB").resize(size[::-1], Image.BILINEAR)
    x = np.asarray(img, np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


@jax.jit
def preprocess_batch(images_u8, size=(224, 224)):
    """uint8 NHWC batch -> resized + normalized float32 NHWC, on device."""
    x = images_u8.astype(jnp.float32) / 255.0
    bs = x.shape[0]
    x = jax.image.resize(
        x, (bs, size[0], size[1], 3), method="bilinear"
    )
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std

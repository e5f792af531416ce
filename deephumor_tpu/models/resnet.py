"""ResNet-50 feature extractor in pure JAX (NHWC, TPU-native layout).

Replaces the reference's frozen torchvision backbone
(/root/reference/deephumor/models/encoders.py:34-38 — ``resnet50`` truncated
before avgpool/fc). The network is inference-only by design: the reference
freezes all ResNet parameters, so we always normalize with running BN stats
(the reference technically leaves BN layers in train mode during training —
an upstream quirk we deliberately do not inherit; documented divergence).

Weights come from torch checkpoints via
deephumor_tpu/convert/torch_import.py (conv kernels transposed OIHW->HWIO).

Channel layout: NHWC throughout — XLA's preferred TPU conv layout; the
224x224x3 input produces a 7x7x2048 feature map.
"""

import jax
import jax.numpy as jnp

from deephumor_tpu.models import layers as L

__all__ = [
    "resnet50_init",
    "resnet50_features",
    "BLOCK_COUNTS",
    "STAGE_WIDTHS",
]

# (blocks per stage, bottleneck width per stage) for ResNet-50
BLOCK_COUNTS = (3, 4, 6, 3)
STAGE_WIDTHS = (64, 128, 256, 512)
_EXPANSION = 4
_BN_EPS = 1e-5


def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    """Kaiming-normal fan-out init (torchvision's resnet conv init)."""
    fan_out = kh * kw * cout
    std = (2.0 / fan_out) ** 0.5
    return {"kernel": jax.random.normal(key, (kh, kw, cin, cout), dtype) * std}


def _bn_init(dim, dtype=jnp.float32):
    # same param layout as the rest of the stack — one definition
    return L.batch_norm_init(dim, dtype)


def _conv(params, x, stride=1):
    # torch-style symmetric padding ((k-1)//2 each side); XLA's "SAME"
    # pads asymmetrically under stride 2, which diverges from torch
    k = params["kernel"].shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        params["kernel"],
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(params, x):
    # inference-mode BN folded as scale/shift over the channel axis
    # (kept as the FOLDED form rather than L.batch_norm(train=False):
    # the precomputed inv keeps one multiply per element, and the fold's
    # float rounding is what the torch-oracle parity tolerances pin)
    inv = jax.lax.rsqrt(params["var"] + _BN_EPS) * params["scale"]
    return x * inv + (params["bias"] - params["mean"] * inv)


def _bottleneck_init(key, cin, width, stride, dtype=jnp.float32):
    keys = jax.random.split(key, 4)
    cout = width * _EXPANSION
    params = {
        "conv1": _conv_init(keys[0], 1, 1, cin, width, dtype),
        "bn1": _bn_init(width, dtype),
        "conv2": _conv_init(keys[1], 3, 3, width, width, dtype),
        "bn2": _bn_init(width, dtype),
        "conv3": _conv_init(keys[2], 1, 1, width, cout, dtype),
        "bn3": _bn_init(cout, dtype),
    }
    if stride != 1 or cin != cout:
        params["downsample"] = {
            "conv": _conv_init(keys[3], 1, 1, cin, cout, dtype),
            "bn": _bn_init(cout, dtype),
        }
    return params


def _bottleneck(params, x, stride):
    identity = x
    out = jax.nn.relu(_bn(params["bn1"], _conv(params["conv1"], x)))
    out = jax.nn.relu(_bn(params["bn2"], _conv(params["conv2"], out, stride)))
    out = _bn(params["bn3"], _conv(params["conv3"], out))
    if "downsample" in params:
        identity = _bn(
            params["downsample"]["bn"],
            _conv(params["downsample"]["conv"], x, stride),
        )
    return jax.nn.relu(out + identity)


def resnet50_init(key, dtype=jnp.float32):
    """Random-initialized ResNet-50 parameter pytree (no pretrained download;
    real weights come from checkpoint conversion)."""
    n_stages = len(BLOCK_COUNTS)
    keys = jax.random.split(key, 1 + n_stages)
    params = {
        "conv1": _conv_init(keys[0], 7, 7, 3, 64, dtype),
        "bn1": _bn_init(64, dtype),
    }
    cin = 64
    for s, (blocks, width) in enumerate(zip(BLOCK_COUNTS, STAGE_WIDTHS)):
        stage_keys = jax.random.split(keys[1 + s], blocks)
        stage = []
        stride = 1 if s == 0 else 2
        for b in range(blocks):
            stage.append(
                _bottleneck_init(
                    stage_keys[b], cin, width, stride if b == 0 else 1, dtype
                )
            )
            cin = width * _EXPANSION
        params[f"layer{s + 1}"] = stage
    return params


def _maxpool_3x3_s2(x):
    # torch MaxPool2d(kernel=3, stride=2, padding=1) on NHWC
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def resnet50_features(params, x):
    """Feature map of the truncated ResNet-50.

    Args:
        params: pytree from :func:`resnet50_init` / checkpoint conversion.
        x: images ``[bs, 224, 224, 3]`` (NHWC, ImageNet-normalized).

    Returns:
        ``[bs, 7, 7, 2048]`` feature map (the reference's pre-avgpool
        output, encoders.py:60 in NCHW -> here NHWC).
    """
    # torch conv1: kernel 7, stride 2, padding 3 -> explicit padding
    out = jax.lax.conv_general_dilated(
        x,
        params["conv1"]["kernel"],
        window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = jax.nn.relu(_bn(params["bn1"], out))
    out = _maxpool_3x3_s2(out)
    for s, blocks in enumerate(BLOCK_COUNTS):
        stage = params[f"layer{s + 1}"]
        stride = 1 if s == 0 else 2
        for b in range(blocks):
            out = _bottleneck(stage[b], out, stride if b == 0 else 1)
    return out

"""Image / label / image+label encoders.

Functional rebuild of the reference encoders
(/root/reference/deephumor/models/encoders.py):

- ``ImageEncoder`` (encoders.py:7-70): frozen ResNet-50 features; global
  path = avgpool -> shared Linear(2048->emb) -> BatchNorm1d -> Dropout;
  spatial path = 7x7 grid -> the *same shared* Linear -> Dropout (no BN —
  a reference quirk kept for checkpoint parity, encoders.py:60-67).
- ``LabelEncoder`` (encoders.py:73-106): mean-pooled token embedding +
  dropout.
- ``ImageLabelEncoder`` (encoders.py:109-144): concat of the two ->
  Linear(2*emb->emb) -> Dropout.

All apply functions take ``train``/``rng``; in train mode they return
``(out, new_params)`` with the head-BN running stats advanced (the ResNet
trunk itself always runs inference-mode BN — the trunk is frozen).
"""

import jax
import jax.numpy as jnp

from deephumor_tpu.models import layers as L
from deephumor_tpu.models.resnet import resnet50_features, resnet50_init

__all__ = [
    "image_encoder_init",
    "image_encoder_apply",
    "image_encoder_trunk",
    "label_encoder_init",
    "label_encoder_apply",
    "image_label_encoder_init",
    "image_label_encoder_apply",
]

RESNET_FEATURE_DIM = 2048


def image_encoder_init(key, emb_dim=256, dtype=jnp.float32):
    kr, kl = jax.random.split(key)
    return {
        "resnet": resnet50_init(kr, dtype),
        "linear": L.linear_init(kl, RESNET_FEATURE_DIM, emb_dim, dtype),
        "bn": L.batch_norm_init(emb_dim, dtype),
    }


def image_encoder_trunk(params, images):
    """The frozen ResNet trunk alone: NHWC images -> ``[bs, 7, 7, 2048]``.

    The trunk runs in eval mode with frozen weights (reference
    encoders.py:35-36), so its output per image is DETERMINISTIC across
    training — cache it once per template and train the (tiny) head +
    decoder against the cached features (``from_trunk=True`` below).
    """
    return jax.lax.stop_gradient(
        resnet50_features(params["resnet"], images)
    )


def image_encoder_apply(
    params,
    images,
    *,
    spatial_features=False,
    dropout=0.2,
    train=False,
    rng=None,
    from_trunk=False,
):
    """Encodes NHWC images (or precomputed trunk features).

    Returns ``emb [bs, emb_dim]`` or ``(emb, spatial_emb [bs, 49, emb_dim])``
    when ``spatial_features``; in train mode the result is wrapped as
    ``(out, new_params)``.

    With ``from_trunk`` the ``images`` argument is the
    :func:`image_encoder_trunk` output ``[bs, 7, 7, 2048]`` and the ResNet
    is skipped entirely.
    """
    # the trunk is frozen (reference encoders.py:35-36 requires_grad=False);
    # stop_gradient keeps autodiff from building a useless ResNet backward
    feats = images if from_trunk else image_encoder_trunk(params, images)
    bs = feats.shape[0]

    # global path: avgpool over the spatial grid -> shared linear -> BN
    pooled = jnp.mean(feats, axis=(1, 2))
    emb = L.linear(params["linear"], pooled)

    new_params = params
    if train:
        r_d1, r_d2 = jax.random.split(rng)
        emb, new_bn = L.batch_norm(params["bn"], emb, train=True)
        new_params = dict(params, bn=new_bn)
        emb = L.dropout(r_d1, emb, dropout, train)
    else:
        emb = L.batch_norm(params["bn"], emb, train=False)

    if spatial_features:
        # spatial path: flatten grid (row-major h*7+w, matching the
        # reference's NCHW reshape order) -> same shared linear, no BN
        grid = feats.reshape(bs, -1, RESNET_FEATURE_DIM)
        spatial_emb = L.linear(params["linear"], grid)
        if train:
            spatial_emb = L.dropout(r_d2, spatial_emb, dropout, train)
            return (emb, spatial_emb), new_params
        return emb, spatial_emb

    if train:
        return emb, new_params
    return emb


def label_encoder_init(key, num_tokens, emb_dim=256, dtype=jnp.float32):
    return {"embedding": L.embedding_init(key, num_tokens, emb_dim, dtype)}


def label_encoder_apply(params, labels, *, dropout=0.2, train=False, rng=None):
    """Mean-pooled label-token embedding ``[bs, emb_dim]``."""
    emb = jnp.mean(L.embed(params["embedding"], labels), axis=1)
    if train:
        emb = L.dropout(rng, emb, dropout, train)
    return emb


def image_label_encoder_init(key, num_tokens, emb_dim=256, dtype=jnp.float32):
    ki, kl, kc = jax.random.split(key, 3)
    return {
        "image_encoder": image_encoder_init(ki, emb_dim, dtype),
        "label_encoder": label_encoder_init(kl, num_tokens, emb_dim, dtype),
        "linear": L.linear_init(kc, 2 * emb_dim, emb_dim, dtype),
    }


def image_label_encoder_apply(
    params, images, labels, *, dropout=0.2, train=False, rng=None,
    from_trunk=False
):
    """Combined image+label embedding ``[bs, emb_dim]``."""
    new_params = params
    if train:
        r_img, r_lab, r_out = jax.random.split(rng, 3)
        image_emb, new_img = image_encoder_apply(
            params["image_encoder"],
            images,
            dropout=dropout,
            train=True,
            rng=r_img,
            from_trunk=from_trunk,
        )
        new_params = dict(params, image_encoder=new_img)
        label_emb = label_encoder_apply(
            params["label_encoder"],
            labels,
            dropout=dropout,
            train=True,
            rng=r_lab,
        )
    else:
        image_emb = image_encoder_apply(params["image_encoder"], images,
                                        from_trunk=from_trunk)
        label_emb = label_encoder_apply(params["label_encoder"], labels)

    emb = jnp.concatenate([image_emb, label_emb], axis=1)
    emb = L.linear(params["linear"], emb)
    if train:
        emb = L.dropout(r_out, emb, dropout, train)
        return emb, new_params
    return emb

"""Flax vision backbones (TPU-native replacement for Keras applications).

The reference uses Keras MobileNetV2(include_top=False, pooling="avg") as a
frozen 1280-d embedding extractor (reference image/deep.py:151-243,
video/deep.py:112-216) and EfficientNet-B0 as a fine-tunable teacher
(models/deep.py:592-905). This environment has no egress, so ImageNet
weights cannot be downloaded: backbones initialize deterministically
(seed 0) and accept a local ``weights=<path .npz>`` override. Embeddings
from an untrained backbone are still a usable fixed random-projection
feature map; the capability surface (shapes, preprocessing, API) is
identical.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (expansion t, out channels c, repeats n, stride s) — MobileNetV2 paper tbl 2
_MBV2_CONFIG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvBN(nn.Module):
    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding="SAME",
            use_bias=False,
            feature_group_count=self.groups,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.999, epsilon=1e-3)(x)
        if self.act:
            x = jnp.minimum(jnp.maximum(x, 0.0), 6.0)  # ReLU6
        return x


class _InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = x
        if self.expand != 1:
            h = _ConvBN(in_ch * self.expand, kernel=(1, 1))(h, train)
        h = _ConvBN(h.shape[-1], kernel=(3, 3), strides=self.stride, groups=h.shape[-1])(h, train)
        h = _ConvBN(self.out_ch, kernel=(1, 1), act=False)(h, train)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class MobileNetV2(nn.Module):
    """MobileNetV2 feature extractor; __call__ -> (B, 1280) pooled embedding
    (pooling='avg', include_top=False contract)."""

    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False, pooling: str = "avg"):
        x = _ConvBN(_make_divisible(32 * self.width), strides=2)(x, train)
        for t, c, n, s in _MBV2_CONFIG:
            out_ch = _make_divisible(c * self.width)
            for i in range(n):
                x = _InvertedResidual(out_ch, s if i == 0 else 1, t)(x, train)
        x = _ConvBN(_make_divisible(1280 * max(1.0, self.width)), kernel=(1, 1))(x, train)
        if pooling == "avg":
            x = jnp.mean(x, axis=(1, 2))
        return x


class EfficientNetB0(nn.Module):
    """Compact EfficientNet-B0-shaped backbone (MBConv stages with SE).

    Serves the teacher role of reference models/deep.py:592-905; returns the
    pooled 1280-d embedding.
    """

    @nn.compact
    def __call__(self, x, train: bool = False):
        # (expand, out, repeats, stride, kernel)
        cfg = [
            (1, 16, 1, 1, 3),
            (6, 24, 2, 2, 3),
            (6, 40, 2, 2, 5),
            (6, 80, 3, 2, 3),
            (6, 112, 3, 1, 5),
            (6, 192, 4, 2, 5),
            (6, 320, 1, 1, 3),
        ]
        x = _ConvBN(32, strides=2)(x, train)
        for t, c, n, s, k in cfg:
            for i in range(n):
                x = _MBConvSE(c, s if i == 0 else 1, t, k)(x, train)
        x = _ConvBN(1280, kernel=(1, 1))(x, train)
        return jnp.mean(x, axis=(1, 2))


class _MBConvSE(nn.Module):
    out_ch: int
    stride: int
    expand: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = x
        if self.expand != 1:
            h = _ConvBN(in_ch * self.expand, kernel=(1, 1))(h, train)
        h = _ConvBN(h.shape[-1], kernel=(self.kernel, self.kernel), strides=self.stride, groups=h.shape[-1])(h, train)
        # squeeze-excite
        se = jnp.mean(h, axis=(1, 2), keepdims=True)
        se = nn.Conv(max(1, in_ch // 4), (1, 1))(se)
        se = nn.swish(se)
        se = nn.Conv(h.shape[-1], (1, 1))(se)
        h = h * jax.nn.sigmoid(se)
        h = _ConvBN(self.out_ch, kernel=(1, 1), act=False)(h, train)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


_EMBED_CACHE: dict[tuple, Any] = {}


def mobilenet_v2_embedder(input_size: int = 224, weights: str | None = None, batch_size: int = 32):
    """Return a jitted fn (B, H, W, 3) in [-1, 1] -> (B, 1280) embeddings.

    weights: None (deterministic init), or a path to an .npz of flax params.
    The model instance is cached per (input_size, weights).
    """
    key = ("mbv2", input_size, weights)
    if key in _EMBED_CACHE:
        return _EMBED_CACHE[key]
    model = MobileNetV2()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, input_size, input_size, 3)))
    if weights is not None and Path(weights).exists():
        loaded = dict(np.load(weights, allow_pickle=True))
        flat = jax.tree_util.tree_flatten_with_path(params)
        # load by flattened-index naming convention param_0, param_1, ...
        leaves, treedef = jax.tree_util.tree_flatten(params)
        new_leaves = [jnp.asarray(loaded[f"param_{i}"]) if f"param_{i}" in loaded else l for i, l in enumerate(leaves)]
        params = jax.tree_util.tree_unflatten(treedef, new_leaves)

    @jax.jit
    def embed(x):
        return model.apply(params, x, train=False)

    _EMBED_CACHE[key] = embed
    return embed

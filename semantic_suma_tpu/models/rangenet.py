"""Range-image semantic segmentation network (RangeNet++-class).

TPU-native replacement for the reference's TensorRT-hosted RangeNet++
(``/root/reference/src/io/RangenetAPI.{hpp,cpp}`` bridging to the external
``rangenet_lib``: spherical projection -> darknet53 backbone -> KNN
post-processing -> 20 class probabilities per point,
``/root/reference/src/io/KITTIReader.cpp:173-200``).

Design points for TPU:
* A darknet-style residual encoder over ``[B, 64, W, 5]`` range images
  (range, x, y, z, remission) that **downsamples only along width** (the
  64-row LiDAR image is too short to pool vertically) — the same layout
  choice RangeNet++ made, and one that keeps every conv MXU-shaped.
* Decoder with transposed-conv width upsampling and skip connections, a
  softmax head over ``num_classes`` training classes.
* bfloat16 activations/params-compute with float32 head for MXU throughput.
* A fully vectorized KNN label cleanup over the range image replaces
  rangenet_lib's CUDA KNN: per-point window gather + range-gated distance
  vote, usable under jit.

The reference consumes per-point ``(argmax label, probability)``
(KITTIReader.cpp:183-200) — :func:`labels_for_points` reproduces exactly
that interface.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .labels import TRAIN_CLASSES, train_to_raw


class ConvBlock(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    stride: tuple = (1, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, self.stride, padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         axis_name=None)(x)
        return nn.leaky_relu(x, 0.1)


class ResidualBlock(nn.Module):
    """Darknet bottleneck: 1x1 reduce -> 3x3 expand + skip."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBlock(self.features // 2, (1, 1), dtype=self.dtype)(x, train)
        y = ConvBlock(self.features, (3, 3), dtype=self.dtype)(y, train)
        return x + y


class Encoder(nn.Module):
    """Width-downsampling darknet encoder; returns skip features."""

    stage_blocks: Sequence[int]
    widths: Sequence[int]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        x = ConvBlock(self.widths[0], (3, 3), dtype=self.dtype)(x, train)
        for blocks, width in zip(self.stage_blocks, self.widths[1:]):
            skips.append(x)
            # downsample width only: stride (1, 2)
            x = ConvBlock(width, (3, 3), (1, 2), dtype=self.dtype)(x, train)
            for _ in range(blocks):
                x = ResidualBlock(width, dtype=self.dtype)(x, train)
        return x, skips


class Decoder(nn.Module):
    """Width-upsampling decoder with skip connections."""

    widths: Sequence[int]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        for width, skip in zip(reversed(self.widths[:-1]), reversed(skips)):
            x = nn.ConvTranspose(width, (1, 4), strides=(1, 2),
                                 padding="SAME", use_bias=False,
                                 dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.float32)(x)
            x = nn.leaky_relu(x, 0.1)
            if skip.shape[2] != x.shape[2]:  # odd widths
                skip = skip[:, :, :x.shape[2]]
            x = x + ConvBlock(width, (1, 1), dtype=self.dtype)(skip, train)
            x = ResidualBlock(width, dtype=self.dtype)(x, train)
        return x


class RangeNet(nn.Module):
    """Full segmenter: [B, H, W, 5] -> [B, H, W, num_classes] logits."""

    num_classes: int = len(TRAIN_CLASSES)
    stage_blocks: Sequence[int] = (1, 2, 8, 8, 4)   # darknet53
    widths: Sequence[int] = (32, 64, 128, 256, 512, 1024)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # pad width to a multiple of the total stride
        stride = 2 ** len(self.stage_blocks)
        w = x.shape[2]
        pad = (-w) % stride
        if pad:
            x = jnp.concatenate([x, x[:, :, :pad]], axis=2)  # wrap-pad
        feats, skips = Encoder(self.stage_blocks, self.widths,
                               self.dtype)(x, train)
        y = Decoder(self.widths, self.dtype)(feats, skips, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32)(y)
        if pad:
            logits = logits[:, :, :w]
        return logits


def small_rangenet(num_classes: int = len(TRAIN_CLASSES)) -> RangeNet:
    """A darknet21-ish variant for tests and fast iteration."""
    return RangeNet(num_classes=num_classes, stage_blocks=(1, 1, 2, 2, 1),
                    widths=(16, 32, 64, 96, 128, 160))


def mid_rangenet(num_classes: int = len(TRAIN_CLASSES)) -> RangeNet:
    """Darknet21 depth at production widths capped at 320: the deployment
    segmenter for the in-loop configuration (full darknet53 widths add
    ~10x the parameters for marginal accuracy on range images — RangeNet++
    itself reports darknet21 within ~1 mIoU of darknet53 on SemanticKITTI).
    ~6M params; checkpoints stay small enough to version with the repo."""
    return RangeNet(num_classes=num_classes, stage_blocks=(1, 1, 2, 2, 1),
                    widths=(32, 64, 128, 192, 256, 320))


def make_input(vertex_map, depth_map, remission, vertex_valid):
    """Stack the 5-channel network input (range, x, y, z, remission) with
    zeroed invalid pixels, as RangeNet++ does."""
    depth = jnp.where(jnp.isfinite(depth_map), depth_map, 0.0)
    feats = jnp.concatenate([depth[..., None], vertex_map,
                             remission[..., None]], axis=-1)
    return jnp.where(vertex_valid[..., None], feats, 0.0)


# ---------------------------------------------------------------------------
# KNN post-processing (rangenet_lib's CUDA KNN, re-expressed as window ops)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k", "window", "cutoff"))
def knn_clean(point_px, point_py, point_depth, point_valid, class_image,
              depth_image, k: int = 5, window: int = 5, cutoff: float = 1.0):
    """Per-point KNN label vote over the range image.

    For each point: gather the ``window x window`` neighborhood of its pixel,
    keep neighbors whose range differs by < cutoff, and take the majority
    label among the k nearest (by |range difference|). Matches the semantics
    of RangeNet++'s post-processing KNN.
    """
    h, w = class_image.shape
    r = window // 2
    n = point_px.shape[0]

    diffs = []
    labels = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            qx = jnp.mod(point_px + dx, w)
            qy = jnp.clip(point_py + dy, 0, h - 1)
            nb_depth = depth_image[qy, qx]
            nb_label = class_image[qy, qx]
            d = jnp.abs(point_depth - nb_depth)
            ok = jnp.isfinite(nb_depth) & (d < cutoff)
            diffs.append(jnp.where(ok, d, jnp.inf))
            labels.append(nb_label)
    diffs = jnp.stack(diffs, axis=1)     # [N, W*W]
    labels = jnp.stack(labels, axis=1)   # [N, W*W]

    # k nearest by range difference
    _, top_idx = jax.lax.top_k(-diffs, k)
    top_labels = jnp.take_along_axis(labels, top_idx, axis=1)
    top_ok = jnp.isfinite(jnp.take_along_axis(diffs, top_idx, axis=1))

    # majority vote via one-hot accumulation (train-class count is small;
    # 32 covers any configuration, invalid -1 one-hots to all-zero)
    onehot = jax.nn.one_hot(jnp.where(top_ok, top_labels, -1), 32)
    votes = jnp.sum(onehot, axis=1)
    voted = jnp.argmax(votes, axis=-1).astype(jnp.int32)
    has_vote = jnp.any(top_ok, axis=1)
    fallback = class_image[jnp.clip(point_py, 0, h - 1),
                           jnp.mod(point_px, w)]
    return jnp.where(point_valid & has_vote, voted,
                     jnp.where(point_valid, fallback, 0))


@partial(jax.jit, static_argnames=("k", "window", "cutoff"))
def knn_clean_image(class_image, depth_image, k: int = 5, window: int = 5,
                    cutoff: float = 1.0):
    """Per-PIXEL KNN label vote: the image-space reformulation of
    rangenet_lib's per-point CUDA KNN.

    The per-point variant (:func:`knn_clean`) gathers 25 neighbors per
    POINT — 25 x ~130k element gathers, which dominate inference cost on
    TPU (~25 ms/scan measured). Here the vote runs once per PIXEL with 25
    jnp.roll shifts (pure VPU stencil work) and each point then reads its
    pixel's vote with ONE gather. Points sharing a pixel get the same
    vote, with the pixel's z-buffered range as the center range — within
    the z-buffer resolution of the per-point semantics."""
    h, w = class_image.shape
    r = window // 2
    diffs, labels = [], []
    d0 = depth_image
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            nb_d = jnp.roll(jnp.roll(depth_image, -dy, axis=0), -dx, axis=1)
            nb_l = jnp.roll(jnp.roll(class_image, -dy, axis=0), -dx, axis=1)
            if dy:  # vertical wrap is not adjacency (yaw wrap is real)
                rows = jnp.arange(h)
                ok_row = (rows + dy >= 0) & (rows + dy < h)
                nb_d = jnp.where(ok_row[:, None], nb_d, jnp.inf)
            d = jnp.abs(d0 - nb_d)
            ok = jnp.isfinite(nb_d) & (d < cutoff)
            diffs.append(jnp.where(ok, d, jnp.inf))
            labels.append(nb_l)
    diffs = jnp.stack(diffs, axis=-1)     # [H, W, 25]
    labels = jnp.stack(labels, axis=-1)
    _, top_idx = jax.lax.top_k(-diffs, k)
    top_labels = jnp.take_along_axis(labels, top_idx, axis=-1)
    top_ok = jnp.isfinite(jnp.take_along_axis(diffs, top_idx, axis=-1))
    # majority among the k nearest via pairwise equality counting
    # ([H,W,k,k] — ~40x smaller than a one-hot over the class axis);
    # top_k sorted the candidates nearest-first, so argmax tie-breaks
    # to the nearest, matching the per-point KNN semantics
    eq = (top_labels[..., :, None] == top_labels[..., None, :]) \
        & top_ok[..., None, :]
    counts = jnp.where(top_ok, jnp.sum(eq, axis=-1), -1)
    best = jnp.argmax(counts, axis=-1)
    voted = jnp.take_along_axis(top_labels, best[..., None],
                                axis=-1)[..., 0].astype(jnp.int32)
    has_vote = jnp.any(top_ok, axis=-1)
    return jnp.where(has_vote, voted, class_image)


def labels_for_points(logits, point_px, point_py, point_depth, point_valid,
                      depth_image, use_knn: bool = True,
                      knn_mode: str = "image"):
    """Reduce per-pixel logits to per-point (raw label id, probability) —
    the KITTIReader.cpp:183-200 contract. ``knn_mode="image"`` (default)
    runs the stencil KNN once per pixel; ``"point"`` is the exact
    per-point formulation (slower: 25 per-point gathers)."""
    probs = jax.nn.softmax(logits, axis=-1)
    class_img = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    prob_img = jnp.max(probs, axis=-1)
    h, w = class_img.shape
    if use_knn and knn_mode == "point":
        train_ids = knn_clean(point_px, point_py, point_depth, point_valid,
                              class_img, depth_image)
    else:
        img = knn_clean_image(class_img, depth_image) if use_knn \
            else class_img
        train_ids = img[jnp.clip(point_py, 0, h - 1), jnp.mod(point_px, w)]
    point_prob = prob_img[jnp.clip(point_py, 0, h - 1), jnp.mod(point_px, w)]
    raw = train_to_raw(train_ids)
    return (jnp.where(point_valid, raw, 0),
            jnp.where(point_valid, point_prob, 0.0))

"""Device-side augmentation — the TPU-native replacement for the
reference's PIL/CPU transform stacks (dataset/cifar100.py:78-87,
dataset/histo_dataset.py:207-368) and DALI (dataset/imagenet_dali.py).

The host ships raw uint8 NHWC batches; everything random — crop, flip,
RandAugment, normalize — runs inside jit, vectorized over the batch and
keyed by a jax PRNG.  Deterministic across replicas by construction (same
key => same program), no shuffle/broadcast of augmentation state needed.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# channel stats (reference dataset/cifar100.py:79-86)
CIFAR100_MEAN = (0.5071, 0.4867, 0.4408)
CIFAR100_STD = (0.2675, 0.2565, 0.2761)
# ImageNet stats, also used for the histo stacks (dataset/histo_dataset.py)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(images: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    """uint8 [0,255] (or float [0,1]) NHWC -> normalized float32."""
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    m = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, -1)
    s = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, -1)
    return (x - m) / s


def _random_crop_pad(images: jax.Array, rng: jax.Array, padding: int) -> jax.Array:
    """torchvision RandomCrop(size, padding=p): zero-pad then random crop
    back to the original size.  Vectorized: pad once, per-sample dynamic
    slice via gather on precomputed index grids (static shapes)."""
    B, H, W, C = images.shape
    x = jnp.pad(
        images,
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
        mode="constant",
    )
    k1, k2 = jax.random.split(rng)
    off_h = jax.random.randint(k1, (B,), 0, 2 * padding + 1)
    off_w = jax.random.randint(k2, (B,), 0, 2 * padding + 1)
    rows = off_h[:, None] + jnp.arange(H)[None, :]  # (B,H)
    cols = off_w[:, None] + jnp.arange(W)[None, :]  # (B,W)
    x = jnp.take_along_axis(x, rows[:, :, None, None], axis=1)
    x = jnp.take_along_axis(x, cols[:, None, :, None], axis=2)
    return x


def random_hflip(images: jax.Array, rng: jax.Array, p: float = 0.5) -> jax.Array:
    B = images.shape[0]
    flip = jax.random.bernoulli(rng, p, (B,))
    return jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)


def cifar_train_augment(images_u8: jax.Array, rng: jax.Array) -> jax.Array:
    """RandomCrop(32, pad 4) + hflip + normalize (dataset/cifar100.py:78-87)."""
    k1, k2 = jax.random.split(rng)
    x = _random_crop_pad(images_u8, k1, padding=4)
    x = random_hflip(x, k2)
    return normalize(x, CIFAR100_MEAN, CIFAR100_STD)


def cifar_eval_normalize(images_u8: jax.Array) -> jax.Array:
    return normalize(images_u8, CIFAR100_MEAN, CIFAR100_STD)


def random_resized_crop(
    images: jax.Array,
    rng: jax.Array,
    out_size: int,
    scale: Tuple[float, float] = (0.2, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> jax.Array:
    """torchvision RandomResizedCrop, vectorized over the batch.

    Samples area*scale and log-uniform aspect ratio (torch semantics), then
    resizes the crop to out_size with bilinear sampling via a per-sample
    affine gather (static shapes; one gather per axis).
    """
    B, H, W, C = images.shape
    k_area, k_ratio, k_i, k_j = jax.random.split(rng, 4)
    area = H * W
    target_area = area * jax.random.uniform(
        k_area, (B,), minval=scale[0], maxval=scale[1]
    )
    log_ratio = jax.random.uniform(
        k_ratio,
        (B,),
        minval=jnp.log(ratio[0]),
        maxval=jnp.log(ratio[1]),
    )
    aspect = jnp.exp(log_ratio)
    w = jnp.sqrt(target_area * aspect)
    h = jnp.sqrt(target_area / aspect)
    w = jnp.clip(jnp.round(w), 1, W)
    h = jnp.clip(jnp.round(h), 1, H)
    i = jnp.floor(jax.random.uniform(k_i, (B,)) * (H - h + 1))
    j = jnp.floor(jax.random.uniform(k_j, (B,)) * (W - w + 1))

    # bilinear resize of the (i,j,h,w) crop to (out_size, out_size).
    # Per-element gathers serialize on TPU; exact bilinear resampling is a
    # banded matrix, so resize-as-matmul: per-sample (L, out) weight
    # matrices contracted on the MXU (~1 ms at 512^2 x 64 vs ~1 s gather).
    ys = jnp.linspace(0.0, 1.0, out_size, endpoint=False) + 0.5 / out_size
    src_y = i[:, None] + ys[None, :] * h[:, None] - 0.5  # (B,S)
    src_x = j[:, None] + ys[None, :] * w[:, None] - 0.5

    def interp_matrix(src, L):
        # M[b, l, s] = max(0, 1 - |src[b,s] - l|), rows clamped at borders
        grid = jnp.arange(L, dtype=jnp.float32)[None, :, None]
        s = jnp.clip(src, 0.0, L - 1)[:, None, :]
        return jnp.maximum(0.0, 1.0 - jnp.abs(s - grid))  # (B, L, S)

    My = interp_matrix(src_y, H)
    Mx = interp_matrix(src_x, W)
    x = images.astype(jnp.float32)
    x = jnp.einsum("bhs,bhwc->bswc", My, x)   # rows -> S
    x = jnp.einsum("bwt,bswc->bstc", Mx, x)   # cols -> S
    return x


def _bilinear_gather(images: jax.Array, src_y: jax.Array, src_x: jax.Array) -> jax.Array:
    """Sample images at per-batch row coords src_y (B,S) and col coords
    src_x (B,S) on a separable grid — two 1-D gathers + lerp per axis."""
    B, H, W, C = images.shape

    y0 = jnp.clip(jnp.floor(src_y), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wy = jnp.clip(src_y - y0, 0.0, 1.0)
    x0 = jnp.clip(jnp.floor(src_x), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wx = jnp.clip(src_x - x0, 0.0, 1.0)

    def take_rows(img, idx):
        return jnp.take_along_axis(
            img, idx[:, :, None, None].astype(jnp.int32), axis=1
        )

    def take_cols(img, idx):
        return jnp.take_along_axis(
            img, idx[:, None, :, None].astype(jnp.int32), axis=2
        )

    rows = take_rows(images, y0) * (1 - wy)[:, :, None, None] + take_rows(
        images, y1
    ) * wy[:, :, None, None]
    out = take_cols(rows, x0) * (1 - wx)[:, None, :, None] + take_cols(
        rows, x1
    ) * wx[:, None, :, None]
    return out


def resize_bilinear(images: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Plain bilinear resize (align_corners=False / half-pixel centers)."""
    x = images.astype(jnp.float32)
    return jax.image.resize(
        x, (x.shape[0], out_h, out_w, x.shape[3]), method="bilinear"
    )


def center_crop(images: jax.Array, size: int) -> jax.Array:
    B, H, W, C = images.shape
    top = (H - size) // 2
    left = (W - size) // 2
    return images[:, top : top + size, left : left + size, :]

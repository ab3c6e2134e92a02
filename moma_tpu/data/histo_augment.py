"""Histopathology train/eval augmentation stacks (device-side).

Mirrors the reference stacks (dataset/histo_dataset.py:207-368):
  train: [RandomResizedCrop if image_resize] + RandomHorizontalFlip +
         RandAugment(rand-n2-m10-mstd0.5, fill=255*imagenet_mean) +
         normalize(imagenet stats)
  eval:  resize (done once at pack time) + center crop + normalize

The packed cache stores images already resized to cfg.data.image_size, so
the resize stage is free at train time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from moma_tpu.data.augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize,
    random_hflip,
    random_resized_crop,
)
from moma_tpu.data.randaugment import parse_ra_config, rand_augment

RA_FILL = tuple(min(255, round(255 * m)) for m in IMAGENET_MEAN)


def make_histo_augment(cfg):
    image_size = cfg.data.image_size
    use_rrc = bool(cfg.data.image_resize)
    crop_lo = cfg.data.crop
    use_ra = cfg.data.aug_train == "RA"
    # the reference hardcodes 'rand-n2-m10-mstd0.5' in its transform stacks
    # (dataset/histo_dataset.py:227-228); --ra_config exposes the full
    # rand_augment_transform grammar (RandAugment.py:405-448) incl. 'w0'.
    # Only parsed when RA is on: --aug_train NULL must not fail on a
    # stale/bogus string that has zero effect on the run.
    if use_ra:
        n_layers, magnitude, mstd, weights = parse_ra_config(cfg.data.ra_config)

    def augment(images, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        x = images.astype(jnp.float32)
        if use_rrc:
            x = random_resized_crop(x, k1, image_size, scale=(crop_lo, 1.0))
        if use_ra:
            # the hflip rides rand_augment (same k2 bernoulli draw as
            # random_hflip; fused into the Pallas layer-1 kernel on TPU)
            x = rand_augment(x, k3, num_layers=n_layers, magnitude=magnitude,
                             magnitude_std=mstd, fill=RA_FILL, hflip_rng=k2,
                             choice_weights=weights,
                             use_cmc=bool(getattr(cfg.data, "use_cmc",
                                                  False)))
        else:
            x = random_hflip(x, k2)
        return normalize(x / 255.0, IMAGENET_MEAN, IMAGENET_STD)

    return augment


def make_two_view_augment(cfg):
    """Two independently-augmented views of each image — the
    DatasetSerial2views capability (dataset/dataset.py:51-85 /
    histo_dataset.py:422-647), on-device: same base batch, two rng
    streams.  Returns (view1, view2)."""
    single = make_histo_augment(cfg)

    def augment(images, rng):
        k1, k2 = jax.random.split(rng)
        return single(images, k1), single(images, k2)

    return augment


def make_histo_eval(cfg):
    def eval_normalize(images):
        x = images.astype(jnp.float32) / 255.0
        return normalize(x, IMAGENET_MEAN, IMAGENET_STD)

    return eval_normalize

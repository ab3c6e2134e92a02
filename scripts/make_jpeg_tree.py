"""Generate a synthetic prostate_hv-layout JPEG tree for epoch-scale
from-disk runs (no datasets ship in this environment).

Layout matches data/manifests.py prepare_prostate_hv (itself the port of
dataset/histo_list.py:61-84): label = the integer after the final '_'
in the filename.

  patches_train_750_v0/ZT111_1/img_<i>_<label>.jpg   (train)
  patches_validation_750_v0/ZT76_1/img_<i>_<label>.jpg
  patches_test_750_v0/patho_1/sub/img_<i>_<label>.jpg

Images are class-template + noise (the e2e-parity recipe scaled up) so
training has real signal; JPEG quality 90 keeps files ~60-120 KB like
real histo patches.

  python scripts/make_jpeg_tree.py --root /tmp/histo_tree \
      --n_train 2048 --n_val 256 --n_test 256 --size 512
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
from PIL import Image

N_CLS = 4


def _templates(size, rs):
    t = rs.rand(N_CLS, size, size, 3).astype(np.float32)
    for _ in range(3):
        t = (np.roll(t, 1, 1) + np.roll(t, -1, 1)
             + np.roll(t, 1, 2) + np.roll(t, -1, 2) + t) / 5.0
    return t


def write_split(dirpath, n, size, seed, noise=0.4):
    os.makedirs(dirpath, exist_ok=True)
    rs = np.random.RandomState(seed)
    tmpl = _templates(size, np.random.RandomState(777))
    labels = rs.randint(0, N_CLS, (n,))
    t0 = time.time()
    for i in range(n):
        x = ((1 - noise) * tmpl[labels[i]]
             + noise * rs.rand(size, size, 3)) * 255.0
        Image.fromarray(x.astype(np.uint8)).save(
            os.path.join(dirpath, f"img_{i:06d}_{labels[i]}.jpg"),
            quality=90)
    dt = time.time() - t0
    print(f"  {dirpath}: {n} jpegs in {dt:.1f}s ({n / dt:.1f} img/s encode)")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--n_train", type=int, default=2048)
    p.add_argument("--n_val", type=int, default=256)
    p.add_argument("--n_test", type=int, default=256)
    p.add_argument("--size", type=int, default=512)
    a = p.parse_args(argv)

    write_split(os.path.join(a.root, "patches_train_750_v0", "ZT111_1"),
                a.n_train, a.size, seed=1)
    write_split(os.path.join(a.root, "patches_validation_750_v0", "ZT76_1"),
                a.n_val, a.size, seed=2)
    write_split(os.path.join(a.root, "patches_test_750_v0", "patho_1", "s1"),
                a.n_test, a.size, seed=3)
    print(f"done: {a.root}")


if __name__ == "__main__":
    main()

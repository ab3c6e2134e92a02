"""CLI: batch inference with an exported StableHLO serving artifact.

Closes the serving loop the reference never had: `export_model` bakes a
checkpoint into a self-contained artifact; this CLI runs that artifact
over a directory of images — no model zoo, no checkpoint code, just the
artifact — and writes a predictions CSV.  The reference's nearest
capability (test.py:146-278) needs the full torch model zoo, the
original checkpoint, and the dataset plumbing to classify anything.

    # export once, serve anywhere:
    python -m moma_tpu.cli.export_model --run ./save/teacher_x \
        --model effiB0 --dataset prostate_hv --image_size 512 \
        --bf16 --out ./serve/teacher_x
    python -m moma_tpu.cli.serve --artifact ./serve/teacher_x \
        --images './patches/*.jpg' --out preds.csv

Decode: native C++ libjpeg pool (data/native, threads) with per-file
PIL fallback; batches are padded to a fixed --bs so the artifact
compiles ONCE (its batch dimension is symbolic — each distinct shape
would otherwise recompile).  A background thread decodes batch i+1
while the device runs batch i (double-buffered through a 2-buffer pool,
so steady-state serving re-touches warm pages instead of faulting a
fresh buffer per batch — the same 5x effect measured for the pack
builder, data/native/__init__.py decode_files).
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import queue
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np


def _decode_batch(paths, size: int, out=None) -> np.ndarray:
    """(len(paths), size, size, 3) uint8 via native decode, PIL fallback."""
    from moma_tpu.data.histo import _decode_resize
    from moma_tpu.data.native import decode_files

    res = decode_files(paths, size, out=out)
    if res is None:  # no native decoder on this host: all-PIL
        return np.stack([_decode_resize(p, size) for p in paths])
    imgs, failed = res
    for i in np.nonzero(failed)[0]:  # non-JPEG / corrupt rows
        imgs[i] = _decode_resize(paths[i], size)
    return imgs


def _batch_stream(get, n: int, bs: int, size: int, file_mode: bool):
    """Yield (lo, hi, imgs) with decode overlapped one batch ahead of the
    consumer.  imgs comes from a 2-buffer pool in file mode: the consumer
    must be done with batch i's array before it pulls batch i+2 (true for
    the serve loop, which materializes logits per batch)."""
    starts = list(range(0, n, bs))
    if len(starts) <= 1:
        for lo in starts:
            yield lo, min(lo + bs, n), get(lo, min(lo + bs, n), None)
        return

    free: "queue.Queue" = queue.Queue()
    if file_mode:
        for _ in range(2):
            free.put(np.empty((bs, size, size, 3), np.uint8))
    else:  # synthetic/in-RAM: get() slices, no decode buffer needed
        for _ in range(2):
            free.put(None)
    done: "queue.Queue" = queue.Queue()

    def worker():
        try:
            for lo in starts:
                hi = min(lo + bs, n)
                buf = free.get()
                out = buf[: hi - lo] if buf is not None else None
                done.put((lo, hi, get(lo, hi, out), buf))
        except Exception as e:  # surface decode errors in the main thread
            done.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    for _ in starts:
        item = done.get()
        if isinstance(item, Exception):
            raise item
        lo, hi, imgs, buf = item
        yield lo, hi, imgs
        free.put(buf)  # consumer is done with this array -> recycle
    t.join()


def main(argv=None):
    p = argparse.ArgumentParser("moma_tpu serve")
    p.add_argument("--artifact", required=True,
                   help="path from export_model (with or without "
                        ".stablehlo suffix)")
    p.add_argument("--images", type=str, default=None,
                   help="glob of image files to classify")
    p.add_argument("--synthetic", type=int, default=0,
                   help="classify N random images instead (smoke / "
                        "throughput check; no files needed)")
    p.add_argument("--bs", type=int, default=64,
                   help="serving batch size (fixed -> one compile)")
    p.add_argument("--topk", type=int, default=3)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each batch over all visible devices "
                        "(shard_map around the single-device artifact; "
                        "weak-scales serving throughput by device count)")
    p.add_argument("--out", type=str, default="./preds.csv")
    p.add_argument("--scoped_vmem_kib", type=int, default=None,
                   help="XLA:TPU scoped-VMEM budget for the serving jit "
                        "(default: the tuned 64MB, core/jitopt.py — "
                        "measured -7%% device time on the bf16 effiB0@512 "
                        "forward; 0 = XLA default)")
    a = p.parse_args(argv)

    from moma_tpu.core import jitopt
    from moma_tpu.core.cache import enable_compilation_cache
    from moma_tpu.core.export import ExportedClassifier

    jitopt.set_scoped_vmem(a.scoped_vmem_kib)
    enable_compilation_cache()
    clf = ExportedClassifier(a.artifact)
    if a.data_parallel:
        clf.shard()
        import jax as _jax
        print(f"[serve] data-parallel over {len(_jax.devices())} devices")
    size = clf.meta.get("image_size")
    if size is None:
        print("artifact has no meta json (image_size unknown); "
              "re-export or pass images already sized", file=sys.stderr)
        return {}

    if a.synthetic:
        rs = np.random.RandomState(0)
        names = [f"synthetic_{i}" for i in range(a.synthetic)]
        batches = rs.randint(0, 256, (a.synthetic, size, size, 3), np.uint8)
        get = lambda lo, hi, out: batches[lo:hi]
        file_mode = False
    elif a.images:
        names = sorted(glob.glob(a.images))
        if not names:
            print(f"no files match {a.images}", file=sys.stderr)
            return {}
        get = lambda lo, hi, out: _decode_batch(names[lo:hi], size, out=out)
        file_mode = True
    else:
        p.error("need --images or --synthetic")

    n = len(names)
    rows, t0 = [], time.perf_counter()
    for lo, hi, imgs in _batch_stream(get, n, a.bs, size, file_mode):
        if hi - lo < a.bs:  # pad the ragged tail: one compiled shape
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], a.bs - (hi - lo), axis=0)])
        logits = clf(imgs)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))[: hi - lo]
        top = np.argsort(-probs, axis=-1)[:, : a.topk]
        for i, name in enumerate(names[lo:hi]):
            rows.append([name, int(top[i, 0]), f"{probs[i, top[i, 0]]:.4f}",
                         " ".join(str(int(c)) for c in top[i])])
    dt = time.perf_counter() - t0

    with open(a.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "pred", "prob", f"top{a.topk}"])
        w.writerows(rows)
    meta = {k: clf.meta.get(k) for k in ("model", "dataset", "quantized")}
    print(f"served {n} images @ {size}px with {meta} -> {a.out} "
          f"({n / dt:.1f} img/s incl. decode+host IO)")
    return {"n": n, "img_per_s": n / dt, "out": a.out}


if __name__ == "__main__":
    main()

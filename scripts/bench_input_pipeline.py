"""Host input-pipeline throughput: can the host feed the chip?

The device step consumes batches at the bench.py headline rate
(495 img/s/chip at 512^2, BS128).  Training reads go: packed mmap cache
(decode-once, data/histo.py) -> native C++ batch assembler with async
prefetch (data/native/batcher.cpp) -> device_put.  This script measures
every host stage on synthetic data so the "input-bound or compute-bound"
question is answered with numbers, not assumptions:

  decode      one-time cache build cost: native libjpeg decode+resize
              pool vs the PIL fallback (images/s at 512^2 out)
  gather      steady-state per-epoch cost: NativeBatcher prefetch
              pipeline vs numpy fancy-indexing over the mmap
              (rows/s at BS128@512^2, warm page cache — the steady
              state when the dataset fits RAM, as every histo config
              in the reference does)
  loader      end-to-end data.pipeline.Loader epoch iteration from a
              packed on-disk dataset (what train/loop.py actually runs)

Prints one JSON line per stage + a verdict line comparing the loader
rate against the device step rate.  Pure CPU — runnable during relay
outages; rerun on the TPU host for the production number.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEVICE_RATE = 495.4  # bench.py headline, img/s/chip, MoMA BS128@512^2


def make_jpegs(n: int, size: int, tmp: str) -> list:
    """Synthetic histology-ish JPEGs: smooth low-frequency fields, not
    white noise — noise JPEGs are pathologically large and decode-slow,
    which would overstate decode cost vs real patches."""
    from PIL import Image

    rs = np.random.RandomState(7)
    paths = []
    for i in range(n):
        small = rs.randint(80, 220, (16, 16, 3), dtype=np.uint8)
        img = Image.fromarray(small).resize((size, size), Image.BILINEAR)
        p = os.path.join(tmp, f"patch_{i:04d}.jpg")
        img.save(p, quality=90)
        paths.append(p)
    return paths


def bench_decode(paths: list, size: int, threads: int, reps: int = 3) -> dict:
    """Interleaved A/B with best-of-reps: this host is a shared VM whose
    available CPU swings 3x between runs — back-to-back one-shot timings
    compare the noise, not the decoders."""
    from PIL import Image

    from moma_tpu.data import native

    def run_pil():
        t0 = time.perf_counter()
        for p in paths:
            im = Image.open(p).convert("RGB")
            if im.size != (size, size):
                im = im.resize((size, size), Image.BILINEAR)
            np.asarray(im)
        return len(paths) / (time.perf_counter() - t0)

    # reused destination = the pack-builder path (decode straight into the
    # pack memmap); a fresh np.empty per call page-faults inside the loop
    # and costs 5x at this batch size
    dest = np.zeros((len(paths), size, size, 3), dtype=np.uint8)

    def run_native():
        t0 = time.perf_counter()
        _, failed = native.decode_files(paths, size, threads=threads,
                                        out=dest)
        dt = time.perf_counter() - t0
        assert not failed.any(), "native decode failed on synthetic JPEGs"
        return len(paths) / dt

    out = {}
    if native.get_decoder_lib() is not None:
        native.decode_files(paths[:8], size, threads=threads)  # warm
        run_pil()                                              # warm
        nat, pil = [], []
        for _ in range(reps):
            nat.append(run_native())
            pil.append(run_pil())
        out["native_img_s"] = round(max(nat), 1)
        out["pil_img_s"] = round(max(pil), 1)
    else:
        out["native_img_s"] = None
        out["pil_img_s"] = round(run_pil(), 1)
    return out


def bench_gather(bin_path: str, n_rows: int, size: int, bs: int,
                 n_batches: int, threads: int) -> dict:
    from moma_tpu.data.native import NativeBatcher

    row_shape = (size, size, 3)
    rs = np.random.RandomState(3)
    orders = [rs.permutation(n_rows)[:bs] for _ in range(n_batches)]

    mm = np.memmap(bin_path, dtype=np.uint8, mode="r",
                   shape=(n_rows, *row_shape))
    for idx in orders[:2]:  # touch pages
        mm[np.sort(idx)].sum()
    t0 = time.perf_counter()
    for idx in orders:
        _ = mm[idx]
    numpy_rate = bs * n_batches / (time.perf_counter() - t0)

    b = NativeBatcher(bin_path, n_rows, row_shape)
    b.start(bs, depth=4, threads=threads)
    depth = 4
    for i in range(min(depth, n_batches)):
        b.submit(orders[i])
    t0 = time.perf_counter()
    got = 0
    for i in range(n_batches):
        arr = b.get()
        got += arr.shape[0]
        nxt = i + depth
        if nxt < n_batches:
            b.submit(orders[nxt])
    native_rate = got / (time.perf_counter() - t0)

    # zero-copy dequeue (single mmap->buffer copy; consumer reads in place)
    for i in range(min(depth, n_batches)):
        b.submit(orders[i])
    t0 = time.perf_counter()
    got = sink = 0
    for i in range(n_batches):
        view, tok = b.get_view()
        got += view.shape[0]
        sink += int(view[0, 0, 0, 0])  # touch to defeat lazy paging
        b.release(tok)
        nxt = i + depth
        if nxt < n_batches:
            b.submit(orders[nxt])
    view_rate = got / (time.perf_counter() - t0)
    b.close()
    return {"numpy_rows_s": round(numpy_rate, 1),
            "native_rows_s": round(native_rate, 1),
            "native_view_rows_s": round(view_rate, 1)}


def bench_loader(bin_path: str, n_rows: int, size: int, bs: int) -> dict:
    from moma_tpu.data.pipeline import ArrayDataset, Loader

    mm = np.memmap(bin_path, dtype=np.uint8, mode="r",
                   shape=(n_rows, size, size, 3))
    labels = np.zeros((n_rows,), dtype=np.int32)
    ds = ArrayDataset(mm, labels, bin_path=bin_path)
    loader = Loader(ds, bs, train=True, seed=0)
    # one warm epoch (prefetcher spin-up + page cache)
    for _ in loader:
        pass
    loader.set_epoch(1)
    t0 = time.perf_counter()
    rows = 0
    for batch in loader:
        rows += batch["image"].shape[0]
    rate = rows / (time.perf_counter() - t0)
    return {"loader_rows_s": round(rate, 1)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--bs", type=int, default=128)
    p.add_argument("--n_jpegs", type=int, default=192)
    p.add_argument("--n_rows", type=int, default=1024,
                   help="packed-cache rows (~0.8 GB at 512^2)")
    p.add_argument("--n_batches", type=int, default=24)
    p.add_argument("--threads", type=int, default=0,
                   help="0 = one per core; >cores only adds contention "
                        "(measured: 8 threads on a 1-core host is a wash)")
    a = p.parse_args(argv)
    if a.threads <= 0:
        a.threads = os.cpu_count() or 1

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        paths = make_jpegs(a.n_jpegs, a.size, tmp)
        results["decode"] = bench_decode(paths, a.size, a.threads)
        print(json.dumps({"stage": "decode", **results["decode"]}),
              flush=True)

        bin_path = os.path.join(tmp, "pack.bin")
        rows = np.random.RandomState(11).randint(
            0, 256, (a.n_rows, a.size, a.size, 3), dtype=np.uint8)
        rows.tofile(bin_path)
        del rows

        results["gather"] = bench_gather(bin_path, a.n_rows, a.size, a.bs,
                                         a.n_batches, a.threads)
        print(json.dumps({"stage": "gather", **results["gather"]}),
              flush=True)

        results["loader"] = bench_loader(bin_path, a.n_rows, a.size, a.bs)
        print(json.dumps({"stage": "loader", **results["loader"]}),
              flush=True)

    headroom = results["loader"]["loader_rows_s"] / DEVICE_RATE
    print(json.dumps({
        "stage": "verdict",
        "device_img_s": DEVICE_RATE,
        "loader_rows_s": results["loader"]["loader_rows_s"],
        "host_headroom_x": round(headroom, 2),
        "input_bound": headroom < 1.0,
        "host_cores": os.cpu_count(),  # interpretability: a 1-core dev
        # host says nothing about a real multi-core TPU host
    }))
    return results


if __name__ == "__main__":
    main()

"""Flagship config end-to-end FROM DISK on the real chip (VERDICT r2 #2).

Drives the real CLI (`cli.train_student --distill moma`, effiB0@512,
global BS128, K=16384) for full epochs over a real JPEG tree on disk,
native decode path on, with eval + async checkpoints + one mid-epoch
SIGTERM preempt + --resume — and instruments every stage so the
sustained number is attributable:

  stage A  native JPEG decode (pack build)      img/s   (C++ libjpeg pool)
  stage B  host loader (memmap -> batches)      img/s   (native prefetcher)
  stage C  axon relay upload (device_put)       MB/s    (environment tunnel)
  stage D  device step rate                     img/s   (bench.py headline)
  stage E  sustained end-to-end epochs          img/s   (stat.json ips)

On a real TPU VM host->device DMA runs at PCIe/DMA rates (GB/s) and the
binding stage is min(B, D); under the axon relay the tunnel (C) binds —
see BASELINE.md round-3 for the recorded numbers.

  timeout 3600 python scripts/epoch_from_disk.py --root /tmp/histo_tree
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def stage_a_pack(root, size, redo=True):
    """Native decode throughput: JPEG tree -> packed uint8 cache."""
    from moma_tpu.data.histo import PackedCache
    from moma_tpu.data.manifests import prepare_prostate_hv

    pack_dir = os.path.join(root, "_moma_pack")
    if redo and os.path.isdir(pack_dir):
        shutil.rmtree(pack_dir)
    train, val, test = prepare_prostate_hv(root)
    cache = PackedCache(pack_dir)
    t0 = time.time()
    ds = cache.build_or_open(train, size)
    dt = time.time() - t0
    # val/test packs built outside the timed window
    cache.build_or_open(val, size)
    cache.build_or_open(test, size)
    return {"n": len(ds), "s": round(dt, 2),
            "img_per_s": round(len(ds) / dt, 1)}, ds


def stage_b_loader(ds, batch_size, epochs=2):
    """Host-side loader throughput (no device): memmap -> global batches."""
    from moma_tpu.data.pipeline import Loader

    loader = Loader(ds, batch_size, train=True, num_workers=8)
    n = 0
    t0 = time.time()
    for ep in range(epochs):
        loader.set_epoch(ep)
        for batch in loader:
            n += batch["image"].shape[0]
            batch["image"][0, 0, 0, 0]  # touch (defeat lazy slices)
    dt = time.time() - t0
    return {"imgs": n, "s": round(dt, 2), "img_per_s": round(n / dt, 1)}


def stage_c_upload(size, batch_size, iters=5):
    """Relay/DMA upload rate for one training batch of uint8 pixels.

    block_until_ready alone is NOT proof of arrival on the axon relay
    (it acks before completion — CLAUDE.md; a naive version of this
    stage measured a fictitious 669 MB/s).  Each transfer is forced by
    fetching a VALUE computed from the whole device array."""
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    xs = [rs.randint(0, 256, (batch_size, size, size, 3), dtype=np.uint8)
          for _ in range(iters)]
    total = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int64)
                    if jax.config.jax_enable_x64
                    else jnp.sum(a.astype(jnp.float32)))
    float(total(jax.device_put(xs[0])))  # warm transfer + compile
    t0 = time.time()
    for x in xs:
        float(total(jax.device_put(x)))  # value fetch: the array ARRIVED
    dt = time.time() - t0
    mb = batch_size * size * size * 3 / 1e6
    return {"batch_MB": round(mb, 1), "s_per_batch": round(dt / iters, 3),
            "MB_per_s": round(mb * iters / dt, 1),
            "img_per_s": round(batch_size * iters / dt, 1)}


def stage_e_train(root, size, batch_size, epochs, save_dir, preempt_after=40):
    """The real CLI run: epoch 1 interrupted mid-flight (SIGTERM -> exact
    mid-epoch checkpoint), then --resume to completion.  Returns the
    stat.json trajectory + sustained ips."""
    cmd = [sys.executable, "-m", "moma_tpu.cli.train_student",
           "--distill", "moma", "--mem", "MoCo", "--head", "mlp",
           "--attn", "self", "--feat_dim", "512", "--nce_k", "16384",
           "--model_s", "effiB0", "--model_t", "effiB0",
           "--dataset", "prostate_hv", "--data_dir", root,
           "--batch_size", str(batch_size), "--image_size", str(size),
           "--epochs", str(epochs), "--trial", "77",
           "--save_dir", save_dir, "--print_freq", "4"]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")

    # leg 1: run until mid-epoch, then SIGTERM (GracefulStop checkpoints
    # the exact batch index and exits cleanly).  The loop prints nothing
    # mid-epoch (async dispatch), so the trigger is a wall-clock timer.
    import threading

    p = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    timer = threading.Timer(preempt_after, p.send_signal, [signal.SIGTERM])
    timer.start()
    lines = []
    for line in p.stdout:
        lines.append(line)
        print("  |", line, end="", flush=True)
    p.wait()
    timer.cancel()
    leg1 = "".join(lines[-40:])
    preempted = "[preempt]" in "".join(lines)

    # leg 2: resume to completion
    p2 = subprocess.run(cmd + ["--resume"], env=env, capture_output=True,
                        text=True, timeout=3000)
    print(p2.stdout[-3000:])
    run_dirs = [d for d in os.listdir(save_dir) if d.startswith("moma_")]
    stat = {}
    if run_dirs:
        sp = os.path.join(save_dir, run_dirs[0], "stat.json")
        if os.path.exists(sp):
            with open(sp) as f:
                stat = json.load(f)
    return {"preempted_leg1": preempted, "resume_rc": p2.returncode,
            "stat": stat, "leg1_tail": leg1[-1500:],
            "leg2_tail": p2.stdout[-1500:]}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="/tmp/histo_tree")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--n_train", type=int, default=2048)
    p.add_argument("--skip", type=str, default="",
                   help="comma list from a,b,c,e")
    p.add_argument("--json", type=str, default="")
    a = p.parse_args(argv)
    skip = set(a.skip.split(",")) if a.skip else set()

    if not os.path.isdir(os.path.join(a.root, "patches_train_750_v0")):
        from make_jpeg_tree import main as mk
        mk(["--root", a.root, "--n_train", str(a.n_train),
            "--n_val", "256", "--n_test", "256", "--size", str(a.size)])

    out = {}
    ds = None
    if "a" not in skip:
        out["A_native_decode"], ds = stage_a_pack(a.root, a.size)
        print("[A]", out["A_native_decode"], flush=True)
    if "b" not in skip:
        if ds is None:
            out["A_native_decode"], ds = stage_a_pack(a.root, a.size,
                                                      redo=False)
        out["B_host_loader"] = stage_b_loader(ds, a.batch_size)
        print("[B]", out["B_host_loader"], flush=True)
    if "c" not in skip:
        out["C_upload"] = stage_c_upload(a.size, a.batch_size)
        print("[C]", out["C_upload"], flush=True)
    if "e" not in skip:
        save_dir = os.path.join("/tmp", "epoch_from_disk_save")
        shutil.rmtree(save_dir, ignore_errors=True)
        os.makedirs(save_dir, exist_ok=True)
        out["E_train"] = stage_e_train(a.root, a.size, a.batch_size,
                                       a.epochs, save_dir)
        print("[E] stat:", json.dumps(out["E_train"]["stat"])[:800],
              flush=True)

    print(json.dumps({k: v for k, v in out.items() if k != "E_train"},
                     indent=2))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=2, default=str)
    return out


if __name__ == "__main__":
    main()

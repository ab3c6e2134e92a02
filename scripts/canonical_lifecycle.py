"""The canonical training lifecycle, executed once end-to-end on-chip
(VERDICT r3 next #2).

The reference's published workflow is scripts/run_moma.sh: 50-epoch
trials ending in test.py evaluation.  This harness runs ONE full
run_moma.sh-shape trial of the flagship config through the real CLIs:

  1. `cli.train_student --distill moma` — effiB0@512, global BS128,
     K=16384, mlp/self, full RA, cosine-to-zero over --epochs, from a
     packed on-disk JPEG tree via the native decode path, async orbax
     checkpoints, best-acc/best-F1 selection;
  2. a mid-run SIGTERM preempt + `--resume` (the failure-recovery leg);
  3. `cli.test_eval` over the finished run dir (bulk evaluation);
  4. `cli.export_torch` of the best_acc checkpoint -> a reference-
     loadable .pth, verified by loading it through the reference's own
     state-dict path (test.py:146-278 unwraps {'model': sd}) and
     comparing logits on real test images.

Match: /root/reference/scripts/run_moma.sh, test.py:146-278.

  timeout 5400 python scripts/canonical_lifecycle.py [--epochs 50]
          [--n_train 1024] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
REF = "/root/reference"

import numpy as np


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    return env


def train_legs(root, save_dir, epochs, batch_size, preempt_after):
    cmd = [sys.executable, "-m", "moma_tpu.cli.train_student",
           "--distill", "moma", "--mem", "MoCo", "--head", "mlp",
           "--attn", "self", "--feat_dim", "512", "--nce_k", "16384",
           "--model_s", "effiB0", "--model_t", "effiB0",
           "--dataset", "prostate_hv", "--data_dir", root,
           "--batch_size", str(batch_size), "--image_size", "512",
           "--epochs", str(epochs), "--cosine", "--trial", "0",
           "--save_dir", save_dir, "--print_freq", "4"]

    # leg 1: run until the preempt timer fires, SIGTERM -> graceful
    # mid-run checkpoint ("[preempt] checkpointed ...", rc 0)
    p = subprocess.Popen(cmd, env=_env(), stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    timer = threading.Timer(preempt_after, p.send_signal, [signal.SIGTERM])
    timer.start()
    lines = []
    for line in p.stdout:
        lines.append(line)
        print("  |", line, end="", flush=True)
    rc1 = p.wait()
    timer.cancel()
    log1 = "".join(lines)
    preempted = "[preempt]" in log1

    # leg 2: resume to completion
    t0 = time.time()
    p2 = subprocess.Popen(cmd + ["--resume"], env=_env(),
                          stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    lines2 = []
    for line in p2.stdout:
        lines2.append(line)
        print("  |", line, end="", flush=True)
    rc2 = p2.wait()
    log2 = "".join(lines2)

    run_dirs = [d for d in os.listdir(save_dir) if d.startswith("moma_")]
    assert run_dirs, f"no run dir under {save_dir}"
    run_dir = os.path.join(save_dir, run_dirs[0])
    stat = {}
    sp = os.path.join(run_dir, "stat.json")
    if os.path.exists(sp):
        with open(sp) as f:
            stat = json.load(f)
    ckpts = sorted(os.listdir(os.path.join(run_dir, "ckpt"))) \
        if os.path.isdir(os.path.join(run_dir, "ckpt")) else []
    return {
        "rc_leg1": rc1, "preempted_leg1": preempted,
        "resumed": "[resume]" in log2, "rc_leg2": rc2,
        "leg2_wall_s": round(time.time() - t0, 1),
        "run_dir": run_dir, "ckpt_tags": ckpts,
        "epochs_recorded": len(stat.get("train_loss", [])),
        "stat": stat,
    }


def bulk_eval(root, run_dir):
    """cli.test_eval over the run dir (the reference's test.py role)."""
    workdir = os.path.join(os.path.dirname(run_dir), "_eval")
    os.makedirs(workdir, exist_ok=True)
    p = subprocess.run(
        [sys.executable, "-m", "moma_tpu.cli.test_eval",
         "--runs", run_dir, "--dataset", "prostate_hv",
         "--data_dir", root, "--model", "effiB0"],
        env=_env(), capture_output=True, text=True, timeout=3000,
        cwd=workdir)
    print(p.stdout[-1500:], flush=True)
    out = {"rc": p.returncode, "tail": p.stdout[-600:]}
    ts = os.path.join(workdir, "test_stat.json")
    if os.path.exists(ts):
        with open(ts) as f:
            out["test_stat"] = json.load(f)
    return out


def torch_roundtrip(root, run_dir, n_imgs=32):
    """export_torch best_acc -> load through the reference's own
    state-dict path -> logits parity on real test images."""
    import torch

    sys.path.insert(0, REF)
    from models.efficientnet_pytorch.model import efficientnet

    n_cls = 4
    tm = efficientnet(task_mode="class", model_name="efficientnet-b0",
                      pretrained=False, num_classes=n_cls)
    tmpl = os.path.join(os.path.dirname(run_dir), "template.pth")
    torch.save(tm.state_dict(), tmpl)

    out_pth = os.path.join(os.path.dirname(run_dir), "exported.pth")
    p = subprocess.run(
        [sys.executable, "-m", "moma_tpu.cli.export_torch",
         "--model", "effiB0", "--dataset", "prostate_hv", "--n_cls", "4",
         "--image_size", "512", "--run", run_dir, "--ckpt_tag", "best_acc",
         "--template", tmpl, "--out", out_pth],
        env=_env(), capture_output=True, text=True, timeout=1200)
    print(p.stdout[-800:], p.stderr[-400:], flush=True)
    if p.returncode != 0:
        return {"rc": p.returncode, "err": p.stderr[-600:]}

    # the reference's test.py load: torch.load -> ckpt['model'] ->
    # load_state_dict (strict)
    ckpt = torch.load(out_pth, map_location="cpu", weights_only=False)
    tm.load_state_dict(ckpt["model"], strict=True)  # raises on mismatch
    tm.eval()

    # identical normalized inputs to both sides, real test images
    from moma_tpu.data.histo import PackedCache
    from moma_tpu.data.manifests import prepare_prostate_hv

    _, _, test = prepare_prostate_hv(root)
    ds = PackedCache(os.path.join(root, "_moma_pack")).build_or_open(
        test, 512)
    imgs = np.stack([np.asarray(ds.images[i]) for i in range(n_imgs)])
    x = imgs.astype(np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xn = (x - mean) / std

    with torch.no_grad():
        tl = tm(torch.from_numpy(
            np.transpose(xn, (0, 3, 1, 2))).contiguous()).numpy()

    import jax
    jax.config.update("jax_platforms", "cpu")  # parity check: CPU is fine
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from moma_tpu.models import create_model

    jm = create_model("effiB0", num_classes=n_cls)
    restored = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(run_dir, "ckpt", "best_acc")))
    params = restored["params"]["student"] if "student" in restored.get(
        "params", {}) else restored["params"]
    bs = restored.get("batch_stats", {})
    bs = bs.get("student", bs)
    _, jl = jm.apply({"params": params, "batch_stats": bs},
                     jnp.asarray(xn), train=False)
    jl = np.asarray(jl, np.float32)
    rel = float(np.linalg.norm(jl - tl) / (np.linalg.norm(jl) + 1e-9))
    agree = float((jl.argmax(1) == tl.argmax(1)).mean())
    return {"rc": 0, "strict_load": True, "logits_rel_l2": round(rel, 6),
            "top1_agreement": agree, "n_imgs": n_imgs}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="/tmp/histo_tree_lc")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--n_train", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--preempt_after", type=float, default=420.0,
                   help="seconds into leg 1 before the SIGTERM preempt")
    p.add_argument("--json", type=str, default="")
    p.add_argument("--skip_train", action="store_true",
                   help="reuse an existing finished run dir")
    a = p.parse_args(argv)

    if not os.path.isdir(os.path.join(a.root, "patches_train_750_v0")):
        from make_jpeg_tree import main as mk
        mk(["--root", a.root, "--n_train", str(a.n_train),
            "--n_val", "256", "--n_test", "256", "--size", "512"])

    save_dir = "/tmp/canonical_lifecycle_save"
    out = {}
    if a.skip_train:
        run_dirs = [d for d in os.listdir(save_dir)
                    if d.startswith("moma_")]
        out["train"] = {"run_dir": os.path.join(save_dir, run_dirs[0]),
                        "skipped": True}
    else:
        shutil.rmtree(save_dir, ignore_errors=True)
        os.makedirs(save_dir)
        out["train"] = train_legs(a.root, save_dir, a.epochs,
                                  a.batch_size, a.preempt_after)
    run_dir = out["train"]["run_dir"]
    out["eval"] = bulk_eval(a.root, run_dir)
    out["torch_roundtrip"] = torch_roundtrip(a.root, run_dir)
    print("[lifecycle]", json.dumps(
        {k: {kk: vv for kk, vv in v.items() if kk not in ("stat",)}
         for k, v in out.items()}, indent=2, default=str)[:4000])
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=2, default=str)
    return out


if __name__ == "__main__":
    main()

"""CLI: bulk checkpoint evaluation — the reference test.py capability
(test.py:146-278): take a list of run directories (or a glob), evaluate
each best checkpoint on a test loader, dump one stat.json with per-model
accuracy / macro-F1 / confusion matrices.

    python -m moma_tpu.cli.test_eval --runs './save/teacher_*' \
        --dataset cifar100 --data_dir ./data --model resnet32x4

    python -m moma_tpu.cli.test_eval --runs '/tmp/smoke*' --synthetic --model resnet8
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import jax
import jax.numpy as jnp

from moma_tpu.core.config import DATASET_NUM_CLASSES
from moma_tpu.core.mesh import create_mesh, replicated_sharding
from moma_tpu.data import augment as aug
from moma_tpu.data.cifar import cifar100_available, load_cifar100
from moma_tpu.data.pipeline import Loader, synthetic_dataset
from moma_tpu.models import create_model
from moma_tpu.models.pretrained import load_pretrained_params
from moma_tpu.train.loop import evaluate
from moma_tpu.train.steps import make_eval_step


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("moma_tpu test_eval")
    p.add_argument("--runs", type=str, default=None,
                   help="glob of run dirs containing ckpt/{best_acc,...}")
    p.add_argument("--csv", type=str, default=None,
                   help="CSV with a 'name' column of run dirs (reference "
                        "test.py reads its model list from CSV, :187-220)")
    p.add_argument("--ckpt_tag", type=str, default="best_acc",
                   choices=["best_acc", "best_f1", "latest"])
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--dataset", type=str, default="cifar100")
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--out", type=str, default="./test_stat.json")
    p.add_argument("--synthetic", action="store_true")
    # reference test.py flag bridge (:146-220): --models_dir is the root
    # holding the run dirs, --csv_dir the CSV of run names to evaluate
    # (joined against models_dir), --n_cls an explicit class count.
    p.add_argument("--models_dir", type=str, default=None,
                   help="reference-compat: root dir of runs; combine with "
                        "--csv_dir (test.py --models_dir)")
    p.add_argument("--csv_dir", type=str, default=None,
                   help="reference-compat alias for --csv; names resolve "
                        "under --models_dir when given (test.py --csv_dir)")
    p.add_argument("--n_cls", type=int, default=None,
                   help="override the dataset's class count (test.py --n_cls)")
    p.add_argument("--model_path", type=str, default=None,
                   help="reference-compat (test.py:62 'where to save'): "
                        "directory for the stat JSON; maps to "
                        "{model_path}/test_stat.json unless --out is given")
    p.add_argument("--num_workers", type=int, default=8,
                   help="loader gather threads (reference DataLoader knob)")
    p.add_argument("--num_per_class", type=int, default=None,
                   help="evaluate a per-class subset of N samples/class — "
                        "the reference's viz loader "
                        "(get_histo_dataloader_viz, histo_dataset.py:784-"
                        "842); combine with --dump_attn")
    p.add_argument("--dump_attn", type=str, default=None,
                   help="directory for attention-map .npz dumps (one per "
                        "MoMA run: atts_q/atts_k maps over one batch + "
                        "atts_queue over the saved queue rows — the "
                        "attn='self_viz' capability, "
                        "criterion_moco_att.py:171-197)")
    p.add_argument("--scoped_vmem_kib", type=int, default=None,
                   help="XLA:TPU scoped-VMEM budget for the eval step "
                        "(default: the tuned 64MB, core/jitopt.py; 0 = "
                        "XLA default)")
    # Reference test.py reuses the full TRAINING parser (test.py:35-118), so
    # its command lines carry training flags that the eval path never reads.
    # Accepted and ignored here so those command lines run unchanged; the
    # two that look eval-relevant are subsumed: --image_resize (the packed
    # cache already stores every image at --image_size) and --aug_train
    # (eval transforms are deterministic; the RA_375_512 eval stack is an
    # orphan experiment branch, histo_dataset.py:664).
    for flag in (
        "--aug_train", "--cosine", "--crop", "--dali", "--deterministic",
        "--dist-url", "--epochs", "--gpu_id", "--image_resize",
        "--learning_rate", "--lr_decay_epochs", "--lr_decay_rate",
        "--momentum", "--multiprocessing-distributed", "--pre_strict",
        "--pretrain", "--print_freq", "--seed", "--skip_test",
        "--skip_validation", "--trial", "--weight_decay",
    ):
        p.add_argument(flag, nargs="?", const=True, default=None,
                       help="accepted for reference test.py compatibility, "
                            "ignored (training-parser residue)")
    return p


def main(argv=None):
    a = build_parser().parse_args(argv)
    from moma_tpu.core import jitopt

    jitopt.set_scoped_vmem(a.scoped_vmem_kib)
    if a.csv_dir and not a.csv:
        a.csv = a.csv_dir
    if a.model_path and a.out == "./test_stat.json":
        os.makedirs(a.model_path, exist_ok=True)
        a.out = os.path.join(a.model_path, "test_stat.json")

    mesh = create_mesh()
    n_cls = a.n_cls or DATASET_NUM_CLASSES.get(a.dataset, 100)
    if a.synthetic:
        test_ds = synthetic_dataset(max(a.batch_size, 128), a.image_size, n_cls, 1)
        norm = aug.cifar_eval_normalize
    elif a.dataset == "cifar100":
        if not cifar100_available(a.data_dir):
            raise FileNotFoundError(f"CIFAR-100 not under {a.data_dir}")
        _, test_ds = load_cifar100(a.data_dir)
        norm = aug.cifar_eval_normalize
    else:
        from moma_tpu.data.histo import load_histo_testset

        test_ds = load_histo_testset(a.dataset, a.data_dir, a.image_size)

        def norm(images):
            return aug.normalize(images, aug.IMAGENET_MEAN, aug.IMAGENET_STD)

    if a.num_per_class:
        import numpy as np

        from moma_tpu.data.manifests import viz_subset
        from moma_tpu.data.pipeline import ArrayDataset

        picked = viz_subset(
            list(zip(range(len(test_ds)), test_ds.labels.tolist())),
            per_class=a.num_per_class,
        )
        idx = np.asarray(sorted(i for i, _ in picked))
        test_ds = ArrayDataset(test_ds.images[idx], test_ds.labels[idx])
        print(f"[viz] per-class subset: {len(test_ds)} samples "
              f"({a.num_per_class}/class)")
    loader = Loader(test_ds, a.batch_size, train=False,
                    num_workers=a.num_workers)
    model = create_model(a.model, num_classes=n_cls)
    sample = jnp.zeros((2, a.image_size, a.image_size, 3))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    eval_step = make_eval_step(model.apply, n_cls, normalize_fn=norm)

    results = {}
    if a.csv:
        import csv as _csv

        with open(a.csv) as f:
            rows = list(_csv.DictReader(f))
        key = "name" if rows and "name" in rows[0] else list(rows[0].keys())[0]
        run_dirs = [r[key] for r in rows]
        if a.models_dir:
            # reference semantics: CSV holds run NAMES under models_dir;
            # test.py:206 actually globs one wildcard level in between
            # ({models_dir}/*/{name}), so fall back to that pattern when
            # the direct join does not exist
            resolved = []
            for d in run_dirs:
                direct = os.path.join(a.models_dir, d)
                if not os.path.isdir(direct):
                    hits = sorted(glob.glob(os.path.join(a.models_dir, "*", d)))
                    if hits:
                        direct = hits[0]
                resolved.append(direct)
            run_dirs = resolved
    elif a.models_dir:
        run_dirs = sorted(
            d for d in glob.glob(os.path.join(a.models_dir, "*"))
            if os.path.isdir(d)
        )
    elif a.runs:
        run_dirs = sorted(glob.glob(a.runs))
    else:
        print("need --runs, --csv, or --models_dir", file=sys.stderr)
        return {}
    if not run_dirs:
        print(f"no runs match {a.runs or a.models_dir}", file=sys.stderr)
        return {}
    for run_dir in run_dirs:
        ckpt_path = os.path.join(run_dir, "ckpt", a.ckpt_tag)
        if not os.path.isdir(ckpt_path):
            # our runners nest an auto-named run dir under --save_dir
            # (<save_dir>/<method>_<dataset>_..._trialN/ckpt); descend one
            # level so --models_dir over a root of save_dirs still works
            nested = sorted(
                d for d in glob.glob(os.path.join(run_dir, "*", "ckpt",
                                                  a.ckpt_tag))
                if os.path.isdir(d)
            )
            if len(nested) == 1:
                ckpt_path = nested[0]
            elif len(nested) > 1:
                print(f"skip {run_dir}: {len(nested)} nested runs have a "
                      f"{a.ckpt_tag} checkpoint — point --runs at them "
                      f"directly")
                continue
            else:
                print(f"skip {run_dir}: no {a.ckpt_tag} checkpoint")
                continue
        v = load_pretrained_params(variables, ckpt_path, strict=True)
        v = jax.device_put(v, replicated_sharding(mesh))
        stats = evaluate(
            # .get: BN-free backbones (ViT family) have no batch_stats
            v["params"], v.get("batch_stats", {}), loader, eval_step,
            mesh, n_cls,
        )
        name = os.path.basename(run_dir.rstrip("/"))
        results[name] = {
            "acc": stats["acc"], "f1": stats["f1"], "loss": stats["loss"],
            "n": stats["n"], "conf_mat": stats["conf_mat"],
        }
        print(f"{name}: acc {stats['acc']:.2f} f1 {stats['f1']:.4f}")
        if a.dump_attn:
            from moma_tpu.moma.viz import dump_attention_maps

            # the run dir owning parameters.json is the ckpt's grandparent
            # (ckpt_path = <run>/ckpt/<tag>), robust to the nested layout
            owner = os.path.dirname(os.path.dirname(ckpt_path.rstrip("/")))
            first = next(iter(loader))
            dump_attention_maps(
                ckpt_path, owner, norm(first["image"]), first["label"],
                os.path.join(a.dump_attn, f"{name}_attn.npz"),
            )

    with open(a.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {a.out}")
    return results


if __name__ == "__main__":
    main()

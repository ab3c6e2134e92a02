"""Export moma_tpu-trained weights as a reference-loadable torch .pth.

The inverse of the torch->Flax import path: fills a torch state-dict
TEMPLATE (the reference model's own .state_dict(), saved to a .pth) with
this framework's weights and writes `{'model': state_dict}` — the shape
the reference's load_pretrained_weights (helper/util.py:141-162) and
test.py evaluation unwrap directly.  Completes the migration story in
both directions (docs/MIGRATION.md): train here, evaluate/deploy there.

Make a template on the reference side with:

    import torch
    from model_def import load_model            # reference repo
    m = load_model('effiB0', 'NULL', n_cls, True, None, False)
    torch.save(m.state_dict(), 'template.pth')

Then:

    python -m moma_tpu.cli.export_torch --model effiB0 --n_cls 4 \
        --run RUNDIR --ckpt_tag best_acc \
        --template template.pth --out weights.pth
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from moma_tpu.core.config import DATASET_NUM_CLASSES
from moma_tpu.models import create_model
from moma_tpu.models.torch_import import (
    _torch_modules, export_state_dict, save_torch_checkpoint)


def main(argv=None):
    p = argparse.ArgumentParser("moma_tpu export_torch")
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--dataset", type=str, default="cifar100")
    p.add_argument("--n_cls", type=int, default=0)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--run", type=str, default=None,
                   help="run dir containing ckpt/<tag>; omit to export a "
                        "fresh init (smoke)")
    p.add_argument("--ckpt_tag", type=str, default="best_acc",
                   choices=["best_acc", "best_f1", "latest"])
    p.add_argument("--pretrain", type=str, default=None,
                   help="direct checkpoint path or preset tag instead of "
                        "--run (orbax dir or .pth)")
    p.add_argument("--template", type=str, required=True,
                   help="torch .pth holding the REFERENCE model's "
                        ".state_dict() (supplies key names/shapes; see "
                        "module docstring for how to make one)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--skip_classifier", action="store_true",
                   help="cross-task mode: leave the template's classifier "
                        "untouched (label spaces differ — the reference's "
                        "strict=False load)")
    a = p.parse_args(argv)
    if a.run and a.pretrain:
        raise SystemExit("pass ONE of --run / --pretrain")

    n_cls = a.n_cls or DATASET_NUM_CLASSES.get(a.dataset, 100)
    model = create_model(a.model, num_classes=n_cls)
    sample = jnp.zeros((2, a.image_size, a.image_size, 3))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    src = "fresh init"
    ckpt = a.pretrain or (os.path.join(a.run, "ckpt", a.ckpt_tag)
                          if a.run else None)
    if ckpt:
        from moma_tpu.models.pretrained import load_pretrained_params

        variables = load_pretrained_params(variables, ckpt, strict=True)
        src = ckpt

    import torch

    obj = torch.load(a.template, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    elif isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    template = {k: v for k, v in obj.items()}

    sd = export_state_dict(variables, template,
                           skip_classifier=a.skip_classifier)
    kinds = {}
    for m in _torch_modules({k: (v.numpy() if hasattr(v, "numpy") else v)
                             for k, v in template.items()}):
        kinds[m["kind"]] = kinds.get(m["kind"], 0) + 1
    save_torch_checkpoint(a.out, sd, meta={"source": src,
                                           "framework": "moma_tpu"})
    filled = {k: v for k, v in kinds.items()
              if k in ("conv", "bn", "linear", "ln")}
    print(f"exported {a.model} ({src}) -> {a.out} "
          f"({len(sd)} tensors; modules filled: {filled}"
          f"{'; classifier kept from template' if a.skip_classifier else ''})")


if __name__ == "__main__":
    main()

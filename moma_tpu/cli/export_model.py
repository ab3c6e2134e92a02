"""CLI: export a trained checkpoint as a self-contained serving artifact.

The deployment story the reference lacks (its `test.py` needs the full
Python model zoo + torch to run a checkpoint): serializes the eval
forward — normalize + backbone + classifier, weights baked in, symbolic
batch dimension — as StableHLO via jax.export.  The artifact reloads
with `moma_tpu.core.export.ExportedClassifier` (jax only, no model code)
on any jax backend.

    # export the best checkpoint of a run:
    python -m moma_tpu.cli.export_model --run ./save/teacher_x \
        --model resnet32x4 --dataset cifar100 --out ./serve/teacher_x
    # or a fresh init (smoke / shape check):
    python -m moma_tpu.cli.export_model --model resnet8 --image_size 32 \
        --n_cls 10 --out /tmp/m

Precision guidance (measured on TPU v5e, BASELINE.md "Serving floor
analysis"): export `--bf16` ALONE for BOTH conv and transformer
backbones — effiB0@512 4,560 img/s (2.38x over f32, device trace
27.15 ms/call) vs int8+bf16's 4,175 (the per-layer quantize/dequantize
clamp fusions cost more HBM traffic than int8 dots save); vit_tiny@224
bf16 2.7x over f32 while int8 dense trunks LOSE outright
(int32-accumulating dots forgo the MXU bf16 rate).  `--int8` remains
useful when artifact/weight MEMORY is the constraint, at a measured
~8% throughput cost vs plain bf16 on conv nets.  (The earlier
"conv nets -> --int8 --bf16" ranking came from dispatch-stalled
wallclock; device traces overturned it.)
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.config import DATASET_NUM_CLASSES
from moma_tpu.core.export import ExportedClassifier, export_classifier
from moma_tpu.data import augment as aug
from moma_tpu.models import create_model

# benchmark-mode name -> export flags; the ONE copy shared by
# scripts/bench_serving.py and scripts/analyze_serving.py so the
# throughput benchmark and the trace analyzer can never measure
# different artifact configs under the same mode name
PRECISION_MODES = {
    "f32": [],
    "bf16": ["--bf16"],
    "int8": ["--int8", "--calib_n", "2"],
    "int8_bf16": ["--int8", "--calib_n", "2", "--bf16"],
    "int8_dynamic": ["--int8_dynamic"],
    "w8": ["--int8_weights"],
    "w8_bf16": ["--int8_weights", "--bf16"],
}


def main(argv=None):
    p = argparse.ArgumentParser("moma_tpu export_model")
    p.add_argument("--run", type=str, default=None,
                   help="run dir containing ckpt/<tag>; omit to export a "
                        "fresh init (smoke)")
    p.add_argument("--ckpt_tag", type=str, default="best_acc",
                   choices=["best_acc", "best_f1", "latest"])
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--dataset", type=str, default="cifar100")
    p.add_argument("--n_cls", type=int, default=0)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--verify", action="store_true",
                   help="reload the artifact and check logits match the "
                        "live model on a random batch")
    p.add_argument("--bf16", action="store_true",
                   help="bake bf16 compute into the artifact (~1.7x serving "
                        "throughput on TPU; logits stay f32)")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 quantization of every conv "
                        "(per-tensor act / per-channel weight scales, int32 "
                        "accumulation — the v5e MXU int8 path; calibrated on "
                        "--calib_n batches)")
    p.add_argument("--calib_n", type=int, default=4,
                   help="int8 calibration batches (of 8 images), drawn from "
                        "--calib_images when given, else uniform-noise "
                        "images (noise covers the post-normalize range — "
                        "adequate for absmax scales, but real data bounds "
                        "real activation ranges tighter)")
    p.add_argument("--calib_images", type=str, default=None,
                   help="glob of image files to calibrate int8 activation "
                        "scales on (the served distribution); omitted = "
                        "uniform-noise calibration")
    p.add_argument("--int8_dynamic", action="store_true",
                   help="int8 with PER-BATCH in-graph activation scales "
                        "instead of calibrated constants (no calibration "
                        "pass; one extra absmax reduce per conv at serve "
                        "time)")
    p.add_argument("--int8_weights", action="store_true",
                   help="WEIGHTS-ONLY int8: kernels stored int8 "
                        "(per-channel scales) and dequantized in-graph; "
                        "activations/accumulation untouched — bf16-class "
                        "speed at ~4x smaller weight constants, near-"
                        "lossless (no activation rounding).  Combine with "
                        "--bf16.  No calibration needed")
    a = p.parse_args(argv)
    if sum((a.int8, a.int8_dynamic, a.int8_weights)) > 1:
        # conflicting quantization modes error rather than being silently
        # resolved (the --bn/--sync_bn convention, core/config.py)
        raise SystemExit("pick ONE of --int8 / --int8_dynamic / "
                         "--int8_weights: calibrated activations vs "
                         "per-batch in-graph scales vs weights-only")

    n_cls = a.n_cls or DATASET_NUM_CLASSES.get(a.dataset, 100)
    model = create_model(a.model, num_classes=n_cls,
                         dtype=jnp.bfloat16 if a.bf16 else None)
    sample = jnp.zeros((2, a.image_size, a.image_size, 3))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    if a.run:
        from moma_tpu.models.pretrained import load_pretrained_params

        ckpt_path = os.path.join(a.run, "ckpt", a.ckpt_tag)
        variables = load_pretrained_params(variables, ckpt_path, strict=True)

    # mirror train/teacher.py augment_fns: normalization keys on the
    # DATASET (cifar100 / synthetic@32 -> CIFAR stats), not the image
    # size — a non-CIFAR 32px run trains with ImageNet stats
    if a.dataset == "cifar100" or (a.dataset == "synthetic" and a.image_size == 32):
        norm = aug.cifar_eval_normalize          # /255 applied for uint8
    else:
        def norm(x):  # x uint8: normalize() divides by 255 itself
            return aug.normalize(x, aug.IMAGENET_MEAN, aug.IMAGENET_STD)

    apply_fn = model.apply
    if a.int8_weights:
        from moma_tpu.core.quantize import weight_only_for_serving

        # shape-only sample: eval_shape(norm) keeps the enumeration off
        # the device (eager norm would cost relay RTTs on axon and fail
        # outright when the relay is down — session-7 lesson)
        sample = jax.eval_shape(
            norm, jax.ShapeDtypeStruct(
                (2, a.image_size, a.image_size, 3), jnp.uint8))
        apply_fn, n_layers = weight_only_for_serving(
            model.apply, variables, sample,
            dense=True, n_cls=n_cls, train=False)
        print(f"int8 weights-only: {n_layers} conv/dense kernels stored "
              f"int8 (per-channel scales), dequantized in-graph")
    elif a.int8_dynamic:
        from moma_tpu.core.quantize import quantized_apply_dynamic

        apply_fn = quantized_apply_dynamic(model.apply)
        print("int8 dynamic: per-batch activation scales in-graph")
    elif a.int8:
        from moma_tpu.core.quantize import quantize_for_serving

        if a.calib_images:
            import glob as _glob

            from moma_tpu.cli.serve import _decode_batch

            paths = sorted(_glob.glob(a.calib_images))
            if not paths:
                raise SystemExit(
                    f"--calib_images matched no files: {a.calib_images}")
            need = min(len(paths), a.calib_n * 8)
            calib = [
                norm(jnp.asarray(_decode_batch(paths[i : i + 8],
                                               a.image_size)))
                for i in range(0, need, 8)
            ]
            src = f"{need} images from {a.calib_images}"
        else:
            rs = np.random.RandomState(1234)
            calib = [
                norm(jnp.asarray(rs.randint(
                    0, 256, (8, a.image_size, a.image_size, 3), np.uint8)))
                for _ in range(a.calib_n)
            ]
            src = f"{a.calib_n} uniform-noise batches"
        apply_fn, scales = quantize_for_serving(
            model.apply, variables, calib, dense=True, n_cls=n_cls,
            train=False)
        print(f"int8 PTQ: {len(scales)} conv/dense layers calibrated "
              f"({src})")

    path = export_classifier(
        apply_fn, variables, a.image_size, a.out, normalize=norm,
        meta={"model": a.model, "n_cls": n_cls, "dataset": a.dataset,
              "ckpt": a.run or "fresh-init", "tag": a.ckpt_tag,
              "quantized": ("int8_dynamic" if a.int8_dynamic
                            else "int8" if a.int8
                            else "int8_weights" if a.int8_weights
                            else None)},
    )
    size_mb = os.path.getsize(path) / 1e6
    print(f"exported {a.model} ({n_cls} classes, {a.image_size}px) -> "
          f"{path} ({size_mb:.1f} MB, symbolic batch)")

    if a.verify:
        clf = ExportedClassifier(path)
        rs = np.random.RandomState(0)
        x = rs.randint(0, 256, (3, a.image_size, a.image_size, 3), np.uint8)
        got = np.asarray(clf(x))
        # training-eval pipeline: uint8 straight into the normalize fn
        # (apply_fn, not model.apply: with --int8 the artifact is quantized;
        # jitted: eager per-op dispatch through the axon relay takes minutes)
        live = jax.jit(lambda v, xx: apply_fn(v, xx, train=False))
        _, want = live(variables, norm(jnp.asarray(x)))
        want = np.asarray(want, np.float32)
        if a.int8 or a.int8_dynamic or a.int8_weights:
            # int8 artifacts: a round(x/s) tie boundary can flip under the
            # artifact's fp contraction order, and ONE early flip reshuffles
            # every downstream rounding — so deep stacks (ViT: 48 dense
            # layers) legitimately differ from the live model at the
            # quantization-noise scale.  Bound the relative L2 instead of
            # elementwise equality (measured: resnet8 ~1e-4, vit_tiny ~2%).
            rel = float(np.linalg.norm(got - want)
                        / (np.linalg.norm(want) + 1e-12))
            assert rel < 0.05, f"int8 artifact rel L2 {rel:.4f} >= 0.05"
            print(f"verify: artifact within int8 noise of the live model "
                  f"(rel L2 {rel:.2e}, batch 3, logits {got.shape})")
        else:
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
            print(f"verify: reloaded artifact matches the live model "
                  f"(batch 3, logits {got.shape})")
    return path


if __name__ == "__main__":
    main()

"""Post-training int8 quantization (core/quantize.py).

The reference has no quantization story (SURVEY §2.7 lists apex AMP as
its only precision feature); these tests pin the TPU-serving PTQ pass:
grid exactness, per-backbone logit drift at fresh init, top-1 parity on
a TRAINED model, and export-through-jax.export integration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import flax.linen as nn

from moma_tpu.core.quantize import (
    calibrate,
    quantize_for_serving,
    quantized_apply,
    quantized_apply_dynamic,
)
from moma_tpu.models import create_model


def test_grid_exactness():
    """Inputs/weights already on the int8 grid -> int8 conv == fp conv."""
    conv = nn.Conv(8, (3, 3), padding="SAME")
    rs = np.random.RandomState(0)
    x = np.asarray(rs.randint(-127, 128, (2, 8, 8, 4)), np.float32)
    x[0, 0, 0, 0] = 127.0  # pin absmax so scale = 1 (values stay on-grid)
    x = jnp.asarray(x)
    kshape = conv.init(jax.random.key(0), x)["params"]["kernel"].shape
    k = np.asarray(rs.randint(-127, 128, kshape), np.float32)
    k[0, 0, 0, :] = 127.0  # per-channel absmax = 127 -> per-channel scale 1
    v = {"params": {"kernel": jnp.asarray(k), "bias": jnp.zeros((8,))}}
    y_fp = conv.apply(v, x)
    scales = calibrate(conv.apply, v, [x])
    # absmax/127 scale keeps every integer value exactly representable
    y_q = quantized_apply(conv.apply, scales)(v, x)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_fp),
                               rtol=0, atol=1e-3)


@pytest.mark.parametrize("name,n_convs", [
    ("resnet8", 9), ("vgg8", 5), ("MobileNetV2", 53), ("effiB0", 81),
])
def test_backbone_coverage_and_drift(name, n_convs):
    """Every conv is calibrated, and each quantized conv stays close to
    its fp counterpart ON THE REAL ACTIVATIONS of a fresh-init forward.

    Per-conv relative error (not end-logit cosine): fresh-init deep
    nets collapse activations toward zero (MobileNetV2 logit norm
    ~2e-8), so end-to-end metrics compare noise with noise.  The
    trained test below is the end-to-end accuracy gate.
    """
    from moma_tpu.core.quantize import (_is_conv_call, _path_key,
                                        _quantized_conv, _supported)

    model = create_model(name, num_classes=10)
    rs = np.random.RandomState(0)
    size = 64 if name == "effiB0" else 32
    x = jnp.asarray(rs.randint(0, 256, (4, size, size, 3)) / 255.0,
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    scales = calibrate(model.apply, v, [x], train=False)
    assert len(scales) == n_convs

    errs = {}

    def interceptor(next_fun, fargs, fkwargs, context):
        y_fp = next_fun(*fargs, **fkwargs)
        if _is_conv_call(context) and _supported(context.module, fargs[0]):
            key = _path_key(context.module)
            y_q = _quantized_conv(context.module, fargs[0], scales[key])
            errs[key] = float(jnp.linalg.norm(y_q - y_fp)
                              / (jnp.linalg.norm(y_fp) + 1e-12))
        return y_fp  # feed the fp value forward: errors don't compound

    with nn.intercept_methods(interceptor):
        model.apply(v, x, train=False)
    assert len(errs) == n_convs
    # fresh-init deep nets collapse activations to ~0 with depth; convs
    # whose calibrated input absmax fell below ~1e-3 quantize a numeric-
    # noise input to all-zeros (rel err ~1.0 vs a ~0 target) — degenerate
    # inputs no trained model produces.  Assert on the live convs only.
    live = {k: e for k, e in errs.items() if scales[k] > 1e-3 / 127.0}
    assert len(live) >= min(5, n_convs), (name, len(live))
    med, worst = np.median(list(live.values())), max(live.values())
    top = sorted(live.items(), key=lambda kv: -kv[1])[:3]
    assert med < 0.05, (name, med, top)
    assert worst < 0.30, (name, top)


def _make_task(n, seed, noise=0.5, hw=32, n_cls=4):
    """Learnable low-frequency class templates + noise
    (scripts/e2e_accuracy_parity.py:44-61)."""
    tmpl_rs = np.random.RandomState(777)
    templates = tmpl_rs.rand(n_cls, hw, hw, 3).astype(np.float32)
    for _ in range(3):
        templates = (np.roll(templates, 1, 1) + np.roll(templates, -1, 1)
                     + np.roll(templates, 1, 2) + np.roll(templates, -1, 2)
                     + templates) / 5.0
    rs = np.random.RandomState(seed)
    labels = rs.randint(0, n_cls, (n,))
    x = (1.0 - noise) * templates[labels] + noise * rs.rand(
        n, hw, hw, 3).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(labels, jnp.int32)


def test_dense_quantization_vit_and_classifier_exclusion():
    """dense=True quantizes the ViT trunk (48 nn.Dense + patch-embed
    conv in vit_tiny) but never a final-logits nn.Dense (vgg8's
    classifier — the only CNNs using nn.Dense for logits are
    vgg/mobilenetv2; all others use TorchLinear, never intercepted)."""
    rs = np.random.RandomState(0)

    m = create_model("vgg8", num_classes=10)
    x = jnp.asarray(rs.rand(2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    s_conv = calibrate(m.apply, v, [x], train=False)
    s_all = calibrate(m.apply, v, [x], dense=True, n_cls=10, train=False)
    assert set(s_all) == set(s_conv)  # classifier Dense excluded

    mv = create_model("vit_tiny_patch16_224", num_classes=10)
    xv = jnp.asarray(rs.rand(2, 224, 224, 3), jnp.float32)
    vv = mv.init(jax.random.PRNGKey(0), xv, train=False)
    qapply, sv = quantize_for_serving(mv.apply, vv, [xv], dense=True,
                                      n_cls=10, train=False)
    assert sum(1 for k in sv if "Dense" in k) == 48  # 12 blocks x 4
    assert len(sv) == 49  # + the patch-embed conv
    out_f = mv.apply(vv, xv, train=False)
    out_q = qapply(vv, xv, train=False)
    lf = np.asarray(out_f[1] if isinstance(out_f, tuple) else out_f).ravel()
    lq = np.asarray(out_q[1] if isinstance(out_q, tuple) else out_q).ravel()
    rel = np.linalg.norm(lq - lf) / (np.linalg.norm(lf) + 1e-12)
    assert rel < 0.05, rel  # measured 1.9% at fresh init


def test_trained_top1_parity():
    """int8 top-1 on a trained resnet8 within 2 pts of fp (both >> chance)."""
    model = create_model("resnet8", num_classes=4)
    tx, ty = _make_task(256, seed=11)
    vx, vy = _make_task(256, seed=12)
    variables = model.init(jax.random.PRNGKey(0), tx[:2], train=False)
    opt = optax.sgd(0.05, momentum=0.9)
    opt_state = opt.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, xb, yb):
        def loss_fn(p):
            (feats, logits), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, xb, train=True,
                mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
            return loss, mut["batch_stats"]
        (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, up), bs, opt_state, loss

    # 10 epochs: train loss converges by ~7 but val acc lags it (BN
    # running stats are an EMA; measured curve: ep7 0.73, ep9 0.79)
    params, bstats = variables["params"], variables["batch_stats"]
    for epoch in range(10):
        for i in range(0, 256, 32):
            params, bstats, opt_state, loss = step(
                params, bstats, opt_state, tx[i:i + 32], ty[i:i + 32])
    trained = {"params": params, "batch_stats": bstats}

    _, lf = model.apply(trained, vx, train=False)
    acc_fp = float((jnp.argmax(lf, -1) == vy).mean())
    assert acc_fp > 0.6, f"training failed to learn (acc {acc_fp})"

    qapply, scales = quantize_for_serving(
        model.apply, trained, [tx[:64]], train=False)
    _, lq = qapply(trained, vx, train=False)
    acc_q = float((jnp.argmax(lq, -1) == vy).mean())
    agree = float((jnp.argmax(lq, -1) == jnp.argmax(lf, -1)).mean())
    assert acc_q > acc_fp - 0.02, (acc_fp, acc_q)
    assert agree > 0.95, agree

    # dynamic variant (no calibration; in-graph per-batch act scales)
    # must hold the same accuracy bar on the same trained weights
    dapply = jax.jit(lambda v, x: quantized_apply_dynamic(model.apply)(
        v, x, train=False))
    _, ld = dapply(trained, vx)
    acc_d = float((jnp.argmax(ld, -1) == vy).mean())
    agree_d = float((jnp.argmax(ld, -1) == jnp.argmax(lf, -1)).mean())
    assert acc_d > acc_fp - 0.02, (acc_fp, acc_d)
    assert agree_d > 0.95, agree_d


def test_dynamic_matches_static_on_calibration_batch():
    """For a single conv (no quantized upstream), calibrating on the
    inference batch makes static and dynamic scales identical ->
    identical outputs.  (Deeper nets diverge by design: static scales
    come from the FP calibration forward, dynamic sees the quantized-
    upstream activations.)"""
    conv = nn.Conv(8, (3, 3), padding="SAME")
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(2, 16, 16, 4), jnp.float32)
    v = conv.init(jax.random.key(0), x)
    scales = calibrate(conv.apply, v, [x])
    ls = quantized_apply(conv.apply, scales)(v, x)
    ld = quantized_apply_dynamic(conv.apply)(v, x)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ls),
                               rtol=1e-6, atol=1e-7)


def test_export_integration(tmp_path):
    """quantized_apply exports through jax.export and reloads bit-equal."""
    from moma_tpu.core.export import ExportedClassifier, export_classifier

    model = create_model("resnet8", num_classes=10)
    rs = np.random.RandomState(0)
    xu8 = rs.randint(0, 256, (3, 32, 32, 3)).astype(np.uint8)
    norm = lambda im: im.astype(jnp.float32) / 255.0
    xf = norm(jnp.asarray(xu8))
    variables = model.init(jax.random.PRNGKey(0), xf, train=False)
    qapply, _ = quantize_for_serving(model.apply, variables, [xf],
                                     train=False)
    path = export_classifier(qapply, variables, 32, str(tmp_path / "m"),
                             normalize=norm)
    clf = ExportedClassifier(path)
    got = np.asarray(clf(xu8))
    _, want = qapply(variables, xf, train=False)
    np.testing.assert_allclose(got, np.asarray(want, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_cli_int8_export(tmp_path):
    from moma_tpu.cli.export_model import main

    out = str(tmp_path / "q")
    main(["--model", "resnet8", "--n_cls", "10", "--image_size", "32",
          "--out", out, "--int8", "--verify"])


def test_cli_int8_dynamic_export(tmp_path):
    from moma_tpu.cli.export_model import main

    out = str(tmp_path / "qd")
    main(["--model", "resnet8", "--n_cls", "10", "--image_size", "32",
          "--out", out, "--int8_dynamic", "--verify"])
    import json
    with open(out + ".json") as f:
        assert json.load(f)["quantized"] == "int8_dynamic"


def test_cli_int8_vit_export(tmp_path):
    """ViT int8 export: trunk Dense layers quantize, artifact verifies
    within the int8 noise bound (elementwise equality is impossible for
    48 stacked quantized matmuls — one tie flip reshuffles downstream
    rounding)."""
    from moma_tpu.cli.export_model import main

    out = str(tmp_path / "vit_q")
    main(["--model", "vit_tiny_patch16_224", "--n_cls", "10",
          "--image_size", "224", "--out", out, "--int8", "--verify"])


def test_cli_int8_bf16_export(tmp_path):
    """int8 convs + bf16 epilogue compose (the fastest serving config):
    kernels quantize from their f32 params, the epilogue and the rest of
    the net run bf16 via the model dtype."""
    from moma_tpu.cli.export_model import main

    out = str(tmp_path / "qb")
    main(["--model", "resnet8", "--n_cls", "10", "--image_size", "32",
          "--out", out, "--int8", "--bf16", "--verify"])


def test_weight_only_grid_exactness():
    """Kernels already on the int8 grid -> weight-only conv == fp conv
    EXACTLY (activations are untouched, so unlike full int8 there is no
    input-rounding term at all)."""
    from moma_tpu.core.quantize import weight_only_for_serving

    conv = nn.Conv(8, (3, 3), padding="SAME")
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 8, 8, 4), jnp.float32)
    kshape = conv.init(jax.random.key(0), x)["params"]["kernel"].shape
    k = np.asarray(rs.randint(-127, 128, kshape), np.float32)
    k[0, 0, 0, :] = 127.0  # per-channel absmax = 127 -> scale exactly 1
    v = {"params": {"kernel": jnp.asarray(k), "bias": jnp.zeros((8,))}}
    wapply, n = weight_only_for_serving(conv.apply, v, x, dense=False)
    assert n == 1
    np.testing.assert_allclose(np.asarray(wapply(v, x)),
                               np.asarray(conv.apply(v, x)),
                               rtol=0, atol=1e-5)


def test_weight_only_near_lossless_fresh_init():
    """Weight-only int8 has NO activation-absmax degeneracy (the fresh-
    init failure mode of full int8): end logits stay within ~2% rel L2
    of fp even on untrained deep nets."""
    from moma_tpu.core.quantize import weight_only_for_serving

    for name, size in [("resnet8", 32), ("effiB0", 64)]:
        model = create_model(name, num_classes=10)
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(4, size, size, 3), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        wapply, _ = weight_only_for_serving(model.apply, v, x, dense=True,
                                            n_cls=10, train=False)
        _, lf = model.apply(v, x, train=False)
        _, lw = jax.jit(lambda vv, xx: wapply(vv, xx, train=False))(v, x)
        rel = float(np.linalg.norm(np.asarray(lw) - np.asarray(lf))
                    / (np.linalg.norm(np.asarray(lf)) + 1e-12))
        assert rel < 0.05, (name, rel)


def test_weight_only_vit_coverage_and_exclusion():
    """dense=True weight-only covers the ViT trunk (48 Dense + patch-
    embed conv) and keeps the logits Dense fp — same rule as calibrate."""
    from moma_tpu.core.quantize import collect_quantizable

    mv = create_model("vit_tiny_patch16_224", num_classes=10)
    xv = jnp.zeros((2, 224, 224, 3), jnp.float32)
    vv = mv.init(jax.random.PRNGKey(0), xv, train=False)
    layers = collect_quantizable(mv.apply, vv, xv, dense=True, n_cls=10,
                                 train=False)
    assert sum(1 for _, kind in layers if kind == "dense") == 48
    assert len(layers) == 49  # + the patch-embed conv


def test_weight_only_trained_top1():
    """Weight-only top-1 on a trained resnet8: within 1 pt of fp and
    >98% prediction agreement (tighter than the 2 pt / 95% full-int8
    bars — no activation rounding)."""
    from moma_tpu.core.quantize import weight_only_for_serving

    model = create_model("resnet8", num_classes=4)
    tx, ty = _make_task(256, seed=11)
    vx, vy = _make_task(256, seed=12)
    variables = model.init(jax.random.PRNGKey(0), tx[:2], train=False)
    opt = optax.sgd(0.05, momentum=0.9)
    opt_state = opt.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, xb, yb):
        def loss_fn(p):
            (feats, logits), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, xb, train=True,
                mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
            return loss, mut["batch_stats"]
        (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, up), bs, opt_state, loss

    params, bstats = variables["params"], variables["batch_stats"]
    for epoch in range(10):
        for i in range(0, 256, 32):
            params, bstats, opt_state, loss = step(
                params, bstats, opt_state, tx[i:i + 32], ty[i:i + 32])
    trained = {"params": params, "batch_stats": bstats}

    _, lf = model.apply(trained, vx, train=False)
    acc_fp = float((jnp.argmax(lf, -1) == vy).mean())
    assert acc_fp > 0.6, f"training failed to learn (acc {acc_fp})"

    wapply, _ = weight_only_for_serving(model.apply, trained, vx[:2],
                                        train=False)
    _, lw = jax.jit(lambda v, x: wapply(v, x, train=False))(trained, vx)
    acc_w = float((jnp.argmax(lw, -1) == vy).mean())
    agree = float((jnp.argmax(lw, -1) == jnp.argmax(lf, -1)).mean())
    assert acc_w > acc_fp - 0.01, (acc_fp, acc_w)
    assert agree > 0.98, agree


def test_weight_only_artifact_small_and_barriered(tmp_path):
    """The exported weight-only artifact (a) actually stores int8 kernel
    constants — file < 0.5x the f32 artifact (f32 kernels would make it
    EQUAL: DCE at trace is what removes them), and (b) keeps the
    stablehlo optimization_barrier that stops the compiler folding the
    dequant back into a full-width kernel."""
    from moma_tpu.cli.export_model import main
    from moma_tpu.core.export import ExportedClassifier
    import os, json

    out_fp = str(tmp_path / "fp")
    main(["--model", "resnet8", "--n_cls", "10", "--image_size", "32",
          "--out", out_fp])
    out_w = str(tmp_path / "w8")
    main(["--model", "resnet8", "--n_cls", "10", "--image_size", "32",
          "--out", out_w, "--int8_weights", "--verify"])
    sz_fp = os.path.getsize(out_fp + ".stablehlo")
    sz_w = os.path.getsize(out_w + ".stablehlo")
    assert sz_w < 0.5 * sz_fp, (sz_fp, sz_w)
    with open(out_w + ".json") as f:
        assert json.load(f)["quantized"] == "int8_weights"
    clf = ExportedClassifier(out_w)
    assert "optimization_barrier" in clf._exp.mlir_module()


def test_cli_int8_weights_bf16_export(tmp_path):
    """--int8_weights composes with --bf16 (the recommended serving
    config): int8 kernels dequantize straight to bf16, activations bf16."""
    from moma_tpu.cli.export_model import main

    out = str(tmp_path / "w8b")
    main(["--model", "resnet8", "--n_cls", "10", "--image_size", "32",
          "--out", out, "--int8_weights", "--bf16", "--verify"])


def test_cli_quant_mode_conflict(tmp_path):
    from moma_tpu.cli.export_model import main

    with pytest.raises(SystemExit):
        main(["--model", "resnet8", "--n_cls", "10", "--image_size", "32",
              "--out", str(tmp_path / "x"), "--int8", "--int8_weights"])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

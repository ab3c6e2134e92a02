"""Core-layer tests: schedules (parity with helper/util.py:37-50),
metrics, mesh/sharding plumbing."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.core.mesh import create_mesh, data_sharding, local_batch_size
from moma_tpu.core.metrics import (
    EvalAccumulator,
    accuracy_topk,
    confusion_matrix,
    macro_f1,
)
from moma_tpu.core.schedules import lr_at_epoch, lr_schedule


def _reference_lr(epoch, lr, epochs, cosine, decay_rate, decay_epochs):
    # direct transcription of the published formula (helper/util.py:37-50)
    if cosine:
        eta_min = lr * (decay_rate**3)
        return eta_min + (lr - eta_min) * (1 + math.cos(math.pi * epoch / epochs)) / 2
    steps = sum(epoch > np.asarray(decay_epochs))
    return lr * decay_rate**steps if steps > 0 else lr


@pytest.mark.parametrize("cosine", [True, False])
def test_lr_epoch_parity(cosine):
    for epoch in range(1, 61):
        got = lr_at_epoch(
            epoch, 0.05, 60, cosine=cosine, decay_rate=0.1,
            decay_epochs=(30, 40, 50),
        )
        want = _reference_lr(epoch, 0.05, 60, cosine, 0.1, (30, 40, 50))
        assert got == pytest.approx(want, rel=1e-12)


def test_lr_schedule_steps_constant_within_epoch():
    sched = lr_schedule(0.05, 10, steps_per_epoch=7, cosine=True)
    vals = [float(sched(jnp.asarray(s))) for s in range(21)]
    assert vals[0] == vals[6]  # epoch 1
    assert vals[7] == vals[13]  # epoch 2
    assert vals[0] != vals[7]
    assert vals[0] == pytest.approx(lr_at_epoch(1, 0.05, 10, cosine=True))


def test_accuracy_topk():
    logits = jnp.asarray(
        [[10.0, 5.0, 1.0], [1.0, 2.0, 3.0], [0.0, 9.0, 1.0], [3.0, 2.0, 1.0]]
    )
    labels = jnp.asarray([0, 1, 1, 2])
    acc1, acc2 = accuracy_topk(logits, labels, topk=(1, 2))
    assert float(acc1) == pytest.approx(50.0)
    assert float(acc2) == pytest.approx(75.0)


def test_conf_mat_and_f1():
    logits = jnp.asarray([[2.0, 1.0], [2.0, 1.0], [0.0, 1.0], [1.0, 0.0]])
    labels = jnp.asarray([0, 1, 1, 0])
    cm = np.asarray(confusion_matrix(logits, labels, 2))
    # preds = [0,0,1,0]; cm[true,pred]
    assert cm.tolist() == [[2.0, 0.0], [1.0, 1.0]]
    # class0: tp=2 fp=1 fn=0 -> 0.8; class1: tp=1 fp=0 fn=1 -> 2/3
    assert macro_f1(cm) == pytest.approx((0.8 + 2 / 3) / 2)


def test_conf_mat_mask():
    logits = jnp.asarray([[2.0, 1.0], [0.0, 1.0]])
    labels = jnp.asarray([0, 0])
    mask = jnp.asarray([True, False])
    cm = np.asarray(confusion_matrix(logits, labels, 2, mask=mask))
    assert cm.sum() == 1.0


def test_eval_accumulator():
    acc = EvalAccumulator(n_cls=3)
    acc.update(6.0, 2, np.eye(3))
    acc.update(3.0, 1, np.zeros((3, 3)))
    assert acc.loss == pytest.approx(3.0)
    assert acc.acc == pytest.approx(100.0)


def test_mesh_shapes(mesh8, mesh4x2):
    assert mesh8.shape == {"data": 8, "model": 1}
    assert mesh4x2.shape == {"data": 4, "model": 2}
    assert local_batch_size(64, mesh8) == 8


def test_data_sharding_places_batch(mesh8):
    x = np.zeros((16, 4, 4, 3), np.float32)
    y = jax.device_put(x, data_sharding(mesh8, ndim=4))
    assert len(y.addressable_shards) == 8
    assert y.addressable_shards[0].data.shape == (2, 4, 4, 3)


def test_reference_command_lines_parse():
    """Drop-in flag compatibility: the reference's own command lines (incl.
    run_moma.sh's flags and the env/distributed flags that are N/A on TPU)
    must parse unchanged."""
    from moma_tpu.core.config import parse_student_args, parse_teacher_args

    cfg = parse_teacher_args(
        "--model effiB0 --dataset prostate_hv --n_cls 4 --gpu_id 0,1 "
        "--dali gpu --deterministic --skip_validation --batch_size 64 "
        "--image_size 512 --cosine --epochs 50 --learning_rate 0.05".split()
    )
    assert cfg.model_s.name == "effiB0" and cfg.model_s.n_cls == 4
    # the reference's --skip_validation is store_false-INVERTED: passing it
    # RUNS the pre-flight teacher eval (train_teacher.py:88,230) — parsing
    # must preserve that behavior under the honest field name
    assert cfg.run.preflight_eval is True
    assert parse_teacher_args(
        "--model resnet8".split()).run.preflight_eval is False

    # scripts/run_moma.sh flags (with the reference's 'cmo' method name)
    cfg = parse_student_args(
        "--model_s effiB0 --model_t effiB0 --distill cmo -c1 -d1 -b1 "
        "--feat_dim 512 --head mlp --attn self --std_pre PANDA "
        "--tec_pre PANDA --n_cls 4 --dataset custom --gpu_id 0,1 "
        "--multiprocessing-distributed "
        "--dist-url tcp://127.0.0.1:23451".split()
    )
    assert cfg.distill.distill == "moma"        # cmo alias resolved
    assert cfg.moma.nce_t == 0.15               # forced for moma
    assert cfg.model_s.n_cls == cfg.model_t.n_cls == 4


def test_bn_flag_resolution():
    """--sync_bn is an alias for --bn sync; combining it with an explicit
    contradictory --bn errors instead of silently overriding, and the
    unwired bn modes are rejected loudly outside --distill moma."""
    import pytest

    from moma_tpu.core.config import parse_student_args, parse_teacher_args

    assert parse_teacher_args("--model resnet8".split()).run.bn == "global"
    assert parse_teacher_args(
        "--model resnet8 --sync_bn".split()).run.bn == "sync"
    assert parse_teacher_args(
        "--model resnet8 --bn sync --sync_bn".split()).run.bn == "sync"
    assert parse_teacher_args(
        "--model resnet8 --bn local".split()).run.bn == "local"
    with pytest.raises(SystemExit):
        parse_teacher_args("--model resnet8 --bn local --sync_bn".split())

    from moma_tpu.train.student import run_student
    from moma_tpu.train.teacher import run_teacher

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cfg = parse_teacher_args(
            f"--model resnet8 --bn local --save_dir {td}".split())
        with pytest.raises(ValueError, match="only wired for --distill moma"):
            run_teacher(cfg, synthetic=True)
        cfg = parse_student_args(
            "--model_s resnet8 --model_t resnet8 --distill kd --bn sync "
            f"--save_dir {td}".split()
        )
        with pytest.raises(ValueError, match="only wired for --distill moma"):
            run_student(cfg, synthetic=True)


def test_preflight_eval_runs_before_training(tmp_path, capsys):
    """--skip_validation (reference-inverted: the flag ENABLES it) runs a
    test-split eval of the loaded model before epoch 1, like
    train_teacher.py:230-241 / train_student_moma.py:466-474."""
    from moma_tpu.core.config import parse_student_args, parse_teacher_args
    from moma_tpu.train.student import run_student
    from moma_tpu.train.teacher import run_teacher

    cfg = parse_teacher_args(
        f"--model resnet8 --skip_validation --epochs 1 --batch_size 16 "
        f"--save_dir {tmp_path}/t".split())
    run_teacher(cfg, synthetic=True)
    out = capsys.readouterr().out
    assert "[pre-flight] model test acc" in out
    # the pre-flight line must precede epoch 1's line
    assert out.index("[pre-flight]") < out.index("epoch 1")

    cfg = parse_student_args(
        f"--model_s resnet8 --model_t resnet8 --distill kd -c1 -d1 -b0 "
        f"--skip_validation --epochs 1 --batch_size 16 "
        f"--save_dir {tmp_path}/s".split())
    run_student(cfg, synthetic=True)
    out = capsys.readouterr().out
    assert "[pre-flight] teacher test acc" in out


def test_loader_num_workers_plumbed():
    """cfg.data.num_workers reaches the Loader (sizes the native
    prefetcher's thread pool for file-backed datasets)."""
    from moma_tpu.data.pipeline import Loader, synthetic_dataset

    ds = synthetic_dataset(32, 8, 4)
    ld = Loader(ds, 8, train=True, num_workers=2)
    assert ld.num_workers == 2


def test_n_cls_flag_beats_dataset_table():
    """Explicit --n_cls overrides the dataset map even for known datasets
    (the reference builds its models from opt.n_cls unconditionally — its
    dataset map is assigned to a dead local, train_student_moma.py:249-259)."""
    from moma_tpu.core.config import parse_student_args, parse_teacher_args

    cfg = parse_teacher_args(
        "--model resnet8 --dataset prostate_hv --n_cls 2".split()
    )
    assert cfg.model_s.n_cls == 2
    cfg = parse_teacher_args("--model resnet8 --dataset prostate_hv".split())
    assert cfg.model_s.n_cls == 4  # table fallback without the flag


def test_jitopt_scoped_vmem_injection():
    """The scoped-VMEM budget is injected only on TPU backends; 0 disables;
    the wrapper stays a working jax.jit on CPU."""
    import jax.numpy as jnp

    from moma_tpu.core import jitopt

    # tests run on the CPU mesh: never inject (the flag is TPU-only)
    assert jitopt.current_compiler_options() is None
    f = jitopt.jit(lambda x: x * 2)
    assert float(f(jnp.float32(3.0))) == 6.0

    # on a TPU backend the tuned default (and the 0 = off knob) applies
    class _Dev:
        platform = "tpu"

    real_devices = jax.devices
    jax.devices = lambda *a, **k: [_Dev()]
    try:
        jitopt.set_scoped_vmem(None)  # module default
        assert jitopt.current_compiler_options() == {
            "xla_tpu_scoped_vmem_limit_kib": "65536"}
        jitopt.set_scoped_vmem(32768)
        assert jitopt.current_compiler_options() == {
            "xla_tpu_scoped_vmem_limit_kib": "32768"}
        jitopt.set_scoped_vmem(0)
        assert jitopt.current_compiler_options() is None
    finally:
        jax.devices = real_devices
        jitopt.set_scoped_vmem(None)

    # the CLI knob reaches RunConfig
    from moma_tpu.core.config import parse_teacher_args

    cfg = parse_teacher_args("--model resnet8 --scoped_vmem_kib 0".split())
    assert cfg.run.scoped_vmem_kib == 0
    cfg = parse_teacher_args("--model resnet8".split())
    assert cfg.run.scoped_vmem_kib == 65536

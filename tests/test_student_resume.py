"""run_student --resume: full-state round-trip including CRD memory banks
(`extra`), a capability the reference lacks entirely (SURVEY.md §5:
save-only checkpoints, CRD banks never persisted)."""

import numpy as np
import pytest

from moma_tpu.core.config import Config, DistillConfig, ModelConfig


def _cfg(tmp_path, distill):
    cfg = Config()
    cfg.run.save_dir = str(tmp_path)
    cfg.run.epochs = 1
    cfg.run.print_freq = 1
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.model_s.name = "resnet8"
    cfg.model_s.n_cls = 10
    cfg.model_t = ModelConfig(name="resnet20", n_cls=10)
    cfg.distill = DistillConfig(distill=distill, cls=1.0, div=1.0, beta=0.5)
    return cfg


@pytest.mark.parametrize("distill", ["kd", "crd"])
def test_student_resume_round_trip(tmp_path, distill):
    from moma_tpu.train.student import run_student

    cfg = _cfg(tmp_path, distill)
    state1, res1 = run_student(cfg, synthetic=True)
    step1 = int(state1.step)
    assert step1 > 0

    # resume for one more epoch: starts from the saved step, not zero
    cfg.run.epochs = 2
    cfg.run.resume = True
    state2, res2 = run_student(cfg, synthetic=True)
    assert int(state2.step) == 2 * step1
    # best-metric thresholds must survive the restart: a worse post-resume
    # epoch may not overwrite the recorded best
    assert res2["best_acc"] >= res1["best_acc"]
    assert res2["best_f1"] >= res1["best_f1"]

    if distill == "crd":
        # the banks and their lazy Z constants must round-trip: after the
        # first run Z is set (> 0); the resumed run must NOT re-estimate it
        # from -1 (that would mean a fresh extra, not the restored one)
        assert float(state1.extra.z_v1) > 0
        np.testing.assert_allclose(
            float(state2.extra.z_v1), float(state1.extra.z_v1), rtol=1e-6
        )

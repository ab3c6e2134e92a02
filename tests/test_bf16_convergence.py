"""CI guard for the SHIPPED precision: bf16 training must converge to
f32-equal accuracy (VERDICT r2 missing #1).

Runs the scripts/bf16_accuracy.py harness (our full MoMA loop, resnet8,
stable-convergence synthetic task) in both precisions on the CPU mesh
and pins the converged top-1 gap inside the measured chaos band.
Measured context (BASELINE.md round 3): gap 0.0 pts on both the real
chip and this CPU mesh, f32 chaos floor 0.0-0.3 pts.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


@pytest.mark.slow
def test_bf16_converges_to_f32_accuracy():
    from bf16_accuracy import make_task, run

    train_x, train_y = make_task(512, seed=123, noise=0.3)
    val_x, val_y = make_task(1000, seed=456, noise=0.3)
    _, acc_fp = run("f32", "cpu", train_x, train_y, val_x, val_y, epochs=3)
    _, acc_bf = run("bf16", "cpu", train_x, train_y, val_x, val_y, epochs=3)
    # stable convergence on this task is ~100%; the BASELINE.json band is
    # 0.3 pts and the measured f32 chaos floor 0.0-0.3 pts — allow 1.0 pt
    # of headroom so CPU-codegen shifts don't flake the guard
    assert acc_fp >= 95.0, acc_fp
    assert acc_bf >= 95.0, acc_bf
    assert abs(acc_fp - acc_bf) <= 1.0, (acc_fp, acc_bf)

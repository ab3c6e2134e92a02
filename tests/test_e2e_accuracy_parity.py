"""End-to-end (epoch-level) accuracy/trajectory parity vs the executed
reference — the reduced CI version of scripts/e2e_accuracy_parity.py.

The full 3-epoch/512-sample run is recorded in BASELINE.md: final val
top-1 99.0 (reference) vs 98.3 (ours), with the reference's own f32
chaos floor (1e-7 single-weight nudge vs itself) at 0.3 pts on the same
horizon.  Here a 1-epoch run guards the machinery: both sides learn the
same synthetic task from identical weights/batches, the loss curves
track, and the accuracy gap stays within a few chaos-floor units.
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "MoMA")),
    reason="reference tree not available",
)
pytest.importorskip("torch")


def test_epoch_level_parity():
    import sys

    scripts = os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    if scripts not in sys.path:
        sys.path.insert(0, scripts)
    from e2e_accuracy_parity import main

    # the comparison is only informative at FULL convergence with margin:
    # mid-climb (steps 50-150 at noise 0.5) a 1-ULP f32 nudge moves val
    # acc by >10 pts (measured — chaos, not framework bias), and even the
    # climb's completion step shifts across XLA compilation environments.
    # noise=0.3 converges both sides well before the 192-step horizon.
    out = main(["--epochs", "3", "--train_n", "512", "--val_n", "500",
                "--noise", "0.3"])
    # same task learned from the same start: curves must track...
    assert out["loss_curve_corr"] > 0.99, out
    assert out["loss_rel_drift_median"] < 0.05, out
    # ...and stably-converged accuracy must agree tightly (BASELINE.json's
    # 0.3% band; the noise-0.5 horizon-edge run and its 0.3-pt chaos floor
    # are recorded in BASELINE.md)
    assert out["acc_gap_pts"] <= 0.6, out
    assert out["ours_val_acc"] > 95.0, out  # actually converged

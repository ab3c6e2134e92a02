"""Async checkpoint saves (block=False).

The per-epoch 'latest' save overlaps its disk commit with the next
epoch's compute; the `<tag>.meta.json` sidecar must only appear once the
commit is complete (wait/exists/restore/meta all flush), because resume
and preemption logic treat the sidecar as the completeness marker.
"""

import os

import jax.numpy as jnp
import numpy as np

from moma_tpu.core.checkpoint import CheckpointManager


def _state(seed):
    rs = np.random.RandomState(seed)
    return {
        "params": {"w": jnp.asarray(rs.randn(8, 8), jnp.float32)},
        "step": jnp.asarray(seed, jnp.int32),
    }


def test_async_save_defers_meta_until_wait(tmp_path):
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save("latest", _state(1), {"epoch": 1, "acc": 0.5}, block=False)
    # the sidecar is written only at flush time — never mid-commit
    assert not os.path.exists(os.path.join(str(tmp_path), "latest.meta.json"))
    ckpt.wait()
    assert ckpt.meta("latest") == {"epoch": 1, "acc": 0.5}


def test_async_save_round_trips_via_restore(tmp_path):
    ckpt = CheckpointManager(str(tmp_path))
    state = _state(2)
    ckpt.save("latest", state, {"epoch": 2}, block=False)
    # restore() flushes the in-flight commit itself
    out = ckpt.restore("latest", _state(0))
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(out["step"]) == 2
    assert ckpt.meta("latest")["epoch"] == 2


def test_back_to_back_async_saves_flush_prior_meta(tmp_path):
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save("latest", _state(1), {"epoch": 1}, block=False)
    # issuing the next epoch's saves flushes epoch 1's sidecar first
    ckpt.save("best_acc", _state(1), {"epoch": 1}, block=False)
    assert ckpt.meta("latest") == {"epoch": 1}
    ckpt.save("latest", _state(2), {"epoch": 2}, block=False)
    ckpt.wait()
    assert ckpt.meta("latest") == {"epoch": 2}
    assert ckpt.meta("best_acc") == {"epoch": 1}
    out = ckpt.restore("latest", _state(0))
    assert int(out["step"]) == 2


def test_blocking_save_unchanged(tmp_path):
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save("latest", _state(3), {"epoch": 3})
    assert ckpt.meta("latest") == {"epoch": 3}
    assert ckpt.exists("latest")
